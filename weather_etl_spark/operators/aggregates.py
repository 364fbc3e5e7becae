"""Aggregation operators (SURVEY.md §2 B.4).

Generalizes the reference's single aggregate — the MAX(date) cursor
discovery pushed into the store (/root/reference/lambda_function.py:78,
operator A8) — to the full Spark aggregation surface: grouped
multi-aggregates, distinct counts, rollup/cube/grouping sets, HAVING,
ordered collect, percentiles.

Scale notes (100 TB): every query here is a hash/sort aggregate with
map-side partial aggregation — one shuffle keyed on the grouping
columns, no driver-side collection.  Low-cardinality groupings
(returnflag x linestatus = 6 groups) reduce to tiny shuffles after
partial agg; AQE coalesces the post-shuffle partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from weather_etl_spark.functions.exact import dec2, dec6, exact_avg, money_sum
from weather_etl_spark.io import read_table
from weather_etl_spark.registry import register

_Q1_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
           * CAST(1 - l_discount AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
           * CAST((1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
  ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 4) AS avg_qty,
  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 4) AS avg_price,
  ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 4) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@register(
    "q_agg_q1",
    oracle=_Q1_ORACLE,
    doc="TPC-H Q1 shape: grouped multi-agg with exact decimal money sums "
    "(generalizes reference A8, lambda_function.py:78).",
    scale_notes="Partial agg map-side -> 6 groups; shuffle is O(groups), "
    "not O(rows). Decimal sums stay within precision 38 (no precision-loss "
    "truncation at any SF).",
)
def q_agg_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp")
    )
    disc_factor = dec6(F.lit(1.0) - F.col("l_discount"))
    # Combined factor computed in double space (deterministic IEEE, same in
    # DuckDB) with a single decimal cast — an intermediate decimal downcast
    # would round differently across engines.
    charge_factor = dec6((F.lit(1.0) - F.col("l_discount")) * (F.lit(1.0) + F.col("l_tax")))
    disc_price = dec2("l_extendedprice") * disc_factor
    charge = dec2("l_extendedprice") * charge_factor
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            money_sum(dec2("l_quantity"), "sum_qty"),
            money_sum(dec2("l_extendedprice"), "sum_base_price"),
            money_sum(disc_price, "sum_disc_price"),
            money_sum(charge, "sum_charge"),
            exact_avg(dec2("l_quantity"), "avg_qty"),
            exact_avg(dec2("l_extendedprice"), "avg_price"),
            exact_avg(dec6("l_discount"), "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )
