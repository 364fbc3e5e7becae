"""Sorts, limits, global top-k, and set operators (SURVEY.md §2 B.6).

Null-placement trap (§7.4): Spark ASC defaults NULLS FIRST, DuckDB
NULLS LAST — every sort here spells placement explicitly.

Scale notes (100 TB): ORDER BY + LIMIT compiles to
TakeOrderedAndProject (per-partition top-k then k-way merge on the
driver — O(k) driver memory, no global sort).  Set ops with DISTINCT
semantics shuffle on the full row; EXCEPT/INTERSECT of wide rows
should be keyed on a hash at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from weather_etl_spark.io import read_table
from weather_etl_spark.registry import register


@register(
    "q_sort_multikey",
    oracle="""
SELECT o_orderkey, o_orderstatus, o_totalprice
FROM orders
ORDER BY o_orderstatus ASC, o_totalprice DESC NULLS LAST, o_orderkey ASC
LIMIT 50
""",
    doc="Multi-key sort with explicit null placement + limit "
    "(full unique tie-break so the LIMIT set is deterministic).",
)
def q_sort_multikey(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        read_table(spark, sf_dir, "orders")
        .orderBy(
            F.col("o_orderstatus").asc(),
            F.col("o_totalprice").desc_nulls_last(),
            F.col("o_orderkey").asc(),
        )
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .limit(50)
    )


@register(
    "q_topk_global",
    oracle="""
SELECT event_id, value FROM events
ORDER BY value DESC, event_id ASC
LIMIT 20
""",
    doc="Global top-k (TakeOrderedAndProject; tie-break event_id).",
)
def q_topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        read_table(spark, sf_dir, "events")
        .orderBy(F.col("value").desc(), F.col("event_id").asc())
        .select("event_id", "value")
        .limit(20)
    )


@register(
    "q_set_union_all",
    oracle="""
SELECT c_custkey AS key FROM customer
UNION ALL
SELECT s_suppkey AS key FROM supplier
""",
    doc="UNION ALL (bag union, duplicates kept).",
)
def q_set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("key")
    )
    s = read_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("key")
    )
    return c.unionAll(s)


@register(
    "q_set_union",
    oracle="""
SELECT c_custkey AS key FROM customer
UNION
SELECT s_suppkey AS key FROM supplier
""",
    doc="UNION DISTINCT.",
)
def q_set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("key")
    )
    s = read_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("key")
    )
    return c.union(s).distinct()


@register(
    "q_set_intersect",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey AS nationkey FROM supplier
""",
    doc="INTERSECT (distinct): nation keys present on both sides.",
)
def q_set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = read_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.intersect(s)


@register(
    "q_set_except",
    oracle="""
SELECT o_custkey AS custkey FROM orders
EXCEPT
SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
""",
    doc="EXCEPT (distinct): ordering customers minus the BUILDING segment "
    "(anti semantics, reference A11).",
)
def q_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey")
    )
    b = read_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    ).select(F.col("c_custkey").alias("custkey"))
    return o.subtract(b)


@register(
    "q_set_except_all",
    oracle="""
SELECT o_custkey AS custkey FROM orders
EXCEPT ALL
SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
""",
    doc="EXCEPT ALL (multiset): per-occurrence subtraction — a customer "
    "with n orders and one BUILDING row keeps n-1 occurrences (bag "
    "semantics the distinct EXCEPT row cannot express).",
)
def q_set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey")
    )
    b = (
        read_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("custkey"))
    )
    return o.exceptAll(b)


@register(
    "q_set_intersect_all",
    oracle="""
SELECT o_custkey AS custkey FROM orders
INTERSECT ALL
SELECT c_custkey AS custkey FROM customer
""",
    doc="INTERSECT ALL (multiset): min-of-multiplicities per key — each "
    "ordering customer appears min(n_orders, 1) times.",
)
def q_set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey")
    )
    c = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey")
    )
    return o.intersectAll(c)
