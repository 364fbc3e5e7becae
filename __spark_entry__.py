"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over :mod:`weather_etl_spark.registry` — every declared
operator from SURVEY.md §2 registers a Spark callable plus (when
SQL-expressible) a DuckDB oracle there; this module just re-exports.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from weather_etl_spark import registry

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape, q_agg_q1) on sf0.001."""
    specs = registry.load_all()
    return specs["q_agg_q1"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per declared query (omitted => rows-only check)."""
    return registry.oracle_sql()
