"""weather_etl_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and
data-processing capabilities of the reference ETL pipeline
(sf27sf27/weather-etl, surveyed in SURVEY.md), generalized to a full
DataFrame analytics engine: relational operators, window functions,
streaming, and LLM-data-pipeline operators (dedup, similarity search,
multimodal columns, text analysis) — all designed for 100 TB scale.

Layout:
    session.py    SparkSession factory (UTC, Arrow, AQE, ns-parquet recipe)
    io.py         table readers/writers over the driver testdata layout
    registry.py   declared-query registry (query fn + DuckDB oracle SQL)
    operators/    relational operators (scans, filters, joins, aggs, windows,
                  sorts/sets, llm-pipeline, udf surface)
    functions/    scalar/vector function queries and helpers
    sources/      external sources (retrying HTTP fetch -> DataFrame)
    streaming/    Structured Streaming queries + incremental runner
    plans/        plan inspection / scale-tuning helpers
"""

from weather_etl_spark.session import get_spark, ensure_engine_confs
from weather_etl_spark.io import read_table, TABLES

__all__ = ["get_spark", "ensure_engine_confs", "read_table", "TABLES"]
__version__ = "0.1.0"
