"""Malformed-record-tolerant CSV source (SURVEY.md §2 B.12, round-6
batch): Spark's PERMISSIVE parse mode with a ``_corrupt_record``
column — the production answer to "the crawl shard has broken rows"
(the reference's error-envelope discipline, lambda_function.py:240-248,
applied at the parser instead of the pipeline level: quarantine the
bad row, keep its parseable fields, never abort the job).

The declared query materializes a CSV shard from nation with a
DETERMINISTIC corruption pattern (every nationkey ≡ 3 mod 7 gets a
non-numeric region token), reads it back under the explicit schema
(A9: no inference) in PERMISSIVE mode, and reports the triage a real
ingest job logs: row counts by disposition plus checksums proving
that (a) corrupt rows still surface their parseable key fields and
(b) good rows round-trip losslessly. DROPMALFORMED/FAILFAST are the
same reader one option away; PERMISSIVE is the only mode that keeps
evidence for the quarantine queue.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from weather_etl_spark.io import read_table, scratch_dir
from weather_etl_spark.registry import register


@register(
    "src_csv_malformed",
    oracle="""
WITH tagged AS (
  SELECT n_nationkey, n_name, n_regionkey,
         n_nationkey % 7 = 3 AS is_bad
  FROM nation
)
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN is_bad THEN 1 ELSE 0 END) AS BIGINT) AS n_bad,
       CAST(SUM(CASE WHEN is_bad THEN 0 ELSE 1 END) AS BIGINT) AS n_good,
       CAST(SUM(CASE WHEN is_bad THEN n_nationkey END) AS BIGINT)
         AS bad_key_sum,
       CAST(SUM(CASE WHEN NOT is_bad THEN n_nationkey END) AS BIGINT)
         AS good_key_sum,
       CAST(SUM(CASE WHEN NOT is_bad THEN n_regionkey END) AS BIGINT)
         AS good_region_sum,
       MIN(CASE WHEN is_bad THEN n_name END) AS first_bad_name
FROM tagged
""",
    doc="PERMISSIVE CSV ingest with corrupt-record quarantine: a "
    "nation-derived CSV shard with every nationkey = 3 (mod 7) row "
    "carrying an unparseable region token is read back under the "
    "explicit 3-column schema + _corrupt_record. The result proves "
    "the PERMISSIVE contract: bad rows are flagged (not dropped, "
    "not fatal), their parseable fields (key, name) survive, the "
    "broken field alone is nulled, and good rows round-trip "
    "losslessly. The oracle derives every number from nation and "
    "the corruption rule — no file I/O on the DuckDB side.",
    scale_notes="The reader is a streaming per-row parser: corrupt "
    "handling is O(row), no shuffle, and composes with the text "
    "scan's partition parallelism. At 100 TB the _corrupt_record "
    "column routes to a quarantine sink (idempotent append, A11) "
    "while the clean rows land Parquet — one pass, no re-read of "
    "the shard on failure.",
)
def src_csv_malformed(spark: SparkSession, sf_dir: str) -> DataFrame:
    nat = read_table(spark, sf_dir, "nation")
    lines = nat.select(
        F.when(
            F.col("n_nationkey") % 7 == 3,
            F.format_string(
                "%d,%s,X%d", "n_nationkey", "n_name", "n_regionkey"
            ),
        )
        .otherwise(
            F.format_string(
                "%d,%s,%d", "n_nationkey", "n_name", "n_regionkey"
            )
        )
        .alias("value")
    )
    tmp = scratch_dir("src_csv_malformed")
    lines.write.mode("overwrite").text(tmp)
    back = (
        spark.read.schema(
            "k long, name string, region long, _corrupt_record string"
        )
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(tmp)
    )
    bad = F.col("_corrupt_record").isNotNull()
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(bad.cast("int")).cast("bigint").alias("n_bad"),
        F.sum((~bad).cast("int")).cast("bigint").alias("n_good"),
        F.sum(F.when(bad, F.col("k"))).cast("bigint").alias("bad_key_sum"),
        F.sum(F.when(~bad, F.col("k")))
        .cast("bigint")
        .alias("good_key_sum"),
        F.sum(F.when(~bad, F.col("region")))
        .cast("bigint")
        .alias("good_region_sum"),
        F.min(F.when(bad, F.col("name"))).alias("first_bad_name"),
    )


@register(
    "src_json_malformed",
    oracle="""
WITH tagged AS (
  SELECT n_nationkey, n_name, n_regionkey,
         n_nationkey % 5 = 2 AS is_bad
  FROM nation
)
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN is_bad THEN 1 ELSE 0 END) AS BIGINT) AS n_bad,
       CAST(SUM(CASE WHEN is_bad THEN 0 ELSE 1 END) AS BIGINT) AS n_good,
       CAST(SUM(CASE WHEN NOT is_bad THEN n_nationkey END) AS BIGINT)
         AS good_key_sum,
       CAST(SUM(CASE WHEN NOT is_bad THEN n_regionkey END) AS BIGINT)
         AS good_region_sum,
       MIN(CASE WHEN NOT is_bad THEN n_name END) AS first_good_name
FROM tagged
""",
    doc="PERMISSIVE JSON-lines ingest with corrupt-record "
    "quarantine (the JSONL twin of src_csv_malformed — a different "
    "parser with the same error-envelope contract): every "
    "nationkey = 2 (mod 5) line gets truncated into invalid JSON, "
    "the shard is read back under the explicit schema + "
    "_corrupt_record, and the triage proves bad lines are flagged "
    "not fatal while good lines round-trip. Unlike CSV, a JSON "
    "parse failure voids the whole row (no per-field salvage), "
    "which is why bad_key_sum is absent from this contract.",
    scale_notes="Same O(row) streaming-parse story as the CSV "
    "variant; JSONL additionally pays per-row tokenization. "
    "Corrupt rows route to a quarantine sink at scale; clean rows "
    "land Parquet.",
)
def src_json_malformed(spark: SparkSession, sf_dir: str) -> DataFrame:
    nat = read_table(spark, sf_dir, "nation")
    lines = nat.select(
        F.when(
            F.col("n_nationkey") % 5 == 2,
            F.format_string('{"k": %d, "name": "%s", "region":',
                            "n_nationkey", "n_name"),
        )
        .otherwise(
            F.format_string(
                '{"k": %d, "name": "%s", "region": %d}',
                "n_nationkey", "n_name", "n_regionkey",
            )
        )
        .alias("value")
    )
    tmp = scratch_dir("src_json_malformed")
    lines.write.mode("overwrite").text(tmp)
    back = (
        spark.read.schema(
            "k long, name string, region long, _corrupt_record string"
        )
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(tmp)
    )
    bad = F.col("_corrupt_record").isNotNull()
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(bad.cast("int")).cast("bigint").alias("n_bad"),
        F.sum((~bad).cast("int")).cast("bigint").alias("n_good"),
        F.sum(F.when(~bad, F.col("k")))
        .cast("bigint")
        .alias("good_key_sum"),
        F.sum(F.when(~bad, F.col("region")))
        .cast("bigint")
        .alias("good_region_sum"),
        F.min(F.when(~bad, F.col("name"))).alias("first_good_name"),
    )
