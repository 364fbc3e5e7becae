"""Binary-file source (SURVEY.md §2 B.12 late batch): Spark's built-in
``binaryFile`` format — the ingest path multimodal corpora arrive
through (image/audio/video files land as whole-file binary rows, then
``llm_mm_decode``-style operators take over).

The declared query reads every parquet file in the scale-factor
directory AS OPAQUE BYTES and publishes a portable per-file contract:
basename, byte size, and the hex of the first/last 8 bytes (the
``PAR1`` magic appears in both, making the check self-describing).

Rows-only by design, like the other source-family rows
(src_fetch/src_pyds): the driver's oracle SQL runs against
pre-registered table VIEWS and cannot be pointed at raw file paths, so
the byte-level cross-engine check lives in the pytest suite instead —
``tests/test_analytics_ops.py::test_binaryfile_matches_duckdb_read_blob``
re-reads the same files through DuckDB's ``read_blob`` and asserts
name/size/head/tail equality, the transfer-integrity gate a 100 TB
media crawl runs per shard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from weather_etl_spark.registry import register


@register(
    "src_binaryfile",
    oracle=None,
    doc="Whole-file binary source: spark.read.format('binaryFile') "
    "over the fixture directory, emitting basename, byte length, and "
    "first/last-8-byte hex per file (both ends carry the PAR1 parquet "
    "magic, so the contract is self-checking). Rows-only for the "
    "driver (path-based sources can't be expressed against its table "
    "views); byte-identity vs DuckDB read_blob asserted in tests.",
    scale_notes="binaryFile is Spark's distributed whole-file reader: "
    "one task per file (or per file group under "
    "spark.sql.files.maxPartitionBytes), no shuffle — metadata and "
    "boundary bytes are projections over the streamed content. At "
    "100 TB the same plan fans out across executors; pair with "
    "binaryFile's pathGlobFilter/recursiveFileLookup for shard "
    "selection.",
)
def src_binaryfile(spark: SparkSession, sf_dir: str) -> DataFrame:
    files = spark.read.format("binaryFile").load(f"{sf_dir}/*.parquet")
    # hex-first slicing: BLOB substring support differs across engines,
    # but hex(content) -> fixed 2-chars-per-byte string slices portably.
    return files.withColumn("h", F.hex("content")).select(
        F.regexp_extract(F.col("path"), "([^/]+)$", 1).alias("file_name"),
        F.col("length").cast("bigint").alias("n_bytes"),
        F.substring("h", 1, 16).alias("head_hex"),
        F.expr("substring(h, length * 2 - 15, 16)").alias("tail_hex"),
    )
