"""SparkSession factory with the engine's defaults.

Mirrors the reference's fixed runtime contract (UTC timestamps,
columnar zero-copy decode — /root/reference/lambda_function.py:107-108,
112-119) as Spark session configuration:

- session timezone UTC (reference parses all API times utc=True),
- Arrow-based Python<->JVM transfer (the FlatBuffers->numpy zero-copy
  analogue),
- AQE on (runtime join-strategy switch, skew-join splitting, partition
  coalescing) — our substitute for the reference's hand-ordered plan,
- ``spark.sql.legacy.parquet.nanosAsLong=true`` so the driver testdata's
  TIMESTAMP(NANOS) events table is readable on builds that honor it
  (see FIXTURES.md ns trap).  On the current PySpark 4.1.2 install the
  conf is a NO-OP and NANOS arrives as TIMESTAMP_NTZ instead —
  ``io.read_table`` normalizes both shapes to tz-aware ``timestamp``
  and tests/test_env_probe.py pins the behavior (ENVIRONMENT.md).

Scale note (100 TB): every conf here is cluster-safe. Shuffle
partitions default to 2x local cores for the test harness; on a real
cluster AQE coalescing makes the static number mostly irrelevant —
set ``spark.sql.shuffle.partitions`` to ~2-3x total executor cores and
let adaptive execution shrink/split at runtime.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Configs that are runtime-settable on an existing session.  Applied
#: defensively by :func:`ensure_engine_confs` so declared queries behave
#: identically even on a SparkSession the driver created without them.
RUNTIME_CONFS = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # TIMESTAMP(NANOS) parquet columns arrive as LongType nanos.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Unfiltered MIN/MAX/COUNT over eligible column types answer from
    # parquet footer statistics on the DSv2 reader path (numeric/date
    # columns; timestamps are excluded by Spark). No-op on the default
    # v1 path — set spark.sql.sources.useV1SourceList="" to activate.
    "spark.sql.parquet.aggregatePushdown": "true",
    # Runtime bloom-filter join pruning stays at Spark's default
    # (creation threshold 10 MB): measured at sf0.1, forcing it on
    # added ~25% to the join-heavy bench (the build-side aggregate
    # costs more than the rows it prunes at small scale). At 100 TB
    # the size thresholds auto-enable it exactly where it pays.
    # ANSI off: the engine normalizes NaN/NULL itself at sink boundaries
    # (reference invariant A10) and oracle queries avoid ANSI-divergent ops.
    "spark.sql.ansi.enabled": "false",
}


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(
    app_name: str = "weather-etl-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession."""
    cpus = default_parallelism()
    builder = (
        SparkSession.builder.master(master or f"local[{cpus}]")
        .appName(app_name)
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or max(2 * cpus, 8)),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for key, value in RUNTIME_CONFS.items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def ensure_engine_confs(spark: SparkSession) -> SparkSession:
    """Apply the runtime-settable engine confs to an existing session.

    Called at the top of every declared query so results do not depend
    on who constructed the session (the correctness driver builds its
    own).  All keys in RUNTIME_CONFS are SQL confs, settable per-session
    at runtime.
    """
    for key, value in RUNTIME_CONFS.items():
        try:
            spark.conf.set(key, value)
        except Exception:
            # Never fail a query because one conf is locked down.
            pass
    return spark
