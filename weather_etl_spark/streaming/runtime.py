"""True Structured Streaming runtime operators (SURVEY.md §2 B.8:
st_watermark, st_dedup_wm, st_foreachbatch, st_trigger_availnow).

These run real streaming queries (file source -> memory/foreachBatch
sink) with temp checkpoints, so they are declared rows-only: the
runtime semantics (watermark drops, in-stream dedup, exactly-once
foreachBatch effects) aren't SQL-expressible, but each returns a
small deterministic summary DataFrame asserted by the engine's own
tests.

Re-expresses the reference's operational loop: scheduled catch-up
ingestion (A14 -> Trigger.AvailableNow), late/duplicate tolerance
(A5/A11 -> watermark + dropDuplicatesWithinWatermark), and the whole
pipeline as a foreachBatch body (A13).
"""

from __future__ import annotations

import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from contextlib import contextmanager

from weather_etl_spark.incremental import run_incremental
from weather_etl_spark.io import table_path
from weather_etl_spark.registry import register
from weather_etl_spark.session import ensure_engine_confs


@contextmanager
def _small_state(spark: SparkSession, n: int = 4):
    """Temporarily size shuffle/state-store partitions to the tiny
    runtime fixtures (each micro-batch otherwise spins up the full
    session partition count of state stores). Streaming checkpoints pin
    the partition count at first run, and every runtime op here uses a
    fresh checkpoint, so this is safe. At scale the same knob is sized
    to state volume, not left at the relational default."""
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)

#: Raw parquet schema of the events table (ts = TIMESTAMP(NANOS) read as
#: long under nanosAsLong — see io.read_table).
EVENTS_RAW_DDL = (
    "event_id long, ts long, user_id long, event_type string, value double, "
    "props string"
)


def _stream_events(spark: SparkSession, in_dir: str) -> DataFrame:
    raw = spark.readStream.schema(EVENTS_RAW_DDL).parquet(in_dir)
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def _run_to_memory(stream_df: DataFrame, mode: str, tmp: str) -> DataFrame:
    """Drain a bounded stream into a memory sink, return the result table."""
    name = f"st_{uuid.uuid4().hex[:12]}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", f"{tmp}/ckpt_{name}")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(name)


@register(
    "st_trigger_availnow",
    oracle=None,  # runtime semantics; engine tests assert batch parity
    doc="Catch-up scheduled ingestion: Trigger.AvailableNow drains all "
    "pending files then stops — the reference's rate(5 minutes) cron "
    "re-expressed (A14, deploy.sh:36-37). Runs the tumbling aggregate "
    "as a real stream; parity with q_stream_tumbling asserted in tests.",
)
def st_trigger_availnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_engine_confs(spark)
    tmp = tempfile.mkdtemp(prefix="st_availnow_")
    try:
        in_dir = f"{tmp}/in"
        import os

        os.makedirs(in_dir)
        shutil.copy(table_path(sf_dir, "events"), f"{in_dir}/events.parquet")
        ev = _stream_events(spark, in_dir)
        agg = (
            ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.unix_micros("w.start").alias("ws_us"), "event_type", "n")
        )
        out = _run_to_memory(agg, "complete", tmp)
        return out.localCheckpoint()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _write_batch(spark: SparkSession, rows, in_dir: str, batch_no: int) -> None:
    """Land one micro-batch as a single flat parquet file (the file stream
    source wants plain files in its input dir, ordered by mtime)."""
    import glob
    import os

    df = spark.createDataFrame(
        rows, "event_id long, ts_us long, user_id long, value double"
    ).select(
        "event_id",
        F.timestamp_micros(F.col("ts_us")).alias("ts"),
        "user_id",
        "value",
    )
    staging = f"{in_dir}/_staging_b{batch_no}"
    df.coalesce(1).write.mode("overwrite").parquet(staging)
    (part,) = glob.glob(f"{staging}/part-*.parquet")
    os.replace(part, f"{in_dir}/b{batch_no}.parquet")
    shutil.rmtree(staging, ignore_errors=True)


_T0 = 1704103200_000_000  # 2024-01-01 10:00:00 UTC in epoch-us
_MIN = 60_000_000


@register(
    "st_watermark",
    oracle=None,  # watermark drops are runtime-only semantics
    doc="Watermark + late-data drop (FIXTURES.md late-events fixture): "
    "batch 2 contains a row older than watermark (dropped) and a fresh "
    "row (kept). Returns per-window final counts; the dropped row's "
    "window stays at its batch-1 count. Generalizes the reference's "
    "bounded-lateness overlap window (A5/A14).",
)
def st_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_engine_confs(spark)
    tmp = tempfile.mkdtemp(prefix="st_watermark_")
    try:
        import os

        in_dir = f"{tmp}/in"
        os.makedirs(in_dir)
        # Batch 1: 10:00..10:09 plus a head row at 11:00 that advances the
        # max event time, so the post-batch watermark is 10:50.
        batch1 = [(i, _T0 + i * _MIN, 1, 1.0) for i in range(10)]
        batch1.append((99, _T0 + 60 * _MIN, 1, 1.0))
        _write_batch(spark, batch1, in_dir, 1)

        stream = (
            spark.readStream.schema(
                "event_id long, ts timestamp, user_id long, value double"
            )
            .option("maxFilesPerTrigger", "1")
            .parquet(in_dir)
        )
        agg = (
            stream.withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "5 minutes").alias("w"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.unix_micros("w.start").alias("ws_us"), "n")
        )
        name = f"st_wm_{uuid.uuid4().hex[:8]}"
        with _small_state(spark):
            q = (
                agg.writeStream.format("memory")
                .queryName(name)
                .outputMode("update")
                .option("checkpointLocation", f"{tmp}/ckpt")
                .start()
            )
            q.processAllAvailable()
            # Batch 2: one row at 10:05 — its 5-min window [10:05,10:10)
            # ended before the 10:50 watermark => DROPPED; one row at
            # 10:52 => kept.
            _write_batch(
                spark,
                [(200, _T0 + 5 * _MIN, 1, 1.0), (201, _T0 + 52 * _MIN, 1, 1.0)],
                in_dir,
                2,
            )
            q.processAllAvailable()
            q.stop()
        # Final state per window = the last update emitted for it.
        out = (
            spark.table(name)
            .groupBy("ws_us")
            .agg(F.max("n").alias("n_final"))
        )
        return out.localCheckpoint()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@register(
    "st_dedup_wm",
    oracle=None,
    doc="Streaming dedup by key within watermark "
    "(dropDuplicatesWithinWatermark) — the reference's ON CONFLICT key "
    "dedup applied in-stream (A11). Duplicate event_ids across two "
    "micro-batches collapse to one row each.",
)
def st_dedup_wm(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_engine_confs(spark)
    tmp = tempfile.mkdtemp(prefix="st_dedup_")
    try:
        import os

        in_dir = f"{tmp}/in"
        os.makedirs(in_dir)
        # 5 unique ids; ids 1 and 2 repeat within and across batches.
        _write_batch(
            spark,
            [(1, _T0, 1, 1.0), (2, _T0 + _MIN, 1, 1.0), (1, _T0 + 2 * _MIN, 1, 1.0)],
            in_dir,
            1,
        )
        _write_batch(
            spark,
            [(2, _T0 + 3 * _MIN, 1, 1.0), (3, _T0 + 4 * _MIN, 1, 1.0),
             (4, _T0 + 5 * _MIN, 1, 1.0), (5, _T0 + 6 * _MIN, 1, 1.0)],
            in_dir,
            2,
        )
        stream = (
            spark.readStream.schema(
                "event_id long, ts timestamp, user_id long, value double"
            )
            .option("maxFilesPerTrigger", "1")
            .parquet(in_dir)
        )
        deduped = stream.withWatermark(
            "ts", "1 hour"
        ).dropDuplicatesWithinWatermark(["event_id"])
        with _small_state(spark):
            out = _run_to_memory(deduped.select("event_id"), "append", tmp)
        return (
            out.agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.countDistinct("event_id").alias("n_distinct"),
            )
        ).localCheckpoint()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@register(
    "st_foreachbatch",
    oracle=None,
    doc="The whole reference pipeline as a foreachBatch body (A11/A13/"
    "A14): each micro-batch goes through cursor -> filter -> anti-join "
    "-> idempotent append. Two overlapping batches converge to the "
    "distinct key set; second-batch overlap inserts 0 extra copies.",
)
def st_foreachbatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_engine_confs(spark)
    tmp = tempfile.mkdtemp(prefix="st_feb_")
    try:
        import os

        in_dir = f"{tmp}/in"
        sink = f"{tmp}/sink"
        os.makedirs(in_dir)
        # Overlapping micro-batches (the reference's past_days=1 overlap).
        _write_batch(
            spark, [(i, _T0 + i * _MIN, 1, 1.0) for i in range(0, 8)], in_dir, 1
        )
        _write_batch(
            spark, [(i, _T0 + i * _MIN, 1, 1.0) for i in range(4, 12)], in_dir, 2
        )
        stream = (
            spark.readStream.schema(
                "event_id long, ts timestamp, user_id long, value double"
            )
            .option("maxFilesPerTrigger", "1")
            .parquet(in_dir)
        )
        inserted_counts: list[int] = []

        def handle_batch(batch_df: DataFrame, epoch_id: int) -> None:
            result = run_incremental(
                spark,
                batch_df,
                sink,
                key_cols=["event_id"],
                ts_col="ts",
                float_cols=["value"],
            )
            inserted_counts.append(result["records_inserted"])

        with _small_state(spark):
            q = (
                stream.writeStream.foreachBatch(handle_batch)
                .option("checkpointLocation", f"{tmp}/ckpt")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        total = spark.read.parquet(sink).count()
        distinct = (
            spark.read.parquet(sink).select("event_id").distinct().count()
        )
        return spark.createDataFrame(
            [(total, distinct, sum(inserted_counts))],
            "total_rows long, distinct_keys long, inserted_sum long",
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
