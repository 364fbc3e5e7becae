"""The reference pipeline, end to end, as one declared query
(SURVEY.md §2 Part A composed: A1+A2 fetch/retry -> A5/A6 filter ->
A10 normalize -> A11/A12 idempotent append -> A13 envelope -> A14
replay).

Every stage is individually oracled elsewhere; this row proves the
COMPOSITION: a full scheduled run lands the fetched frame exactly
once, and an immediate at-least-once replay inserts zero rows, with
the cursor resting on the axis maximum. All envelope numbers are
deterministic (the fake transport's axis arithmetic), so the oracle
is exact — the reference's whole behavior, hash-verified.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from weather_etl_spark.incremental import run_incremental
from weather_etl_spark.io import scratch_dir
from weather_etl_spark.registry import register
from weather_etl_spark.sources.fetch import (
    MEASURES,
    fake_columnar_transport,
    fetch_timeseries,
)


@register(
    "pipe_reference_e2e",
    oracle="""
SELECT CAST(192 AS BIGINT) AS records_fetched,
       CAST(192 AS BIGINT) AS first_insert,
       CAST(0   AS BIGINT) AS replay_insert,
       CAST(192 AS BIGINT) AS sink_rows,
       CAST(1704067200000000 + CAST(900000000 AS BIGINT) * 191
            AS BIGINT) AS final_cursor_us
""",
    doc="The reference lambda, whole: retried fetch (2 transient 502s "
    "absorbed) -> cursor filter -> NaN->NULL normalize -> keyed "
    "idempotent append -> envelope, then the SAME batch replayed "
    "(at-least-once delivery): first run inserts all 192 axis rows, "
    "the replay inserts 0, and the sink cursor rests on the axis "
    "maximum — exactly-once effect, hash-verified end to end "
    "(reference lambda_handler, lambda_function.py:193-252).",
    scale_notes="Composition of individually scale-safe stages: the "
    "replay's anti-join is the only sink-dependent cost and prunes to "
    "the batch's key range on a partitioned sink (SCALE.md §1).",
)
def pipe_reference_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    sink = f"{scratch_dir('pipe_e2e')}/sink"
    shutil.rmtree(sink, ignore_errors=True)  # fresh run each sweep

    def one_run() -> dict:
        frame = fetch_timeseries(
            spark,
            transport=fake_columnar_transport(fail_times=2),
            sleep=lambda _s: None,
        )
        return run_incremental(
            spark,
            frame,
            sink,
            key_cols=["date"],
            ts_col="date",
            float_cols=list(MEASURES),
        )

    first, replay = one_run(), one_run()
    assert first["statusCode"] == 200 and replay["statusCode"] == 200, (
        first,
        replay,
    )
    sink_df = spark.read.parquet(sink)
    final_rows = sink_df.count()
    final_cursor = sink_df.agg(F.unix_micros(F.max("date"))).first()[0]
    return spark.createDataFrame(
        [
            (
                first["records_fetched"],
                first["records_inserted"],
                replay["records_inserted"],
                final_rows,
                final_cursor,
            )
        ],
        "records_fetched long, first_insert long, replay_insert long, "
        "sink_rows long, final_cursor_us long",
    )
