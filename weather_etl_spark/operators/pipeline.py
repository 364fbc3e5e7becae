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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from weather_etl_spark.incremental import run_incremental
from weather_etl_spark.functions.exact import (
    decimal_mean_round4_sql,
    signed_ratio_round_sql,
)
from weather_etl_spark.io import read_table, scratch_dir
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


@register(
    "pipe_llm_corpus_e2e",
    oracle="""
WITH filtered AS (
  SELECT doc_id, lang, source, text,
         len(string_split(text, ' ')) AS n_tokens
  FROM documents
  WHERE len(string_split(text, ' ')) BETWEEN 30 AND 500
), deduped AS (
  SELECT lang, source, doc_id, n_tokens,
         ROW_NUMBER() OVER (PARTITION BY md5(text)
                            ORDER BY doc_id) AS dup_rn
  FROM filtered
), kept AS (
  SELECT lang, source, doc_id, n_tokens FROM deduped WHERE dup_rn = 1
), packed AS (
  SELECT lang, doc_id, n_tokens,
         (SUM(n_tokens) OVER (PARTITION BY lang
                              ORDER BY doc_id
                              ROWS UNBOUNDED PRECEDING)
          - n_tokens) // 512 AS pack_id
  FROM kept
)
SELECT f.lang,
       f.n_in, k.n_kept, f.n_in - k.n_kept AS n_dropped,
       k.total_tokens, p.n_packs
FROM (SELECT lang, COUNT(*) AS n_in FROM filtered GROUP BY lang) f
JOIN (SELECT lang, COUNT(*) AS n_kept,
             CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
      FROM kept GROUP BY lang) k USING (lang)
JOIN (SELECT lang, COUNT(DISTINCT pack_id) AS n_packs
      FROM packed GROUP BY lang) p USING (lang)
""",
    doc="LLM corpus-curation pipeline composed END-TO-END as one "
    "declared row (the training-data analogue of "
    "pipe_reference_e2e): length filter (30-500 tokens, the "
    "C4-style gate) -> exact-content dedup keeping the lowest "
    "doc_id per md5(text) (the A11 keyed-dedup semantic on text "
    "content) -> greedy 512-token sequence packing per language "
    "(the q_llm_pack decomposition) -> per-language corpus "
    "accounting: docs in, kept, dropped, surviving tokens, packs. "
    "Proves the individually-verified operators compose without "
    "semantic drift.",
    scale_notes="Filter is a pushed scan predicate; dedup shuffles "
    "16-byte md5 keys (never documents); packing is one "
    "lang-partitioned running-sum window; the three summary "
    "ledgers re-aggregate lang-sized frames. Each stage is the "
    "exact plan its standalone operator pins — composition adds "
    "no new shuffle class.",
)
def pipe_llm_corpus_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    filtered = docs.select(
        "doc_id",
        "lang",
        "source",
        "text",
        F.size(F.split("text", " ")).alias("n_tokens"),
    ).filter(F.col("n_tokens").between(30, 500))
    w_dup = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    kept = (
        filtered.withColumn("dup_rn", F.row_number().over(w_dup))
        .filter(F.col("dup_rn") == 1)
        .select("lang", "source", "doc_id", "n_tokens")
    )
    w_pack = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = kept.withColumn(
        "pack_id",
        F.floor(
            (F.sum("n_tokens").over(w_pack) - F.col("n_tokens")) / 512
        ),
    )
    n_in = filtered.groupBy("lang").agg(F.count(F.lit(1)).alias("n_in"))
    k = kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
    )
    p = packed.groupBy("lang").agg(
        F.count_distinct("pack_id").alias("n_packs")
    )
    return (
        n_in.join(k, "lang")
        .join(p, "lang")
        .select(
            "lang",
            "n_in",
            "n_kept",
            (F.col("n_in") - F.col("n_kept")).alias("n_dropped"),
            "total_tokens",
            "n_packs",
        )
    )


_SESSION_GAP_US = 30 * 60 * 1_000_000


@register(
    "pipe_events_e2e",
    oracle=f"""
WITH ordered AS (
  SELECT user_id, ts, event_id, event_type,
         epoch_us(ts) AS ts_us,
         LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS prev_us
  FROM events
), flagged AS (
  SELECT user_id, ts_us, event_type,
         CASE WHEN prev_us IS NULL
                   OR ts_us - prev_us > 1800000000 THEN 1 ELSE 0 END
           AS new_session
  FROM ordered
), sessions AS (
  SELECT user_id, ts_us, event_type,
         SUM(new_session) OVER (PARTITION BY user_id
                                ORDER BY ts_us
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND CURRENT ROW) AS sess_no
  FROM flagged
), sess_agg AS (
  SELECT user_id, sess_no,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS has_purchase,
         MAX(ts_us) - MIN(ts_us) AS dur_us
  FROM sessions GROUP BY user_id, sess_no
), user_agg AS (
  SELECT user_id, CAST(user_id % 2 AS INT) AS arm,
         CAST(COUNT(*) AS BIGINT) AS n_sessions,
         CAST(MAX(has_purchase) AS BIGINT) AS converted,
         CAST(SUM(CAST(dur_us AS HUGEINT)) AS BIGINT) AS total_dur_us,
         CAST(SUM(n_events) AS BIGINT) AS n_events
  FROM sess_agg GROUP BY user_id
)
SELECT arm,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(n_sessions) AS BIGINT) AS n_sessions,
       {signed_ratio_round_sql('CAST(SUM(n_sessions) AS BIGINT)',
                               'COUNT(*)', 4, '//')}
         AS sessions_per_user,
       {signed_ratio_round_sql(
           'CAST(SUM(CAST(total_dur_us AS HUGEINT)) AS BIGINT)',
           'CAST(1000000 * SUM(n_sessions) AS BIGINT)', 4, '//')}
         AS mean_session_s,
       -- CAST: HUGEINT // BIGINT reaches pandas as float64 while
       -- Spark's DIV yields int64 (same driver-canonicalizer dtype
       -- trap as q_ab_metrics, tools/audit_driver_typing.py)
       CAST(SUM(converted) * 1000000 // COUNT(*) AS BIGINT) AS conv_ppm
FROM user_agg GROUP BY arm ORDER BY arm
""",
    doc="Product-analytics pipeline composed end to end, one "
    "hash-verified row per arm: raw events -> 30-minute-gap "
    "sessionization (q_win_sessionize's flag-and-cumsum) -> "
    "session-level rollup (events, duration, purchase flag) -> "
    "user-level rollup -> A/B arm readout (sessions per user, "
    "mean session seconds, converter ppm). The analytics twin of "
    "pipe_reference_e2e / pipe_llm_corpus_e2e: every stage is "
    "oracled individually elsewhere; this row proves the "
    "COMPOSITION stays exact through four stacked reductions.",
    scale_notes="ONE user_id shuffle feeds the lag flag, the "
    "session cumsum, and the session/user rollups (all share the "
    "partition key); the arm readout is a 2-row ledger. Exactly "
    "the q_win_sessionize physics with two more reduce stages — "
    "no stage widens the data after the first.",
)
def pipe_events_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = ev.select(
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
        F.lag(F.unix_micros("ts")).over(w).alias("prev_us"),
    )
    flagged = ordered.select(
        "user_id",
        "ts_us",
        "event_type",
        F.when(
            F.col("prev_us").isNull()
            | (F.col("ts_us") - F.col("prev_us") > _SESSION_GAP_US),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    w_sess = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sessions = flagged.select(
        "user_id",
        "ts_us",
        "event_type",
        F.sum("new_session").over(w_sess).alias("sess_no"),
    )
    sess_agg = sessions.groupBy("user_id", "sess_no").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        )
        .cast("bigint")
        .alias("has_purchase"),
        (F.max("ts_us") - F.min("ts_us")).alias("dur_us"),
    )
    user_agg = sess_agg.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
        F.max("has_purchase").cast("bigint").alias("converted"),
        F.sum(F.col("dur_us").cast("decimal(20,0)"))
        .cast("bigint")
        .alias("total_dur_us"),
    )
    return (
        user_agg.select(
            (F.col("user_id") % 2).cast("int").alias("arm"),
            "n_sessions",
            "converted",
            "total_dur_us",
        )
        .groupBy("arm")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.sum("n_sessions").cast("bigint").alias("n_sessions"),
            # exact integer half-up (rule-8 batch-2 sweep)
            F.expr(
                signed_ratio_round_sql(
                    "sum(n_sessions)", "count(1)", 4, "div"
                )
            ).alias("sessions_per_user"),
            F.expr(
                signed_ratio_round_sql(
                    "CAST(sum(CAST(total_dur_us AS DECIMAL(28,0)))"
                    " AS BIGINT)",
                    "1000000 * sum(n_sessions)", 4, "div",
                )
            ).alias("mean_session_s"),
            F.expr(
                "CAST(sum(converted) * 1000000 DIV count(1) AS BIGINT)"
            ).alias("conv_ppm"),
        )
        .orderBy("arm")
    )
