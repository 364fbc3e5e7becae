"""Event-sequence / time-series operators (SURVEY.md §2 B.12, round 6
second batch): smoothing, anomaly flags, Markov transitions, snapshot
diffing, and rank fusion.

The reference pipeline (lambda_function.py:96-150) lands raw
weather/event observations; these are the standard analyses a
warehouse layers on such a table — each a single declarative plan,
exact-oracled against DuckDB:

- q_time_ewma: truncated-kernel exponential smoothing (8 lag taps,
  alpha=0.3) — the window-closed-form of the recursive EWMA, so it
  needs no iterative state and no UDF;
- q_time_anomaly: rolling z-score outlier flags over a trailing
  24-observation frame per event type;
- q_event_transitions: first-order Markov transition counts and
  probabilities between consecutive event types per user;
- q_snapshot_diff: added/removed/updated classification between two
  keyed snapshots via one full-outer join (the audit companion to
  q_cdc_upsert's MERGE);
- q_rank_fusion: reciprocal-rank fusion of two top-k document
  rankings — the standard multi-retriever result combiner.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from weather_etl_spark.functions.exact import (
    decimal_mean_round4_sql,
    portable_round4_sql,
    ratio_round4_sql,
    signed_ratio_round4_sql,
)
from weather_etl_spark.io import read_table
from weather_etl_spark.registry import register

#: EWMA smoothing factor and the 8-tap truncated kernel weights
#: a*(1-a)^k. (1-a)^8 ~ 5.8% of mass is truncated; the per-row
#: re-normalization over *present* taps redistributes it, which also
#: makes the series well-defined from the first row. repr()'d doubles
#: are embedded verbatim in both engines so the arithmetic is
#: bit-identical before the final ROUND.
_EWMA_ALPHA = 0.3
_EWMA_TAPS = 8
_EWMA_W = [repr(_EWMA_ALPHA * (1.0 - _EWMA_ALPHA) ** k) for k in range(_EWMA_TAPS)]


def _ewma_sql(val: str, lag_fmt: str) -> tuple[str, str]:
    """(numerator, denominator) SQL over lag taps; identical text for
    both engines modulo the lag expression format."""
    num = " + ".join(
        f"COALESCE({lag_fmt.format(k=k)} * {w}, 0.0)"
        for k, w in enumerate(_EWMA_W)
    )
    den = " + ".join(
        f"CASE WHEN {lag_fmt.format(k=k)} IS NULL THEN 0.0 ELSE {w} END"
        for k, w in enumerate(_EWMA_W)
    )
    return num, den


_EWMA_NUM_D, _EWMA_DEN_D = _ewma_sql(
    "value", "lag(value, {k}) OVER (PARTITION BY user_id ORDER BY ts, event_id)"
)


@register(
    "q_time_ewma",
    oracle=f"""
-- Portable ROUND (SURVEY 7.4 rule 8): both outputs are genuine fp
-- (raw column value / ratio of fp kernel sums), so float ROUND
-- diverges on planted half-tie reprs (r12 half-tie stream:
-- value_r 4.69185, chained ewma ties) — portable_round4_sql
-- reproduces Spark's shortest-repr half-up on both.
SELECT user_id, event_id,
       {portable_round4_sql('value')} AS value_r,
       {portable_round4_sql(f'({_EWMA_NUM_D}) / ({_EWMA_DEN_D})')} AS ewma
FROM events
""",
    doc="Exponentially weighted moving average of events.value per "
    f"user (alpha={_EWMA_ALPHA}), expressed as the {_EWMA_TAPS}-tap "
    "truncated kernel: ewma_n = sum_k w_k * x_(n-k) / sum_k w_k over "
    "the taps that exist, w_k = a(1-a)^k. The closed form replaces "
    "the recursive definition, so it is one window pass with bounded "
    "frame state instead of an order-dependent scan; the truncated "
    "<6% tail is re-normalized into the present taps.",
    scale_notes="One shuffle on user_id, per-partition sort, 8 lag "
    "slots of frame state per row — identical shape to q_win_lag. "
    "The kernel is compile-time constants, so the whole expression "
    "codegens; no UDF, no recursion. At 100 TB the per-user series "
    "is the unit of parallelism (millions of users >> cores).",
)
def q_time_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    taps = [F.lag("value", k).over(w) for k in range(_EWMA_TAPS)]
    num = None
    den = None
    for k, tap in enumerate(taps):
        wk = float(_EWMA_W[k])
        term = F.coalesce(tap * F.lit(wk), F.lit(0.0))
        mass = F.when(tap.isNull(), F.lit(0.0)).otherwise(F.lit(wk))
        num = term if num is None else num + term
        den = mass if den is None else den + mass
    return ev.select(
        "user_id",
        "event_id",
        F.round("value", 4).alias("value_r"),
        F.round(num / den, 4).alias("ewma"),
    )


_ANOM_FRAME = 24  # trailing observations per event_type
_ANOM_MIN_N = 8  # minimum history before a z-score is emitted
_ANOM_Z = 3.0


@register(
    "q_time_anomaly",
    oracle=f"""
WITH w AS (
  SELECT event_id, event_type, value,
         avg(value) OVER win AS mu,
         stddev_samp(value) OVER win AS sd,
         count(value) OVER win AS n_hist
  FROM events
  WINDOW win AS (PARTITION BY event_type ORDER BY ts, event_id
                 ROWS BETWEEN {_ANOM_FRAME} PRECEDING AND 1 PRECEDING)
)
-- value_r takes the portable ROUND (raw doubles land planted
-- half-tie reprs — r12 half-tie stream); zscore keeps float ROUND:
-- sd is a sqrt, so a terminating-decimal tie is unconstructible
-- there (the r10 transcendental-term ruling).
SELECT event_id, event_type, {portable_round4_sql('value')} AS value_r,
       ROUND((value - mu) / sd, 4) + 0.0 AS zscore,
       CAST(abs((value - mu) / sd) > {_ANOM_Z} AS BOOLEAN) AS is_anomaly
FROM w
WHERE n_hist >= {_ANOM_MIN_N} AND sd > 0
""",
    doc="Rolling z-score anomaly detection: for each event, the mean "
    f"and sample stddev of the trailing {_ANOM_FRAME} observations of "
    "the same event type (frame excludes the current row, so the "
    "score is out-of-sample); |z| > 3 flags the row. Rows with fewer "
    f"than {_ANOM_MIN_N} history points or zero variance are "
    "withheld rather than scored against noise.",
    scale_notes="One shuffle on event_type (low cardinality — at "
    "100 TB salt into (event_type, time-bucket) exactly as "
    "q_win_moving's scale note prescribes, flushing bucket-boundary "
    "frames), bounded 24-row frame state. stddev over a frame is "
    "incremental in both engines; no second pass.",
)
def q_time_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    win = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-_ANOM_FRAME, -1)
    )
    mu = F.avg("value").over(win)
    sd = F.stddev_samp("value").over(win)
    n_hist = F.count("value").over(win)
    z = (F.col("value") - mu) / sd
    return (
        ev.select(
            "event_id",
            "event_type",
            F.round("value", 4).alias("value_r"),
            # + 0.0 canonicalizes -0.0 (Spark rounds -1e-9 to 0.0,
            # DuckDB to -0.0; IEEE -0.0 + 0.0 = +0.0 in both)
            (F.round(z, 4) + F.lit(0.0)).alias("zscore"),
            (F.abs(z) > _ANOM_Z).alias("is_anomaly"),
            n_hist.alias("n_hist"),
            sd.alias("sd"),
        )
        .filter((F.col("n_hist") >= _ANOM_MIN_N) & (F.col("sd") > 0))
        .drop("n_hist", "sd")
    )


@register(
    "q_event_transitions",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events
), pairs AS (
  SELECT prev_type, event_type AS next_type, COUNT(*) AS n
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY prev_type, event_type
)
SELECT prev_type, next_type, n,
       ROUND(CAST(n AS DOUBLE) /
             SUM(n) OVER (PARTITION BY prev_type), 4) AS p
FROM pairs
""",
    doc="First-order Markov transition matrix over event types: for "
    "each user's time-ordered stream, count consecutive "
    "(prev, next) event-type pairs and normalize to per-prev-state "
    "transition probabilities — the standard user-journey / "
    "next-event model fit, as two window passes and one aggregate.",
    scale_notes="Shuffle 1 on user_id for the lag (the only pass "
    "over raw events); shuffle 2 carries one row per observed "
    "type-pair (|types|^2 rows, constant-bounded), so the transition "
    "normalization window is trivially small. Map-side partial "
    "aggregation compresses the pair stream before the exchange.",
)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            F.lag("event_type").over(w).alias("prev_type"),
            F.col("event_type").alias("next_type"),
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wp = Window.partitionBy("prev_type")
    return pairs.select(
        "prev_type",
        "next_type",
        "n",
        F.round(F.col("n").cast("double") / F.sum("n").over(wp), 4).alias("p"),
    )


@register(
    "q_snapshot_diff",
    oracle="""
WITH old AS (
  SELECT o_orderkey AS k,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders WHERE o_orderkey % 7 <> 0
), new AS (
  SELECT o_orderkey AS k,
         CAST(ROUND(o_totalprice * 100) AS BIGINT)
           + CASE WHEN o_orderkey % 3 = 0 THEN 1000 ELSE 0 END AS cents
  FROM orders WHERE o_orderkey % 5 <> 0
)
SELECT COALESCE(old.k, new.k) AS o_orderkey,
       CASE WHEN old.k IS NULL THEN 'added'
            WHEN new.k IS NULL THEN 'removed'
            ELSE 'updated' END AS change,
       old.cents AS old_cents, new.cents AS new_cents
FROM old FULL OUTER JOIN new ON old.k = new.k
WHERE old.k IS NULL OR new.k IS NULL OR old.cents <> new.cents
""",
    doc="Keyed snapshot diff: two order snapshots (derived "
    "deterministically from the orders table — the 'old' snapshot "
    "omits keys = 0 mod 7, the 'new' omits 0 mod 5 and bumps every "
    "0-mod-3 price by 10.00) are full-outer joined on the key and "
    "each divergent row classified added / removed / updated. "
    "Money compared in integer cents so the diff is exact. The "
    "audit-trail companion to q_cdc_upsert: MERGE applies changes, "
    "this reports them.",
    scale_notes="One co-partitioned shuffle join on the snapshot key "
    "(both sides hash-partition identically — at 100 TB bucket both "
    "snapshots on the key and the Exchange disappears, the "
    "q_join_bucketed pattern). Unchanged rows are filtered "
    "post-join; output is proportional to churn, not table size.",
)
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    old = orders.filter(F.col("o_orderkey") % 7 != 0).select(
        F.col("o_orderkey").alias("k"), cents.alias("cents")
    )
    new = orders.filter(F.col("o_orderkey") % 5 != 0).select(
        F.col("o_orderkey").alias("k"),
        (
            cents
            + F.when(F.col("o_orderkey") % 3 == 0, F.lit(1000)).otherwise(
                F.lit(0)
            )
        ).alias("cents"),
    )
    o, n = old.alias("o"), new.alias("n")
    joined = o.join(n, F.col("o.k") == F.col("n.k"), "full_outer")
    return joined.select(
        F.coalesce(F.col("o.k"), F.col("n.k")).alias("o_orderkey"),
        F.when(F.col("o.k").isNull(), F.lit("added"))
        .when(F.col("n.k").isNull(), F.lit("removed"))
        .otherwise(F.lit("updated"))
        .alias("change"),
        F.col("o.cents").alias("old_cents"),
        F.col("n.cents").alias("new_cents"),
    ).filter(
        F.col("o.k").isNull()
        | F.col("n.k").isNull()
        | (F.col("o.cents") != F.col("n.cents"))
    )


_RRF_K = 60  # standard reciprocal-rank-fusion damping constant
_RRF_TOPN = 200  # per-retriever candidate list depth
_RRF_OUT = 100  # fused result size


@register(
    "q_rank_fusion",
    oracle=f"""
WITH by_len AS (
  SELECT doc_id, row_number() OVER (ORDER BY n_chars DESC, doc_id) AS r
  FROM documents
), by_hash AS (
  SELECT doc_id, row_number() OVER (ORDER BY md5(text), doc_id) AS r
  FROM documents
), fused AS (
  SELECT COALESCE(l.doc_id, h.doc_id) AS doc_id,
         COALESCE(l.r, 0) AS r_len, COALESCE(h.r, 0) AS r_hash,
         COALESCE(1.0 / ({_RRF_K} + l.r), 0.0)
           + COALESCE(1.0 / ({_RRF_K} + h.r), 0.0) AS score
  FROM (SELECT * FROM by_len WHERE r <= {_RRF_TOPN}) l
  FULL OUTER JOIN (SELECT * FROM by_hash WHERE r <= {_RRF_TOPN}) h
    ON l.doc_id = h.doc_id
)
SELECT doc_id, r_len, r_hash, ROUND(score, 6) AS rrf,
       row_number() OVER (ORDER BY score DESC, doc_id) AS fused_rank
FROM fused
ORDER BY score DESC, doc_id
LIMIT {_RRF_OUT}
""",
    doc="Reciprocal-rank fusion of two document rankings (the "
    "standard combiner for multi-retriever search): retriever 1 "
    "ranks by length, retriever 2 by content hash (a deterministic "
    "stand-in for a relevance model); each contributes "
    f"1/({_RRF_K}+rank) for its top-{_RRF_TOPN} list, lists are "
    "full-outer merged on doc_id (absent = 0 contribution, exactly "
    f"the published RRF over top-k lists), top {_RRF_OUT} emitted "
    "with a full doc_id tie-break.",
    scale_notes=f"rank<={_RRF_TOPN} compiles to WindowGroupLimit: "
    "per-partition top-N heaps feed the single-partition ranking "
    "window with N rows per input partition, never the corpus. The "
    f"fusion join touches <=2x{_RRF_TOPN} rows and the final sort is "
    "TakeOrderedAndProject. Candidate depth, not corpus size, "
    "bounds every post-scan stage.",
)
def q_rank_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    w_len = Window.orderBy(F.desc("n_chars"), F.asc("doc_id"))
    w_hash = Window.orderBy(F.md5("text"), F.asc("doc_id"))
    by_len = (
        docs.select("doc_id", F.row_number().over(w_len).alias("r"))
        .filter(F.col("r") <= _RRF_TOPN)
        .alias("l")
    )
    by_hash = (
        docs.select("doc_id", F.row_number().over(w_hash).alias("r"))
        .filter(F.col("r") <= _RRF_TOPN)
        .alias("h")
    )
    fused = by_len.join(
        by_hash, F.col("l.doc_id") == F.col("h.doc_id"), "full_outer"
    ).select(
        F.coalesce(F.col("l.doc_id"), F.col("h.doc_id")).alias("doc_id"),
        F.coalesce(F.col("l.r"), F.lit(0)).alias("r_len"),
        F.coalesce(F.col("h.r"), F.lit(0)).alias("r_hash"),
        (
            F.coalesce(1.0 / (_RRF_K + F.col("l.r")), F.lit(0.0))
            + F.coalesce(1.0 / (_RRF_K + F.col("h.r")), F.lit(0.0))
        ).alias("score"),
    )
    w_fused = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        fused.select(
            "doc_id",
            "r_len",
            "r_hash",
            F.round("score", 6).alias("rrf"),
            F.row_number().over(w_fused).alias("fused_rank"),
            "score",
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(_RRF_OUT)
        .drop("score")
    )


@register(
    "q_event_attribution",
    oracle="""
WITH marked AS (
  SELECT event_id, user_id, ts, event_type, value,
         first_value(CASE WHEN event_type = 'click' THEN event_id END
                     IGNORE NULLS) OVER w AS first_click_id,
         last_value(CASE WHEN event_type = 'click' THEN event_id END
                    IGNORE NULLS) OVER w AS last_click_id
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
)
SELECT event_id, user_id,
       CAST(ROUND(value * 100) AS BIGINT) AS value_cents,
       first_click_id, last_click_id,
       (last_click_id IS NOT NULL) AS attributed
FROM marked WHERE event_type = 'purchase'
""",
    doc="Marketing attribution: each purchase is credited to the "
    "user's FIRST preceding click (first-touch) and MOST RECENT "
    "preceding click (last-touch), both strictly before the purchase "
    "— one window pass with IGNORE NULLS first/last over the "
    "click-marker column, no self-join against the click stream. "
    "Purchases with no prior click surface as unattributed.",
    scale_notes="One user_id shuffle; the frame state is two event "
    "ids, not the click history. The self-join formulation this "
    "replaces (purchases x clicks, ts-range predicate) is quadratic "
    "per heavy user — the window form is linear and inherits "
    "q_win_lag's salting recipe for degenerate users.",
)
def q_event_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    click_id = F.when(F.col("event_type") == "click", F.col("event_id"))
    first_click = F.first(click_id, ignorenulls=True).over(w)
    last_click = F.last(click_id, ignorenulls=True).over(w)
    return (
        ev.select(
            "event_id",
            "user_id",
            "event_type",
            F.round(F.col("value") * 100).cast("bigint").alias("value_cents"),
            first_click.alias("first_click_id"),
            last_click.alias("last_click_id"),
        )
        .filter(F.col("event_type") == "purchase")
        .drop("event_type")
        .withColumn("attributed", F.col("last_click_id").isNotNull())
    )


@register(
    "q_event_trigrams",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type AS e1,
         lead(event_type, 1) OVER w AS e2,
         lead(event_type, 2) OVER w AS e3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT e1 || '>' || e2 || '>' || e3 AS trigram,
       COUNT(*) AS n_occ,
       COUNT(DISTINCT user_id) AS support
FROM seq
WHERE e3 IS NOT NULL
GROUP BY 1
ORDER BY support DESC, n_occ DESC, trigram ASC
LIMIT 20
""",
    doc="Sequential-pattern support counting: consecutive event-type "
    "trigrams per user's time-ordered stream (ties broken by "
    "event_id), ranked by user support then total occurrences — the "
    "length-3 instance of the classic frequent-sequence mining "
    "(GSP/PrefixSpan support metric) over clickstreams.",
    scale_notes="One shuffle on user_id shared by the two lead() "
    "frames, then a map-combined aggregation whose key space is "
    "|event_type|^3 (bounded vocabulary, 125 here) — the shuffled "
    "aggregate carries (trigram, partial count, partial user set "
    "via per-user pre-distinct) pairs, never raw events. Hot users "
    "are bounded by their own event count; no all-pairs anywhere.",
)
def q_event_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).filter(F.col("e3").isNotNull())
    return (
        seq.select(
            F.concat_ws(">", "e1", "e2", "e3").alias("trigram"), "user_id"
        )
        .groupBy("trigram")
        .agg(
            F.count(F.lit(1)).alias("n_occ"),
            F.count_distinct("user_id").alias("support"),
        )
        .orderBy(
            F.col("support").desc(),
            F.col("n_occ").desc(),
            F.col("trigram").asc(),
        )
        .limit(20)
    )


#: Holt double-exponential smoothing factors (level, trend).  repr()'d
#: literals are embedded verbatim in both engines so the sequential
#: recursion is bit-identical before the final ROUND.
_HOLT_A = 0.5
_HOLT_B = 0.3


@register(
    "q_time_holt",
    oracle=f"""
WITH RECURSIVE s AS (
  SELECT event_type, date_trunc('hour', ts) AS h,
         CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                                 ORDER BY date_trunc('hour', ts))
              AS BIGINT) AS idx,
         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS y
  FROM events
  GROUP BY event_type, date_trunc('hour', ts)
), rec AS (
  SELECT event_type, idx, y, y AS l, CAST(0.0 AS DOUBLE) AS b
  FROM s WHERE idx = 1
  UNION ALL
  SELECT s.event_type, s.idx, s.y,
         {_HOLT_A} * s.y + {1.0 - _HOLT_A} * (rec.l + rec.b) AS l,
         {_HOLT_B} * (({_HOLT_A} * s.y + {1.0 - _HOLT_A} * (rec.l + rec.b))
                      - rec.l)
           + {1.0 - _HOLT_B} * rec.b AS b
  FROM rec JOIN s ON s.event_type = rec.event_type
                 AND s.idx = rec.idx + 1
)
-- Portable ROUND (SURVEY 7.4 rule 8): Spark's round() is half-up on
-- the double's SHORTEST DECIMAL REPR (Java BigDecimal.valueOf), while
-- DuckDB's ROUND multiplies by 10^4 in double — and alpha=0.5 keeps
-- this recursion on decimal grids where the two disagree routinely
-- (measured: trend 485.4562 vs .4563, forecast 5.1439 vs .1438).
-- CAST(x AS VARCHAR) reproduces the shortest repr and the DECIMAL
-- parse rounds it half-up; the ABS guard covers DuckDB's sci-notation
-- mantissa mis-parse below 0.5e-4. Valid for |x| < ~1e10 (here
-- values are bounded by event magnitudes), fuzz-pinned equivalent to
-- Spark round() in tests/test_portable_round.py.
SELECT r.event_type, epoch_us(s.h) AS h_us,
       CASE WHEN ABS(r.y) < 0.00005 THEN 0.0
            ELSE CAST(CAST(r.y AS VARCHAR) AS DECIMAL(30,4))::DOUBLE
       END AS y_r,
       CASE WHEN ABS(r.l) < 0.00005 THEN 0.0
            ELSE CAST(CAST(r.l AS VARCHAR) AS DECIMAL(30,4))::DOUBLE
       END AS level,
       CASE WHEN ABS(r.b) < 0.00005 THEN 0.0
            ELSE CAST(CAST(r.b AS VARCHAR) AS DECIMAL(30,4))::DOUBLE
       END AS trend,
       CASE WHEN ABS(r.l + r.b) < 0.00005 THEN 0.0
            ELSE CAST(CAST(r.l + r.b AS VARCHAR) AS DECIMAL(30,4))::DOUBLE
       END AS forecast
FROM rec r JOIN s ON s.event_type = r.event_type AND s.idx = r.idx
""",
    doc="Holt double-exponential smoothing (level + linear trend) of "
    "each event type's hourly mean-value series — the classic "
    "short-horizon forecaster one step up from q_time_ewma's "
    "level-only kernel. l_t = a*y_t + (1-a)(l+b), "
    "b_t = B*(l_t - l) + (1-B)*b, initialized (l_1, b_1) = (y_1, 0); "
    "`forecast` is the one-step-ahead l_t + b_t. The recursion is "
    "inherently sequential per series, so it runs as an "
    "applyInPandas loop per event type, oracled by a DuckDB "
    "recursive CTE evaluating the identical IEEE expression tree "
    "(bucket means are DECIMAL-exact before the double recursion).",
    scale_notes="One shuffle to bucket (map-combined: the hourly "
    "ledger is |types| x hours, tiny), one to group series. The "
    "sequential pass is O(series length) per key with Arrow-batched "
    "transfer — the standard distributed-stateful shape: per-key "
    "recurrences parallelize ACROSS keys, and a 100 TB deployment "
    "carries (level, trend) checkpoints per key so each time chunk "
    "resumes from saved state instead of rescanning history "
    "(exactly the reference's cursor pattern, A8, applied to model "
    "state).",
)
def q_time_holt(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    ev = read_table(spark, sf_dir, "events")
    buck = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(
        (
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("y")
    ).select(
        "event_type", F.unix_micros("h").alias("h_us"), "y"
    )

    schema = (
        "event_type string, h_us long, y double, l double, b double"
    )

    def holt(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("h_us").reset_index(drop=True)
        levels: list[float] = []
        trends: list[float] = []
        l = b = 0.0
        for i, y in enumerate(pdf["y"]):
            y = float(y)
            if i == 0:
                l, b = y, 0.0
            else:
                l_new = _HOLT_A * y + (1.0 - _HOLT_A) * (l + b)
                b = _HOLT_B * (l_new - l) + (1.0 - _HOLT_B) * b
                l = l_new
            levels.append(l)
            trends.append(b)
        return pd.DataFrame(
            {
                "event_type": pdf["event_type"],
                "h_us": pdf["h_us"],
                "y": pdf["y"],
                "l": levels,
                "b": trends,
            }
        )

    # The UDF emits RAW doubles; rounding happens in the engine
    # expression layer (F.round matches DuckDB ROUND half-away
    # semantics — python round() is banker's and would drift).
    return (
        buck.groupBy("event_type")
        .applyInPandas(holt, schema)
        .select(
            "event_type",
            "h_us",
            F.round("y", 4).alias("y_r"),
            F.round("l", 4).alias("level"),
            F.round("b", 4).alias("trend"),
            F.round(F.col("l") + F.col("b"), 4).alias("forecast"),
        )
    )


#: CUSUM slack (k, in value units) and alarm threshold (h) — Page's
#: one-sided upper CUSUM; repr()'d literals embed identically in both
#: engines.
_CUSUM_K = 0.5
_CUSUM_H = 50.0


@register(
    "q_time_cusum",
    oracle=f"""
WITH RECURSIVE s AS (
  SELECT event_type, date_trunc('hour', ts) AS h,
         CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                                 ORDER BY date_trunc('hour', ts))
              AS BIGINT) AS idx,
         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS y
  FROM events
  GROUP BY event_type, date_trunc('hour', ts)
), mu AS (
  SELECT event_type,
         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
           AS mu
  FROM events GROUP BY event_type
), rec AS (
  SELECT s.event_type, s.idx,
         greatest(CAST(0.0 AS DOUBLE),
                  s.y - mu.mu - {_CUSUM_K}) AS cusum
  FROM s JOIN mu USING (event_type) WHERE s.idx = 1
  UNION ALL
  SELECT s.event_type, s.idx,
         greatest(CAST(0.0 AS DOUBLE),
                  rec.cusum + (s.y - mu.mu - {_CUSUM_K})) AS cusum
  FROM rec
  JOIN s ON s.event_type = rec.event_type AND s.idx = rec.idx + 1
  JOIN mu ON mu.event_type = rec.event_type
)
-- Portable ROUND (SURVEY 7.4 rule 8, the q_time_holt idiom): float
-- ROUND(x,4) diverges between engines on shortest-repr half ties —
-- the r12 seed campaign (offset 31337007) caught this recursion
-- landing on 2.72875 exactly (Spark half-up 2.7288, DuckDB's
-- double-multiply 2.7287).  portable_round4_sql reproduces Spark's
-- BigDecimal shortest-repr half-up semantics.
SELECT r.event_type, epoch_us(s.h) AS h_us,
       {portable_round4_sql('r.cusum')} AS cusum,
       r.cusum > {_CUSUM_H} AS alarm
FROM rec r JOIN s ON s.event_type = r.event_type AND s.idx = r.idx
""",
    doc="Page's one-sided CUSUM changepoint detector over each event "
    "type's hourly mean series: S_t = max(0, S_t-1 + (y_t - mu - k)) "
    "with the in-control mean mu estimated from the full series, "
    "slack k = 0.5, alarm at S > 50 — the classic sequential "
    "upward-shift detector that q_time_anomaly's windowed z-score "
    "cannot replicate (CUSUM accumulates small persistent shifts). "
    "Same sequential-recursion discipline as q_time_holt: "
    "applyInPandas per key, oracled by a recursive CTE evaluating "
    "the identical IEEE expression tree on DECIMAL-exact bucket "
    "means.",
    scale_notes="One bucket shuffle (map-combined hourly ledger), "
    "one mu ledger reusing the same scan shape, then O(series) "
    "sequential state per key parallel across keys. At 100 TB the "
    "(S, mu) pair checkpoints per key per time chunk — the "
    "reference's cursor pattern (A8) applied to detector state, "
    "identical to q_time_holt's deployment story.",
)
def q_time_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    ev = read_table(spark, sf_dir, "events")
    buck = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(
        (
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("y")
    ).select("event_type", F.unix_micros("h").alias("h_us"), "y")
    mu = ev.groupBy("event_type").agg(
        (
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("mu")
    )
    joined = buck.join(mu, "event_type")

    schema = "event_type string, h_us long, cusum double"

    def cusum(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("h_us").reset_index(drop=True)
        out: list[float] = []
        s = 0.0
        for i, (y, m) in enumerate(zip(pdf["y"], pdf["mu"])):
            step = float(y) - float(m) - _CUSUM_K
            s = max(0.0, (s + step) if i else step)
            out.append(s)
        return pd.DataFrame(
            {
                "event_type": pdf["event_type"],
                "h_us": pdf["h_us"],
                "cusum": out,
            }
        )

    # Rounding stays in the engine expression layer (the Holt lesson).
    return (
        joined.groupBy("event_type")
        .applyInPandas(cusum, schema)
        .select(
            "event_type",
            "h_us",
            F.round("cusum", 4).alias("cusum"),
            (F.col("cusum") > _CUSUM_H).alias("alarm"),
        )
    )


@register(
    "q_event_interarrival",
    oracle="""
WITH g AS (
  SELECT event_type,
         epoch_us(ts) - lag(epoch_us(ts))
           OVER (PARTITION BY event_type ORDER BY ts, event_id) AS gap
  FROM events
)
SELECT event_type,
       COUNT(gap) AS n_gaps,
       CAST(MIN(gap) AS BIGINT) AS min_us,
       CAST(MAX(gap) AS BIGINT) AS max_us,
       CAST(SUM(gap) AS BIGINT) AS total_us,
       CAST(median(gap) AS DOUBLE) AS median_us
FROM g
GROUP BY event_type
""",
    doc="Inter-arrival gap statistics per event type (the "
    "ops-monitoring heartbeat metric: is traffic arriving at the "
    "expected cadence?): consecutive-event gaps in exact "
    "microseconds — count, min, max, total (mean derives as "
    "total/n without a rounding contract), and the exact median "
    "(integer gaps make even-count midpoints dyadic, so the double "
    "is bit-identical cross-engine with no rounding at all).",
    scale_notes="One event_type shuffle for the lag window, then a "
    "type-sized ledger; the exact median re-sorts per group at "
    "bench SF and swaps to the fixed-bin histogram sketch "
    "(q_agg_hist_quantile) at 100 TB. Gap integers are exact at "
    "any scale.",
)
def q_event_interarrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    g = ev.select(
        "event_type",
        (
            F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
        ).alias("gap"),
    )
    return g.groupBy("event_type").agg(
        F.count("gap").alias("n_gaps"),
        F.min("gap").cast("bigint").alias("min_us"),
        F.max("gap").cast("bigint").alias("max_us"),
        F.sum("gap").cast("bigint").alias("total_us"),
        F.expr("percentile(gap, 0.5)").cast("double").alias("median_us"),
    )


@register(
    "q_event_dau_wau",
    oracle=f"""
WITH ud AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
  FROM events
), days AS (
  SELECT DISTINCT day FROM ud
), dau AS (
  SELECT day, COUNT(*) AS dau FROM ud GROUP BY day
), wau AS (
  SELECT d.day, COUNT(DISTINCT u.user_id) AS wau
  FROM days d JOIN ud u
    ON u.day BETWEEN d.day - INTERVAL 6 DAY AND d.day
  GROUP BY d.day
)
SELECT CAST(dau.day AS DATE) AS day, dau.dau AS dau, wau.wau AS wau,
       {ratio_round4_sql('dau.dau', 'wau.wau', '//')} AS stickiness
FROM dau JOIN wau USING (day)
""",
    doc="DAU / WAU / stickiness (the product-analytics triple): "
    "distinct active users per day, per trailing 7-day window, and "
    "the DAU/WAU ratio (1.0 = every weekly user returns daily). "
    "Built from the deduplicated user-day ledger, never raw "
    "events: each user-day explodes to its <= 7 anchor days and "
    "equi-joins the observed-day axis, so each day's weekly count "
    "is exact with no non-equi join anywhere.",
    scale_notes="The user-day distinct is the one event-scale "
    "shuffle (map-combined); everything after runs on the "
    "(users x days)-bounded ledger with <= 7x replication — the "
    "grid-join bound, one equi hash join on the day key. At "
    "100 TB swap exact weekly distincts for per-day HLL registers "
    "merged over the window (q_agg_hll_rollup's machinery) and "
    "the shape is ledger-only end-to-end.",
)
def q_event_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    ud = ev.select(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).distinct()
    days = ud.select("day").distinct()
    dau = ud.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    # Each user-day contributes to <= 7 anchor days: explode to the
    # anchors (the 1-D grid trick) and EQUI-join — never a non-equi
    # BNL between the day axis and the ledger.
    contrib = ud.select(
        "user_id",
        F.explode(
            F.expr("sequence(day, date_add(day, 6))")
        ).alias("anchor"),
    )
    wau = (
        contrib.join(
            F.broadcast(days.select(F.col("day").alias("anchor"))),
            "anchor",
        )
        .groupBy("anchor")
        .agg(F.count_distinct("user_id").alias("wau"))
    )
    return (
        dau.join(wau, dau.day == wau.anchor)
        .select(
            "day",
            "dau",
            "wau",
            # exact integer half-up (rule-8 batch-2 sweep)
            F.expr(ratio_round4_sql("dau", "wau", "div")).alias(
                "stickiness"
            ),
        )
    )


@register(
    "q_event_lifecycle",
    oracle="""
WITH ud AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
  FROM events
), firsts AS (
  SELECT user_id, MIN(day) AS first_day FROM ud GROUP BY user_id
), tagged AS (
  SELECT a.day,
         CASE
           WHEN a.day = f.first_day THEN 'new'
           WHEN b.user_id IS NOT NULL THEN 'retained'
           ELSE 'resurrected'
         END AS state
  FROM ud a
  JOIN firsts f ON f.user_id = a.user_id
  LEFT JOIN ud b ON b.user_id = a.user_id
             AND b.day = a.day - INTERVAL 1 DAY
), churn AS (
  SELECT CAST(a.day + INTERVAL 1 DAY AS DATE) AS day,
         COUNT(*) AS n_churned
  FROM ud a
  LEFT JOIN ud b ON b.user_id = a.user_id
             AND b.day = a.day + INTERVAL 1 DAY
  WHERE b.user_id IS NULL
  GROUP BY a.day
), act AS (
  SELECT day,
         CAST(SUM(CASE WHEN state = 'new' THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
         CAST(SUM(CASE WHEN state = 'retained' THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
         CAST(SUM(CASE WHEN state = 'resurrected' THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected
  FROM tagged GROUP BY day
)
SELECT act.day, n_new, n_retained, n_resurrected,
       CAST(COALESCE(churn.n_churned, 0) AS BIGINT) AS n_churned,
       CASE WHEN COALESCE(churn.n_churned, 0) > 0
            THEN ROUND(CAST(n_new + n_resurrected AS DOUBLE)
                       / churn.n_churned, 4)
       END AS quick_ratio
FROM act LEFT JOIN churn ON churn.day = act.day
""",
    doc="Growth accounting (the new/retained/resurrected/churned "
    "ledger): every active user-day classified against the "
    "previous day and the user's first-ever day; churn attributed "
    "to the day AFTER the last active day; quick ratio = (new + "
    "resurrected) / churned, NULL on churn-free days. Only "
    "observed activity days are emitted, so the day after the "
    "final fixture day (all-churn, no activity) is out of support "
    "by construction.",
    scale_notes="Everything after the one event-scale user-day "
    "distinct runs on the (users x days) ledger: the prev-day and "
    "next-day probes are self equi joins on (user_id, day) — "
    "never a window over raw events — and the per-day rollup is "
    "ledger-sized. The q_event_dau_wau shape with lifecycle "
    "states instead of window counts.",
)
def q_event_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    ud = ev.select(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).distinct()
    firsts = ud.groupBy("user_id").agg(F.min("day").alias("first_day"))
    prev = ud.select(
        "user_id", F.date_add("day", 1).alias("day"), F.lit(1).alias("had_prev")
    )
    tagged = (
        ud.join(firsts, "user_id")
        .join(prev, ["user_id", "day"], "left")
        .select(
            "day",
            F.when(F.col("day") == F.col("first_day"), "new")
            .when(F.col("had_prev").isNotNull(), "retained")
            .otherwise("resurrected")
            .alias("state"),
        )
    )
    churn = (
        ud.join(
            ud.select("user_id", F.date_sub("day", 1).alias("day")),
            ["user_id", "day"],
            "left_anti",
        )
        .groupBy(F.date_add("day", 1).alias("day"))
        .agg(F.count(F.lit(1)).alias("n_churned"))
    )
    act = tagged.groupBy("day").agg(
        F.sum(F.when(F.col("state") == "new", 1).otherwise(0))
        .cast("bigint")
        .alias("n_new"),
        F.sum(F.when(F.col("state") == "retained", 1).otherwise(0))
        .cast("bigint")
        .alias("n_retained"),
        F.sum(F.when(F.col("state") == "resurrected", 1).otherwise(0))
        .cast("bigint")
        .alias("n_resurrected"),
    )
    churned = F.coalesce(F.col("n_churned"), F.lit(0)).cast("bigint")
    return act.join(churn, "day", "left").select(
        "day",
        "n_new",
        "n_retained",
        "n_resurrected",
        churned.alias("n_churned"),
        F.when(
            churned > 0,
            F.round(
                (F.col("n_new") + F.col("n_resurrected")).cast("double")
                / churned,
                4,
            ),
        ).alias("quick_ratio"),
    )


@register(
    "q_event_survival",
    oracle="""
WITH ud AS (
  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
         event_type
  FROM events
), starts AS (
  SELECT user_id, MIN(day) AS first_day, MAX(day) AS last_day
  FROM ud GROUP BY user_id
), errs AS (
  SELECT user_id, MIN(day) AS first_err
  FROM ud WHERE event_type = 'error' GROUP BY user_id
), life AS (
  SELECT CAST(CASE WHEN e.first_err IS NULL
                   THEN s.last_day - s.first_day + 1
                   ELSE e.first_err - s.first_day + 1 END AS BIGINT) AS t,
         CASE WHEN e.first_err IS NULL THEN 0 ELSE 1 END AS died
  FROM starts s LEFT JOIN errs e USING (user_id)
), ledger AS (
  SELECT t, COUNT(*) AS n_ending, CAST(SUM(died) AS BIGINT) AS d
  FROM life GROUP BY t
), km AS (
  SELECT t, d,
         SUM(n_ending) OVER (ORDER BY t DESC
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS n_risk
  FROM ledger
), terms AS (
  SELECT t, d, CAST(n_risk AS BIGINT) AS n_risk,
         CAST(ROUND(CASE WHEN d = CAST(n_risk AS BIGINT) THEN 0
                         ELSE LN(1 - CAST(d AS DOUBLE) / n_risk) END, 8)
              AS DECIMAL(18,8)) AS lnterm,
         CASE WHEN d = CAST(n_risk AS BIGINT) THEN 1 ELSE 0 END AS absorbed
  FROM km
), curve AS (
  SELECT t, d, n_risk,
         CAST(SUM(lnterm) OVER (ORDER BY t
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND CURRENT ROW) AS DOUBLE)
           AS cum_ln,
         MAX(absorbed) OVER (ORDER BY t
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS hit_zero
  FROM terms
)
SELECT t, n_risk, d AS n_events,
       CASE WHEN hit_zero = 1 THEN 0.0
            ELSE ROUND(EXP(cum_ln), 4) END AS survival
FROM curve WHERE d > 0 ORDER BY t
""",
    doc="Kaplan-Meier time-to-event survival: per user, duration = "
    "days from first activity to the user's FIRST 'error' event "
    "(the observed failure); users who never error are "
    "right-censored at their last observed day — the standard "
    "censoring-aware alternative to naively averaging only the "
    "users who failed. S(t) = prod(1 - d_i/n_i) over event "
    "durations, computed as exp of the cumulative ROUND-8-DECIMAL "
    "log-sum so the running product is order-independent and "
    "engine-portable; rows only at event times, absorbing to "
    "exactly 0 if ever d = n.",
    scale_notes="Event-scale work is two pruned per-user span "
    "aggregates (first/last day, first error day) joined on "
    "user_id; the KM ledger itself is bounded by the observation "
    "window (<= span-days rows), so the ordered single-partition "
    "window over it is constant-size at any corpus scale.",
)
def q_event_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    ud = ev.select(
        "user_id",
        F.to_date(F.date_trunc("day", "ts")).alias("day"),
        "event_type",
    )
    starts = ud.groupBy("user_id").agg(
        F.min("day").alias("first_day"), F.max("day").alias("last_day")
    )
    errs = (
        ud.filter(F.col("event_type") == "error")
        .groupBy("user_id")
        .agg(F.min("day").alias("first_err"))
    )
    life = starts.join(errs, "user_id", "left").select(
        F.when(
            F.col("first_err").isNull(),
            F.datediff("last_day", "first_day") + 1,
        )
        .otherwise(F.datediff("first_err", "first_day") + 1)
        .cast("bigint")
        .alias("t"),
        F.when(F.col("first_err").isNull(), 0).otherwise(1).alias("died"),
    )
    ledger = life.groupBy("t").agg(
        F.count(F.lit(1)).alias("n_ending"),
        F.sum("died").cast("bigint").alias("d"),
    )
    w_desc = Window.orderBy(F.col("t").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    km = ledger.select(
        "t",
        "d",
        F.sum("n_ending").over(w_desc).cast("bigint").alias("n_risk"),
    )
    lnterm = F.round(
        F.when(F.col("d") == F.col("n_risk"), F.lit(0.0)).otherwise(
            F.log(F.lit(1) - F.col("d").cast("double") / F.col("n_risk"))
        ),
        8,
    ).cast("decimal(18,8)")
    absorbed = F.when(F.col("d") == F.col("n_risk"), 1).otherwise(0)
    terms = km.select(
        "t", "d", "n_risk", lnterm.alias("lnterm"), absorbed.alias("absorbed")
    )
    w_asc = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    curve = terms.select(
        "t",
        "d",
        "n_risk",
        F.sum("lnterm").over(w_asc).cast("double").alias("cum_ln"),
        F.max("absorbed").over(w_asc).alias("hit_zero"),
    )
    return (
        curve.filter(F.col("d") > 0)
        .select(
            "t",
            "n_risk",
            F.col("d").alias("n_events"),
            F.when(F.col("hit_zero") == 1, F.lit(0.0))
            .otherwise(F.round(F.exp("cum_ln"), 4))
            .alias("survival"),
        )
        .orderBy("t")
    )


@register(
    "q_time_backtest",
    oracle=f"""
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(SUM(CAST(value AS DECIMAL(18,2)) * 100) AS BIGINT) AS y
  FROM events GROUP BY event_type, day
), framed AS (
  SELECT event_type, day, y,
         ROW_NUMBER() OVER w AS rn,
         SUM(y) OVER (PARTITION BY event_type ORDER BY day
                      ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS s7,
         LAG(y, 1) OVER w AS y_prev
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day)
), evald AS (
  SELECT event_type, y,
         CAST(s7 AS DOUBLE) / 7 AS yhat_sma,
         CAST(y_prev AS DOUBLE) AS yhat_naive
  FROM framed WHERE rn > 7 AND y > 0
), errs AS (
  SELECT event_type,
         CAST(ROUND(ABS(y - yhat_sma), 8) AS DECIMAL(24,8)) AS ae_sma,
         CAST(ROUND(ABS(y - yhat_sma) / y, 8) AS DECIMAL(18,8)) AS ape_sma,
         CAST(ROUND(ABS(y - yhat_naive), 8) AS DECIMAL(24,8)) AS ae_naive
  FROM evald
)
, scored AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_eval_days,
         CAST(SUM(ae_sma) * 100000000 AS BIGINT) AS sa8,
         CAST(SUM(ape_sma) * 100000000 AS BIGINT) AS sp8,
         CAST(SUM(ae_naive) * 100000000 AS BIGINT) AS sn8
  FROM errs GROUP BY event_type
)
SELECT event_type, n_eval_days,
       {decimal_mean_round4_sql('sa8', '100 * n_eval_days', 8, '//')}
         AS mae_sma,
       {decimal_mean_round4_sql('sp8', 'n_eval_days', 8, '//')}
         AS mape_sma,
       {decimal_mean_round4_sql('sn8', '100 * n_eval_days', 8, '//')}
         AS mae_naive,
       {signed_ratio_round4_sql('sn8 - sa8', 'sn8', '//')} AS skill
FROM scored ORDER BY event_type
""",
    doc="Walk-forward forecast backtest: for each event type's "
    "daily-revenue series, forecast every day (after a 7-day "
    "warmup) with the trailing 7-day moving average, score MAE "
    "and MAPE against the realized value, and report skill = "
    "1 - MAE/MAE_naive vs the persistence (yesterday's value) "
    "baseline — the honest out-of-sample evaluation that the "
    "smoothers (q_time_ewma, q_time_holt) themselves don't give. "
    "Frames use only PAST rows (7 PRECEDING..1 PRECEDING, lag 1), "
    "so no leakage by construction; errors are ROUND-8 "
    "DECIMAL-summed.",
    scale_notes="One event-scale shuffle to the daily ledger, "
    "then two bounded trailing frames per series — identical "
    "physical shape to q_time_ewma. Per-series partitions keep "
    "the window parallel across metrics at 100 TB.",
)
def q_time_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.to_date(F.date_trunc("day", "ts")).alias("day"),
    ).agg(
        F.sum(F.col("value").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("y")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    framed = daily.select(
        "event_type",
        "y",
        F.row_number().over(w).alias("rn"),
        F.sum("y").over(w.rowsBetween(-7, -1)).alias("s7"),
        F.lag("y", 1).over(w).alias("y_prev"),
    )
    evald = framed.filter((F.col("rn") > 7) & (F.col("y") > 0)).select(
        "event_type",
        "y",
        (F.col("s7").cast("double") / 7).alias("yhat_sma"),
        F.col("y_prev").cast("double").alias("yhat_naive"),
    )
    ae_sma = F.round(F.abs(F.col("y") - F.col("yhat_sma")), 8).cast(
        "decimal(24,8)"
    )
    ape_sma = F.round(
        F.abs(F.col("y") - F.col("yhat_sma")) / F.col("y"), 8
    ).cast("decimal(18,8)")
    ae_naive = F.round(F.abs(F.col("y") - F.col("yhat_naive")), 8).cast(
        "decimal(24,8)"
    )
    return (
        evald.select(
            "event_type",
            ae_sma.alias("ae_sma"),
            ape_sma.alias("ape_sma"),
            ae_naive.alias("ae_naive"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_eval_days"),
            (F.sum("ae_sma") * F.lit(100000000))
            .cast("bigint")
            .alias("sa8"),
            (F.sum("ape_sma") * F.lit(100000000))
            .cast("bigint")
            .alias("sp8"),
            (F.sum("ae_naive") * F.lit(100000000))
            .cast("bigint")
            .alias("sn8"),
        )
        # exact integer half-up (rule-8 batch-2 sweep): the error
        # means are scale-8 decimal sums over counts, and the skill
        # score is a signed rational of the two sums (the wide helper
        # keeps ~1e15 operands overflow-safe in both engines)
        .select(
            "event_type",
            "n_eval_days",
            F.expr(
                decimal_mean_round4_sql("sa8", "100 * n_eval_days", 8, "div")
            ).alias("mae_sma"),
            F.expr(
                decimal_mean_round4_sql("sp8", "n_eval_days", 8, "div")
            ).alias("mape_sma"),
            F.expr(
                decimal_mean_round4_sql("sn8", "100 * n_eval_days", 8, "div")
            ).alias("mae_naive"),
            F.expr(
                signed_ratio_round4_sql("sn8 - sa8", "sn8", "div")
            ).alias("skill"),
        )
        .orderBy("event_type")
    )


@register(
    "q_event_markov2",
    oracle=f"""
WITH seq AS (
  SELECT user_id, event_type AS e1,
         lead(event_type, 1) OVER w AS e2,
         lead(event_type, 2) OVER w AS e3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), tri AS (
  SELECT e1, e2, e3, CAST(COUNT(*) AS BIGINT) AS n_abc
  FROM seq WHERE e3 IS NOT NULL GROUP BY e1, e2, e3
), ctx AS (
  SELECT e1, e2, CAST(SUM(n_abc) AS BIGINT) AS n_ab FROM tri
  GROUP BY e1, e2
)
SELECT tri.e1 || '>' || tri.e2 AS context, tri.e3 AS next_type,
       tri.n_abc, ctx.n_ab,
       {ratio_round4_sql('tri.n_abc', 'ctx.n_ab', '//')} AS p_next
FROM tri JOIN ctx USING (e1, e2)
ORDER BY tri.n_abc DESC, context ASC, next_type ASC
LIMIT 25
""",
    doc="Second-order Markov model of the event stream: "
    "P(next | previous two), estimated as exact count ratios over "
    "the per-user time-ordered trigram ledger (ties broken by "
    "event_id, the q_event_trigrams sequencing contract). The "
    "denominator is the sum of the trigram counts themselves — "
    "contexts whose successor fell off the stream end never "
    "dilute the distribution. Top-25 transitions, fully "
    "tie-broken.",
    scale_notes="Identical physical shape to q_event_trigrams "
    "(one user_id shuffle feeding two lead() frames) plus one "
    "ledger-sized re-aggregation for the context denominators — "
    "the (types^2 x types) ledger is bounded by the vocabulary, "
    "never the corpus.",
)
def q_event_markov2(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).filter(F.col("e3").isNotNull())
    tri = seq.groupBy("e1", "e2", "e3").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_abc")
    )
    ctx = tri.groupBy("e1", "e2").agg(
        F.sum("n_abc").cast("bigint").alias("n_ab")
    )
    return (
        tri.join(ctx, ["e1", "e2"])
        .select(
            F.concat_ws(">", "e1", "e2").alias("context"),
            F.col("e3").alias("next_type"),
            "n_abc",
            "n_ab",
            # exact integer half-up (rule-8 batch-2 sweep)
            F.expr(ratio_round4_sql("n_abc", "n_ab", "div")).alias(
                "p_next"
            ),
        )
        .orderBy(
            F.col("n_abc").desc(),
            F.col("context").asc(),
            F.col("next_type").asc(),
        )
        .limit(25)
    )


@register(
    "q_event_decay_score",
    oracle=f"""
WITH anchor AS (
  SELECT MAX(CAST(date_trunc('day', ts) AS DATE)) AS maxday FROM events
), scored AS (
  SELECT user_id,
         CAST(ROUND(
           CAST(ROUND(value * 100) AS BIGINT)
           * POW(2, -(anchor.maxday - CAST(date_trunc('day', ts) AS DATE))
                     / 7.0), 6) AS DECIMAL(24,6)) AS w
  FROM events CROSS JOIN anchor
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       {decimal_mean_round4_sql('CAST(SUM(w) * 1000000 AS BIGINT)',
                               '100', 6, '//')} AS decay_score
FROM scored GROUP BY user_id
ORDER BY decay_score DESC, user_id ASC LIMIT 20
""",
    doc="Time-decayed engagement score (7-day half-life): each "
    "event contributes value x 2^(-age_days/7) anchored at the "
    "corpus max day — the standard recency-weighted feature a "
    "feature store materializes per user (q_event_rfm's recency "
    "axis made continuous). Per-event weights ROUND-6 "
    "DECIMAL-summed so the reduction is order-independent; "
    "top-20 users, id tie-break.",
    scale_notes="Zero-shuffle per-event weighting (the decay is "
    "codegen'd pow on integer day deltas) + one user_id "
    "map-combined aggregation; the 1-row anchor is the "
    "q_filter_ts_cursor crossJoin pattern. Incremental refresh "
    "multiplies yesterday's scores by a constant decay and adds "
    "the new day — the sketch-like mergeability that makes this "
    "the scalable engagement feature.",
)
def q_event_decay_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    anchor = ev.agg(
        F.max(F.to_date(F.date_trunc("day", "ts"))).alias("maxday")
    )
    age = F.datediff(
        F.col("maxday"), F.to_date(F.date_trunc("day", "ts"))
    )
    w = F.round(
        F.round(F.col("value") * 100).cast("bigint")
        * F.pow(F.lit(2.0), -age / F.lit(7.0)),
        6,
    ).cast("decimal(24,6)")
    return (
        ev.crossJoin(F.broadcast(anchor))
        .select("user_id", w.alias("w"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            (F.sum("w") * F.lit(1000000)).cast("bigint").alias("w6"),
        )
        # exact integer half-up (rule-8 batch-2 sweep): the decayed
        # sum is a scale-6 decimal; decay_score = w6 / (1e6 * 100)
        .withColumn(
            "decay_score",
            F.expr(decimal_mean_round4_sql("w6", "100", 6, "div")),
        )
        .drop("w6")
        .orderBy(F.col("decay_score").desc(), F.col("user_id").asc())
        .limit(20)
    )


@register(
    "q_time_mad",
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS y
  FROM events GROUP BY event_type, day
), med AS (
  SELECT event_type, CAST(quantile_cont(y, 0.5) AS DOUBLE) AS m
  FROM daily GROUP BY event_type
), mad AS (
  SELECT d.event_type,
         CAST(quantile_cont(ABS(d.y - med.m), 0.5) AS DOUBLE) AS mad
  FROM daily d JOIN med USING (event_type)
  GROUP BY d.event_type, med.m
)
SELECT d.event_type,
       CAST(COUNT(*) AS BIGINT) AS n_days,
       ROUND(med.m / 100, 4) AS median_dollars,
       ROUND(mad.mad / 100, 4) AS mad_dollars,
       CAST(SUM(CASE WHEN ABS(0.6745 * (d.y - med.m) / mad.mad) > 3.5
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM daily d JOIN med USING (event_type) JOIN mad USING (event_type)
GROUP BY d.event_type, med.m, mad.mad ORDER BY d.event_type
""",
    doc="Median-absolute-deviation outlier screen (Iglewicz-Hoban "
    "modified z, |0.6745 (x - median)/MAD| > 3.5) over each type's "
    "daily revenue — the breakdown-resistant twin of "
    "q_time_anomaly's rolling mean/std z-score: one wild day "
    "cannot inflate the scale estimate that judges it.",
    scale_notes="Daily ledger shuffle + two ledger-sized exact "
    "medians per type and a ledger flag pass. At 100 TB the "
    "medians come from the q_agg_hist_quantile mergeable-histogram "
    "path; everything downstream is unchanged.",
)
def q_time_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.to_date(F.date_trunc("day", "ts")).alias("day"),
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("bigint"))
        .cast("bigint")
        .alias("y")
    )
    med = daily.groupBy("event_type").agg(
        F.expr("percentile(y, 0.5)").alias("m")
    )
    mad = (
        daily.join(med, "event_type")
        .groupBy("event_type", "m")
        .agg(F.expr("percentile(abs(y - m), 0.5)").alias("mad"))
        .select("event_type", "mad")
    )
    z = F.abs(0.6745 * (F.col("y") - F.col("m")) / F.col("mad"))
    return (
        daily.join(med, "event_type")
        .join(mad, "event_type")
        .groupBy("event_type", "m", "mad")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.sum(F.when(z > 3.5, 1).otherwise(0))
            .cast("bigint")
            .alias("n_outliers"),
        )
        .select(
            "event_type",
            "n_days",
            F.round(F.col("m") / 100, 4).alias("median_dollars"),
            F.round(F.col("mad") / 100, 4).alias("mad_dollars"),
            "n_outliers",
        )
        .orderBy("event_type")
    )


#: Sequence pattern for q_event_pattern over per-user event-type
#: initials (c=click, e=error, p=purchase, s=signup, v=view): one or
#: more views, any clicks, then a purchase — the browse-to-buy motif.
_SEQ_PATTERN = "v+c*p"


@register(
    "q_event_pattern",
    oracle=f"""
WITH seq AS (
  SELECT user_id,
         string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id)
           AS s
  FROM events GROUP BY user_id
)
SELECT user_id,
       CAST(length(s) AS BIGINT) AS seq_len,
       CAST(length(regexp_replace(s, '{_SEQ_PATTERN}', '', 'g'))
            AS BIGINT) AS residual_len,
       CAST(len(regexp_extract_all(s, '{_SEQ_PATTERN}')) AS BIGINT)
         AS n_matches
FROM seq
WHERE len(regexp_extract_all(s, '{_SEQ_PATTERN}')) > 0
ORDER BY n_matches DESC, user_id ASC
LIMIT 20
""",
    doc="Sequence-pattern matching (MATCH_RECOGNIZE-lite): each "
    "user's event history collapses to an ordered initial string "
    f"(ts, event_id order) and the regex {_SEQ_PATTERN!r} — one or "
    "more views, optional clicks, then a purchase — is counted "
    "non-overlapping, greedy, left-to-right (identical semantics "
    "in Java regex and RE2). Emits matched-count, sequence length "
    "and the post-excision residual length; top-20 pattern-heavy "
    "users.",
    scale_notes="One user_id shuffle builds the ordered sequence "
    "string (array_sort over collect_list of (ts, id, initial) "
    "structs — per-user state bounded by that user's history, the "
    "q_win_sessionize partition contract); the regex pass is "
    "zero-shuffle codegen. Top-20 is TakeOrderedAndProject. At "
    "100 TB, per-user histories cap via the q_llm_domain_cap "
    "rank-filter before the collect.",
)
def q_event_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    seq = (
        ev.select(
            "user_id",
            F.struct(
                F.col("ts"),
                F.col("event_id"),
                F.substring("event_type", 1, 1).alias("i"),
            ).alias("e"),
        )
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("e")), lambda x: x["i"]
                ),
                "",
            ).alias("s")
        )
    )
    n_matches = F.regexp_count(F.col("s"), F.lit(_SEQ_PATTERN))
    return (
        seq.select(
            "user_id",
            F.length("s").cast("bigint").alias("seq_len"),
            F.length(F.regexp_replace("s", _SEQ_PATTERN, ""))
            .cast("bigint")
            .alias("residual_len"),
            n_matches.cast("bigint").alias("n_matches"),
        )
        .filter(F.col("n_matches") > 0)
        .orderBy(F.col("n_matches").desc(), F.col("user_id").asc())
        .limit(20)
    )


@register(
    "q_event_time_to_convert",
    oracle=f"""
WITH v AS (
  SELECT user_id, MIN(ts) AS t_view
  FROM events WHERE event_type = 'view' GROUP BY user_id
), p AS (
  SELECT e.user_id,
         CAST(date_diff('second', v.t_view, MIN(e.ts)) AS BIGINT)
           AS lat_sec
  FROM events e JOIN v USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > v.t_view
  GROUP BY e.user_id, v.t_view
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM v) AS n_viewers,
       CAST(COUNT(*) AS BIGINT) AS n_converters,
       {ratio_round4_sql('100 * COUNT(*)',
                  '(SELECT COUNT(*) FROM v)', '//')} AS conv_pct,
       ROUND(quantile_cont(lat_sec, 0.5) / 3600, 4) AS med_hours,
       ROUND(quantile_cont(lat_sec, 0.9) / 3600, 4) AS p90_hours,
       {ratio_round4_sql('CAST(SUM(lat_sec) AS BIGINT)',
                  '3600 * COUNT(*)', '//')} AS avg_hours
FROM p
""",
    doc="Time-to-convert distribution: per user, the latency from "
    "FIRST view to the first subsequent purchase (strict >, the "
    "q_funnel ordering contract), summarized as conversion rate "
    "plus median/p90/mean hours — the product-analytics latency "
    "readout that q_funnel's stage counts omit. Latencies are "
    "exact integer seconds; the percentiles are exact "
    "(quantile_cont on BIGINTs) and only the final /3600 is "
    "float.",
    scale_notes="Two user_id-keyed min-aggregates sharing one "
    "shuffle (AQE reuses the exchange), then a 1-row reduction; "
    "the exact percentiles become the q_agg_hist_quantile "
    "mergeable-histogram path at 100 TB. No per-user state beyond "
    "two timestamps.",
)
def q_event_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id", "t_view")
        .agg(F.min("ts").alias("t_purchase"))
        .select(
            (
                F.unix_timestamp("t_purchase") - F.unix_timestamp("t_view")
            )
            .cast("bigint")
            .alias("lat_sec")
        )
    )
    nv = v.agg(F.count(F.lit(1)).cast("bigint").alias("n_viewers"))
    return (
        p.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_converters"),
            F.expr("percentile(lat_sec, 0.5)").alias("med_raw"),
            F.expr("percentile(lat_sec, 0.9)").alias("p90_raw"),
            F.sum("lat_sec").cast("bigint").alias("sum_sec"),
        )
        .crossJoin(F.broadcast(nv))
        .select(
            "n_viewers",
            "n_converters",
            # exact integer half-up (rule-8 batch-2 sweep): conv_pct and
            # avg_hours are pure rationals of bigint counts
            F.expr(
                ratio_round4_sql("100 * n_converters", "n_viewers", "div")
            ).alias("conv_pct"),
            F.round(F.col("med_raw") / 3600, 4).alias("med_hours"),
            F.round(F.col("p90_raw") / 3600, 4).alias("p90_hours"),
            F.expr(
                ratio_round4_sql("sum_sec", "3600 * n_converters", "div")
            ).alias("avg_hours"),
        )
    )


#: Train/test split instant for the next-event backtest (the corpus
#: spans January 2024; the last third is held out).
_NEXTPRED_SPLIT = "2024-01-20"


@register(
    "q_event_next_pred",
    oracle=f"""
WITH seq AS (
  SELECT user_id, ts, event_id, event_type,
         LEAD(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS next_type,
         LEAD(ts) OVER (PARTITION BY user_id
                        ORDER BY ts, event_id) AS next_ts
  FROM events
), trans AS (
  SELECT event_type AS prev, next_type, next_ts
  FROM seq WHERE next_type IS NOT NULL
), model AS (
  SELECT prev, next_type AS predicted
  FROM (
    SELECT prev, next_type, COUNT(*) AS c,
           ROW_NUMBER() OVER (PARTITION BY prev
                              ORDER BY COUNT(*) DESC, next_type ASC)
             AS rn
    FROM trans WHERE next_ts < TIMESTAMP '{_NEXTPRED_SPLIT}'
    GROUP BY prev, next_type
  ) WHERE rn = 1
), test AS (
  SELECT prev, next_type FROM trans
  WHERE next_ts >= TIMESTAMP '{_NEXTPRED_SPLIT}'
)
, scored AS (
  SELECT test.prev,
         ANY_VALUE(model.predicted) AS predicted,
         CAST(COUNT(*) AS BIGINT) AS n_test,
         CAST(SUM(CASE WHEN test.next_type = model.predicted
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_correct
  FROM test JOIN model USING (prev)
  GROUP BY test.prev
)
SELECT prev, predicted, n_test, n_correct,
       {ratio_round4_sql('n_correct', 'n_test', '//')} AS accuracy
FROM scored
ORDER BY prev
""",
    doc="Next-event prediction backtest: a first-order Markov "
    "argmax model (most frequent successor per event type, "
    "lexicographic tie-break) is fit on transitions completing "
    f"before {_NEXTPRED_SPLIT} and scored top-1 on the held-out "
    "tail — the in-engine eval loop for q_event_transitions' "
    "transition matrix, split by time so training never sees the "
    "future (the q_time_backtest discipline applied to "
    "sequences).",
    scale_notes="One user_id window pass builds transitions; the "
    "model is a k^2 ledger reduced to k argmax rows and joins "
    "back broadcast-size. Refit = re-aggregate the ledger; the "
    "eval join never reshuffles events.",
)
def q_event_next_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        ev.select(
            F.col("event_type").alias("prev"),
            F.lead("event_type").over(w).alias("next_type"),
            F.lead("ts").over(w).alias("next_ts"),
        )
        .filter(F.col("next_type").isNotNull())
    )
    split = F.lit(_NEXTPRED_SPLIT).cast("timestamp")
    counts = (
        trans.filter(F.col("next_ts") < split)
        .groupBy("prev", "next_type")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    wm = Window.partitionBy("prev").orderBy(
        F.col("c").desc(), F.col("next_type").asc()
    )
    model = (
        counts.withColumn("rn", F.row_number().over(wm))
        .filter(F.col("rn") == 1)
        .select("prev", F.col("next_type").alias("predicted"))
    )
    test = trans.filter(F.col("next_ts") >= split).select(
        "prev", "next_type"
    )
    hit = F.when(
        F.col("next_type") == F.col("predicted"), 1
    ).otherwise(0)
    return (
        test.join(model, "prev")
        .groupBy("prev")
        .agg(
            F.any_value(F.col("predicted")).alias("predicted"),
            F.count(F.lit(1)).cast("bigint").alias("n_test"),
            F.sum(hit).cast("bigint").alias("n_correct"),
        )
        # exact integer half-up (rule-8 remedy): hit-rates like 57/800
        # land exactly on the 4th-decimal half boundary, where the two
        # engines' float ROUNDs break the tie in opposite directions
        .withColumn(
            "accuracy",
            F.expr(ratio_round4_sql("n_correct", "n_test", "div")),
        )
        .orderBy("prev")
    )


@register(
    "q_time_changepoint",
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS y
  FROM events GROUP BY event_type, day
), idx AS (
  SELECT event_type, day, y,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS k,
         CAST(SUM(y) OVER (PARTITION BY event_type ORDER BY day)
              AS BIGINT) AS s,
         CAST(SUM(y * y) OVER (PARTITION BY event_type ORDER BY day)
              AS BIGINT) AS ss,
         CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
         CAST(SUM(y) OVER (PARTITION BY event_type) AS BIGINT) AS st,
         CAST(SUM(y * y) OVER (PARTITION BY event_type) AS BIGINT) AS sst
  FROM daily
), cand AS (
  SELECT event_type, day, k, n,
         (ss - CAST(s AS DOUBLE) * s / k)
           + ((sst - ss)
              - CAST(st - s AS DOUBLE) * (st - s) / (n - k)) AS sse,
         sst - CAST(st AS DOUBLE) * st / n AS sse0,
         -- exact integer half-up: round(100*s/k) = (200s + k) // (2k);
         -- double ROUND would disagree across engines on .93875-style
         -- dyadic boundaries (k = 8, 16 divides cents exactly)
         (200 * s + k) // (2 * k) AS mean_left_x4,
         (200 * (st - s) + (n - k)) // (2 * (n - k)) AS mean_right_x4
  FROM idx WHERE k >= 7 AND k <= n - 7
)
SELECT event_type, day AS split_day, CAST(k AS BIGINT) AS k,
       CAST(n AS BIGINT) AS n_days,
       CAST(mean_left_x4 AS DOUBLE) / 10000 AS mean_left,
       CAST(mean_right_x4 AS DOUBLE) / 10000 AS mean_right,
       ROUND(1 - sse / sse0, 4) AS var_explained
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                                   ORDER BY sse ASC, day ASC) AS rn
      FROM cand) t
WHERE rn = 1 ORDER BY event_type
""",
    doc="Single changepoint localization per event type (binary "
    "segmentation, the first split of CBS/PELT): over each type's "
    "daily-revenue series, the split k minimizing total two-segment "
    "SSE, found in closed form from exact integer prefix sums "
    "(sum and sum-of-squares of cents) — SSE(k) = (ss_k - s_k^2/k) + "
    "((SS - ss_k) - (S - s_k)^2/(n - k)), min segment 7 days, "
    "earliest-day tie-break. Reports the segment means and the "
    "variance explained by the split — the localization complement "
    "of q_time_cusum's drift ALARM (cusum says 'something moved'; "
    "this says where).",
    scale_notes="One event_type shuffle to the daily ledger; prefix "
    "sums and the argmin are windows over the ledger (days-bounded "
    "rows, never events). Recursing to multiple changepoints re-runs "
    "the same ledger pass per segment — O(rounds) ledger scans, no "
    "O(n^2). Integer prefix sums stay exact below 2^53 cents^2-days; "
    "beyond that the sufficient statistics move to DECIMAL(38,0) "
    "like q_agg_levene's.",
)
def q_time_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.to_date(F.date_trunc("day", "ts")).alias("day"),
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("bigint"))
        .cast("bigint")
        .alias("y")
    )
    wo = Window.partitionBy("event_type").orderBy("day")
    wa = Window.partitionBy("event_type")
    idx = daily.select(
        "event_type",
        "day",
        F.row_number().over(wo).alias("k"),
        F.sum("y").over(wo).cast("bigint").alias("s"),
        F.sum(F.col("y") * F.col("y")).over(wo).cast("bigint").alias("ss"),
        F.count(F.lit(1)).over(wa).cast("bigint").alias("n"),
        F.sum("y").over(wa).cast("bigint").alias("st"),
        F.sum(F.col("y") * F.col("y"))
        .over(wa)
        .cast("bigint")
        .alias("sst"),
    )
    sse = (
        F.col("ss") - F.col("s").cast("double") * F.col("s") / F.col("k")
    ) + (
        (F.col("sst") - F.col("ss"))
        - (F.col("st") - F.col("s")).cast("double")
        * (F.col("st") - F.col("s"))
        / (F.col("n") - F.col("k"))
    )
    cand = idx.filter(
        (F.col("k") >= 7) & (F.col("k") <= F.col("n") - 7)
    ).select(
        "event_type",
        "day",
        "k",
        "n",
        sse.alias("sse"),
        (
            F.col("sst") - F.col("st").cast("double") * F.col("st") / F.col("n")
        ).alias("sse0"),
        # exact integer half-up rounding (see oracle comment)
        F.expr("(200 * s + k) div (2 * k)").alias("mean_left_x4"),
        F.expr(
            "(200 * (st - s) + (n - k)) div (2 * (n - k))"
        ).alias("mean_right_x4"),
    )
    wr = Window.partitionBy("event_type").orderBy(
        F.col("sse").asc(), F.col("day").asc()
    )
    return (
        cand.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("day").alias("split_day"),
            "k",
            F.col("n").alias("n_days"),
            (F.col("mean_left_x4").cast("double") / 10000).alias(
                "mean_left"
            ),
            (F.col("mean_right_x4").cast("double") / 10000).alias(
                "mean_right"
            ),
            F.round(1 - F.col("sse") / F.col("sse0"), 4).alias(
                "var_explained"
            ),
        )
        .orderBy("event_type")
    )
