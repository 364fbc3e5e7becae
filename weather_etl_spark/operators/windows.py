"""Window-function operators (SURVEY.md §2 B.5).

The reference's cursor semantics ("compare each row to the previous
state", A6/A8) generalize to the full window surface: ranking, lag/lead,
running and moving frames, time-range frames, ntile, first/last.

Every ORDER BY carries a unique tie-break (event_id / orderkey) so
results are deterministic across engines (§7.4 rule 4).

Scale notes (100 TB): a window = one shuffle on partitionBy keys + a
per-partition sort. All partitions here are natural entity keys
(user_id, custkey, brand) — high cardinality, no single giant
partition; skewed entities would be handled by pre-splitting sessions
(salt on date) before the window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from weather_etl_spark.functions.exact import dec2
from weather_etl_spark.io import read_table
from weather_etl_spark.registry import register


@register(
    "q_win_rownum",
    oracle="""
SELECT c_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS order_date
FROM (
  SELECT c_custkey, o_orderkey, o_orderdate,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
  FROM orders JOIN customer ON o_custkey = c_custkey
) t WHERE rn = 1
""",
    doc="row_number per partition: latest order per customer.",
)
def q_win_rownum(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "c_custkey",
            "o_orderkey",
            F.to_date("o_orderdate").alias("order_date"),
        )
    )


@register(
    "q_win_rank",
    oracle="""
SELECT p_brand, p_partkey,
       RANK()       OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS rnk,
       DENSE_RANK() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS drnk
FROM part
""",
    doc="rank + dense_rank with ties (identical retailprice within brand).",
)
def q_win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("p_brand").orderBy(F.col("p_retailprice").desc())
    return read_table(spark, sf_dir, "part").select(
        "p_brand",
        "p_partkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


@register(
    "q_win_lag",
    oracle="""
SELECT event_id,
       epoch_us(ts) - LAG(epoch_us(ts)) OVER
         (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us,
       LEAD(event_id) OVER
         (PARTITION BY user_id ORDER BY ts, event_id) AS next_event_id
FROM events
""",
    doc="lag/lead inter-event gap per user (cursor = previous-row "
    "semantics, reference A6).",
)
def q_win_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ts_us = F.unix_micros("ts")
    return ev.select(
        "event_id",
        (ts_us - F.lag(ts_us).over(w)).alias("gap_us"),
        F.lead("event_id").over(w).alias("next_event_id"),
    )


@register(
    "q_win_runsum",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER
         (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS run_total
FROM orders
""",
    doc="Running sum, unbounded preceding frame (exact decimal).",
)
def q_win_runsum(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return read_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.sum(dec2("o_totalprice")).over(w).cast("double").alias("run_total"),
    )


@register(
    "q_win_moving",
    oracle="""
SELECT event_id,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE)
             / COUNT(*) OVER w, 4) AS mov_avg7
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
""",
    doc="Moving average over a 7-row frame (exact decimal sum / count — "
    "sliding-window FP accumulation differs across engines otherwise).",
)
def q_win_moving(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, Window.currentRow)
    )
    mov = F.sum(F.col("value").cast("decimal(18,6)")).over(w).cast(
        "double"
    ) / F.count(F.lit(1)).over(w)
    return ev.select("event_id", F.round(mov, 4).alias("mov_avg7"))


@register(
    "q_win_rangeframe",
    oracle="""
SELECT event_id, epoch_s,
       COUNT(*) OVER (PARTITION BY user_id ORDER BY epoch_s
                      RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS n_1h
FROM (SELECT event_id, user_id, epoch_us(ts) // 1000000 AS epoch_s
      FROM events) t
""",
    doc="Time-range frame: events in the preceding hour per user "
    "(the reference's overlap re-fetch window, A14).",
)
def q_win_rangeframe(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.expr("unix_micros(ts) div 1000000").alias("epoch_s"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("epoch_s")
        .rangeBetween(-3600, Window.currentRow)
    )
    return ev.select(
        "event_id", "epoch_s", F.count(F.lit(1)).over(w).alias("n_1h")
    )


@register(
    "q_win_ntile",
    oracle="""
SELECT c_custkey,
       NTILE(4) OVER (ORDER BY c_acctbal, c_custkey) AS quartile
FROM customer
""",
    doc="ntile quartiles over a deterministic total order.",
    scale_notes="A global (unpartitioned) window is a single-partition "
    "sort — fine for bounded dims; at 100 TB use approx percentiles to "
    "bucket instead.",
)
def q_win_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.orderBy("c_acctbal", "c_custkey")
    return read_table(spark, sf_dir, "customer").select(
        "c_custkey", F.ntile(4).over(w).alias("quartile")
    )


@register(
    "q_win_firstlast",
    oracle="""
SELECT DISTINCT user_id, CAST(ts AS DATE) AS day,
       FIRST_VALUE(event_type) OVER w AS first_et,
       LAST_VALUE(event_type)  OVER w AS last_et
FROM events
WINDOW w AS (PARTITION BY user_id, CAST(ts AS DATE)
             ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""",
    doc="first/last value over a full frame per user-day.",
)
def q_win_firstlast(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events").withColumn(
        "day", F.to_date("ts")
    )
    w = (
        Window.partitionBy("user_id", "day")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        ev.select(
            "user_id",
            "day",
            F.first("event_type").over(w).alias("first_et"),
            F.last("event_type").over(w).alias("last_et"),
        )
        .distinct()
    )


@register(
    "q_topk_group",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders
) t WHERE rn <= 2
""",
    doc="Top-k per group (k=2) via ranked window, unique tie-break.",
    scale_notes="Window + filter(rn<=k) lets Spark's WindowGroupLimit "
    "push the limit into the sort — no full materialization per group.",
)
def q_topk_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        read_table(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


@register(
    "q_win_percent",
    oracle="""
SELECT o_orderkey, o_orderstatus,
       ROUND(percent_rank() OVER w, 4) AS pr,
       ROUND(cume_dist()    OVER w, 4) AS cd
FROM orders
WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice)
""",
    doc="Distribution window functions: percent_rank (rank-1)/(n-1) and "
    "cume_dist (rows <= current) per order within its status partition "
    "— both tie-stable, so the oracle is exact even on equal keys.",
)
def q_win_percent(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice")
    return read_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.round(F.percent_rank().over(w), 4).alias("pr"),
        F.round(F.cume_dist().over(w), 4).alias("cd"),
    )


@register(
    "q_win_cume_nth",
    oracle="""
SELECT c_custkey,
       ROUND(CUME_DIST() OVER w, 4)   AS cd,
       NTH_VALUE(c_name, 3) OVER w    AS third_name
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
""",
    doc="cume_dist + nth_value over the default running frame per "
    "market segment: the distribution-rank surface (percent_rank's "
    "sibling) and positional value access (null until the frame has "
    "reached row 3 — identical default-frame semantics both engines).",
)
def q_win_cume_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return read_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.round(F.cume_dist().over(w), 4).alias("cd"),
        F.nth_value("c_name", 3).over(w).alias("third_name"),
    )


@register(
    "q_win_sessionize",
    oracle="""
WITH o AS (
  SELECT user_id, epoch_us(ts) AS ts_us,
         LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS prev_us
  FROM events
), f AS (
  SELECT user_id, ts_us,
         CASE WHEN prev_us IS NULL
                   OR ts_us - prev_us > 30 * 60 * 1000000
              THEN 1 ELSE 0 END AS new_sess
  FROM o
), s AS (
  SELECT user_id, ts_us,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us) AS sess_no
  FROM f
)
SELECT user_id, CAST(sess_no AS BIGINT) AS sess_no,
       MIN(ts_us) AS sess_start_us,
       MAX(ts_us) - MIN(ts_us) AS duration_us,
       COUNT(*) AS n_events
FROM s GROUP BY user_id, sess_no
""",
    doc="Batch sessionization (gaps > 30 min start a new session): the "
    "lag-flag-cumsum idiom — per user, flag rows whose gap to the "
    "previous event exceeds the timeout, running-sum the flags into a "
    "session number, then aggregate per session. The batch twin of "
    "st_stateful_sessionizer's streaming state machine, and the "
    "canonical pre-processing step for behavioral training data.",
    scale_notes="Two windows + one aggregate, all partitioned by "
    "user_id: a single shuffle on the user key serves the lag, the "
    "running sum, and the session aggregate (same partitioning reused "
    "across stages). High-cardinality key, no driver-side state; a "
    "pathologically hot user would be split by salting on date first.",
)
def q_win_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "event_id",
    )
    w_lag = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = ev.withColumn(
        "new_sess",
        F.when(
            F.col("ts_us") - F.lag("ts_us").over(w_lag) > 30 * 60 * 1_000_000,
            1,
        )
        .when(F.lag("ts_us").over(w_lag).isNull(), 1)
        .otherwise(0),
    )
    sess = flagged.withColumn("sess_no", F.sum("new_sess").over(w_run))
    return sess.groupBy("user_id", "sess_no").agg(
        F.min("ts_us").alias("sess_start_us"),
        (F.max("ts_us") - F.min("ts_us")).alias("duration_us"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "q_win_islands",
    oracle="""
WITH h AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 3600000000 AS hr
  FROM events
), g AS (
  SELECT user_id, hr,
         hr - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY hr) AS grp
  FROM h
)
SELECT user_id,
       MIN(hr) * 3600000000 AS island_start_us,
       CAST(COUNT(*) AS BIGINT) AS n_hours
FROM g GROUP BY user_id, grp
""",
    doc="Gaps-and-islands: maximal runs of consecutive active hours per "
    "user, via the classic hour_index - row_number() constant-per-run "
    "trick — consecutive hours share the difference, so grouping by it "
    "yields one row per island. Coverage/continuity profiling for "
    "time-series training data.",
    scale_notes="Two shuffles by design: the distinct partial-aggregates "
    "map-side so its exchange carries at most (users x hours) deduped "
    "pairs — tiny at any scale — then the window re-keys on user_id "
    "and the final aggregate reuses that partitioning. Collapsing to "
    "one shuffle (repartition before distinct) would ship raw "
    "un-deduped events; worse at 100 TB.",
)
def q_win_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    hours = (
        read_table(spark, sf_dir, "events")
        .select(
            "user_id",
            (F.unix_micros("ts") / F.lit(3_600_000_000))
            .cast("bigint")
            .alias("hr"),
        )
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("hr")
    grp = hours.withColumn("grp", F.col("hr") - F.row_number().over(w))
    return grp.groupBy("user_id", "grp").agg(
        (F.min("hr") * F.lit(3_600_000_000)).alias("island_start_us"),
        F.count(F.lit(1)).cast("bigint").alias("n_hours"),
    ).drop("grp")


@register(
    "q_win_ignore_nulls",
    oracle="""
WITH v AS (
  SELECT event_id, user_id, ts,
         CASE WHEN value < 5 THEN NULL ELSE value END AS masked
  FROM events
)
SELECT event_id, masked,
       last_value(masked IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ffill,
       lead(masked IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY ts, event_id) AS next_val
FROM v
""",
    doc="IGNORE NULLS window family — the gap-bridging primitive "
    "sensor/telemetry pipelines use: low readings (value < 5) are "
    "masked to NULL, then forward-filled with the last non-null "
    "(last_value IGNORE NULLS) and paired with the next non-null "
    "(lead IGNORE NULLS) per user timeline. Values pass through "
    "unchanged (no float arithmetic), so parity is exact.",
    scale_notes="Same single-shuffle window shape as q_win_lag; "
    "IGNORE NULLS only changes the frame evaluator, not the "
    "partitioning. Unbounded-preceding last_value runs as a "
    "running accumulator, not a frame re-scan.",
)
def q_win_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.col("value") < 5, None)
        .otherwise(F.col("value"))
        .alias("masked"),
    )
    return ev.select(
        "event_id",
        "masked",
        F.expr(
            "last_value(masked) IGNORE NULLS OVER ("
            "PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
        ).alias("ffill"),
        F.expr(
            "lead(masked) IGNORE NULLS OVER ("
            "PARTITION BY user_id ORDER BY ts, event_id)"
        ).alias("next_val"),
    )


@register(
    "q_win_range_interval",
    oracle="""
SELECT event_id,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_1h,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sum_1h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
""",
    doc="Time-interval RANGE frame (the numeric-offset q_win_rangeframe "
    "completed with calendar semantics): per user, the trailing-1-hour "
    "event count and value sum at every event. The sum runs over "
    "DECIMAL so sliding-frame accumulation order (segment tree in "
    "DuckDB, running accumulator in Spark) cannot produce float "
    "drift.",
    scale_notes="One shuffle on user_id + per-partition time sort; the "
    "interval frame is a two-pointer pass over each sorted partition, "
    "O(rows) state. Time-skewed users pre-split by day before the "
    "window at 100 TB (same mitigation as q_win_moving).",
)
def q_win_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    frame = (
        "OVER (PARTITION BY user_id ORDER BY ts "
        "RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)"
    )
    return ev.select(
        "event_id",
        F.expr(f"CAST(count(*) {frame} AS BIGINT)").alias("n_1h"),
        F.expr(
            f"CAST(sum(CAST(value AS DECIMAL(18,6))) {frame} AS DOUBLE)"
        ).alias("sum_1h"),
    )


@register(
    "q_win_distinct_running",
    oracle="""
WITH flagged AS (
  SELECT event_id, user_id, ts,
         CASE WHEN ROW_NUMBER() OVER (
                PARTITION BY user_id, event_type
                ORDER BY ts, event_id) = 1
              THEN 1 ELSE 0 END AS first_seen
  FROM events
)
SELECT event_id, user_id, epoch_us(ts) AS ts_us,
       CAST(SUM(first_seen) OVER (
              PARTITION BY user_id ORDER BY ts, event_id
            ) AS BIGINT) AS run_distinct
FROM flagged
""",
    doc="Running COUNT(DISTINCT) over a window — the aggregate window "
    "frames cannot express directly (DISTINCT is not frameable): each "
    "row carries how many distinct event types its user has produced "
    "so far, via the standard first-occurrence-flag decomposition "
    "(rank within (user, type) marks the first sighting; a running "
    "sum of flags is the running distinct count). Exact integers, "
    "totally ordered by (ts, event_id).",
    scale_notes="Two window shuffles — (user_id, event_type) for the "
    "first-seen flags, then user_id for the running sum; the second "
    "is a strict coarsening of the first, and both carry fixed-width "
    "rows. The decomposition is how running-distinct ships at any "
    "scale; a sketch variant swaps the flag for HLL register deltas.",
)
def q_win_distinct_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    w_first = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ev.withColumn(
            "first_seen",
            F.when(F.row_number().over(w_first) == 1, 1).otherwise(0),
        )
        .select(
            "event_id",
            "user_id",
            F.unix_micros("ts").alias("ts_us"),
            F.sum("first_seen").over(w_run).cast("bigint").alias(
                "run_distinct"
            ),
        )
    )


@register(
    "q_win_peaks",
    oracle="""
WITH s AS (
  SELECT event_type, value,
         lag(value)  OVER w AS pv,
         lead(value) OVER w AS nv
  FROM events
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
)
SELECT event_type,
       COUNT(*) FILTER (WHERE value > pv AND value > nv) AS n_peaks,
       COUNT(*) FILTER (WHERE value < pv AND value < nv) AS n_valleys,
       ROUND(MAX(CASE WHEN value > pv AND value > nv THEN value END), 4)
         AS max_peak,
       ROUND(CAST(SUM(CASE WHEN value > pv AND value > nv
                           THEN CAST(value AS DECIMAL(18,6)) END)
                  AS DOUBLE)
             / COUNT(*) FILTER (WHERE value > pv AND value > nv), 4)
         AS avg_peak
FROM s
GROUP BY event_type
""",
    doc="Local-extrema detection: a row is a peak (valley) when its "
    "value is strictly greater (less) than both time-order neighbors "
    "within its event type — the turning-point census used for "
    "signal morphology / changepoint pre-screens. Strict "
    "comparisons make plateau edges non-extrema, so the result is "
    "independent of how equal values are ordered; the peak mean "
    "sums DECIMAL-exact before one final rounding.",
    scale_notes="One shuffle on event_type shared by the lag and "
    "lead frames (a single WindowExec evaluates both), then a "
    "type-sized aggregate ledger. Skewed types pre-bucket by time "
    "range with boundary rows replicated once per edge — peak "
    "predicates only ever look one row left and right.",
)
def q_win_peaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    s = ev.select(
        "event_type",
        "value",
        F.lag("value").over(w).alias("pv"),
        F.lead("value").over(w).alias("nv"),
    )
    is_peak = (F.col("value") > F.col("pv")) & (F.col("value") > F.col("nv"))
    is_valley = (F.col("value") < F.col("pv")) & (
        F.col("value") < F.col("nv")
    )
    peak_val = F.when(is_peak, F.col("value"))
    n_peaks = F.count(peak_val)
    return s.groupBy("event_type").agg(
        n_peaks.alias("n_peaks"),
        F.count(F.when(is_valley, F.lit(1))).alias("n_valleys"),
        F.round(F.max(peak_val), 4).alias("max_peak"),
        F.round(
            F.sum(F.when(is_peak, F.col("value").cast("decimal(18,6)")))
            .cast("double")
            / n_peaks,
            4,
        ).alias("avg_peak"),
    )


@register(
    "q_win_slope",
    oracle="""
WITH s AS (
  SELECT event_type, event_id, ts,
         CAST(ROUND(value * 100) AS BIGINT) AS y,
         CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                                 ORDER BY ts, event_id) AS BIGINT) AS x
  FROM events
), f AS (
  SELECT event_type, event_id, ts, x,
         COUNT(*) OVER fr AS n,
         SUM(x)     OVER fr AS sx,
         SUM(y)     OVER fr AS sy,
         SUM(x * y) OVER fr AS sxy,
         SUM(x * x) OVER fr AS sx2
  FROM s
  WINDOW fr AS (PARTITION BY event_type ORDER BY x
                ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
)
SELECT event_type, event_id, epoch_us(ts) AS ts_us,
       CASE WHEN n * sx2 - sx * sx = 0 THEN NULL
            ELSE CAST(CASE
              WHEN n * sxy - sx * sy >= 0
              THEN ((n * sxy - sx * sy) * 20000 + (n * sx2 - sx * sx))
                   // (2 * (n * sx2 - sx * sx))
              ELSE -(((sx * sy - n * sxy) * 20000 + (n * sx2 - sx * sx))
                     // (2 * (n * sx2 - sx * sx)))
            END AS DOUBLE) / 10000 END AS slope
FROM f
""",
    doc="Rolling regression slope (the trend detector a step past "
    "q_time_ewma): per event type in time order, the least-squares "
    "slope of value-cents against observation index over a trailing "
    "24-row frame — slope = (n Sxy - Sx Sy) / (n Sx2 - Sx^2). Both "
    "x (row index) and y (integer cents) are exact integers, every "
    "frame sum is an exact BIGINT window aggregate, and the final "
    "4-decimal rounding is integer half-away arithmetic — zero "
    "float operations anywhere, so no cross-engine rounding "
    "boundary exists. The first row of each series (degenerate "
    "frame, zero variance in x) is NULL.",
    scale_notes="One shuffle on event_type shared by the rank window "
    "and the four frame sums (same partitioning + ordering -> one "
    "WindowExec pair), O(1) state per row via running-sum frames. "
    "The integer cross-products fit BIGINT through sf10; beyond "
    "that the same formula widens to DECIMAL(38,0). Skewed types "
    "pre-bucket by time with 23-row boundary overlap.",
)
def q_win_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    w_rank = Window.partitionBy("event_type").orderBy("ts", "event_id")
    s = ev.select(
        "event_type",
        "event_id",
        "ts",
        F.round(F.col("value") * 100).cast("bigint").alias("y"),
        F.row_number().over(w_rank).cast("bigint").alias("x"),
    )
    fr = (
        Window.partitionBy("event_type")
        .orderBy("x")
        .rowsBetween(-23, Window.currentRow)
    )
    f = s.select(
        "event_type",
        "event_id",
        "ts",
        "x",
        F.count(F.lit(1)).over(fr).alias("n"),
        F.sum("x").over(fr).alias("sx"),
        F.sum("y").over(fr).alias("sy"),
        F.sum(F.col("x") * F.col("y")).over(fr).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(fr).alias("sx2"),
    )
    den = F.col("n") * F.col("sx2") - F.col("sx") * F.col("sx")
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    slope4 = F.when(
        num >= 0,
        F.expr(
            "((n * sxy - sx * sy) * 20000 + (n * sx2 - sx * sx))"
            " div (2 * (n * sx2 - sx * sx))"
        ),
    ).otherwise(
        -F.expr(
            "((sx * sy - n * sxy) * 20000 + (n * sx2 - sx * sx))"
            " div (2 * (n * sx2 - sx * sx))"
        )
    )
    return f.select(
        "event_type",
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        F.when(den == 0, F.lit(None).cast("double")).otherwise(
            slope4.cast("double") / 10000
        ).alias("slope"),
    )


@register(
    "q_win_rolling_median",
    oracle="""
WITH s AS (
  SELECT event_type, event_id, ts,
         CAST(ROUND(value * 100) AS BIGINT) AS y
  FROM events
)
SELECT event_type, event_id, epoch_us(ts) AS ts_us,
       CAST(median(y) OVER (PARTITION BY event_type
                            ORDER BY ts, event_id
                            ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
            AS DOUBLE) / 100 AS med
FROM s
""",
    doc="Rolling median (the robust companion to q_win_moving's "
    "mean): exact median of value over a trailing 24-row frame per "
    "event type. Medians run on integer CENTS: for even frames the "
    "midpoint mean (a+b)/2 of two ints is a dyadic rational, exact "
    "in both engines, and the final /100 is the same IEEE op — so "
    "the output needs NO rounding discipline at all.",
    scale_notes="One event_type shuffle, per-frame median is "
    "O(w log w) worst case over a 24-row window — constant per row. "
    "At 100 TB a wider frame swaps to the two-heap streaming median "
    "per partition (mapInPandas) or the fixed-bin histogram sketch "
    "(q_agg_hist_quantile) when approximate is acceptable.",
)
def q_win_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    s = ev.select(
        "event_type",
        "event_id",
        "ts",
        F.round(F.col("value") * 100).cast("bigint").alias("y"),
    )
    fr = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-23, Window.currentRow)
    )
    return s.select(
        "event_type",
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        (
            F.expr("percentile(y, 0.5)").over(fr).cast("double") / 100
        ).alias("med"),
    )


@register(
    "q_win_drawdown",
    oracle="""
WITH s AS (
  SELECT event_type, ts, event_id,
         SUM(CAST(ROUND(value * 100) AS BIGINT))
           OVER w AS cum
  FROM events
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING)
), d AS (
  SELECT event_type, cum,
         MAX(cum) OVER w AS run_peak
  FROM s
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING)
)
SELECT event_type,
       CAST(MAX(run_peak - cum) AS BIGINT) AS max_drawdown_cents,
       CAST(SUM(CASE WHEN cum = run_peak THEN 1 ELSE 0 END) AS BIGINT)
         AS n_at_peak,
       CAST(MAX(run_peak) AS BIGINT) AS final_peak_cents
FROM d GROUP BY event_type
""",
    doc="Maximum drawdown of each event type's cumulative value "
    "series (the standard risk/regression metric: largest drop "
    "from a running peak): cumulative sums and running peaks are "
    "exact integer cents over the (ts, event_id) order, so the "
    "drawdown, the count of at-peak rows, and the terminal peak "
    "are all exact BIGINTs — no float ever appears.",
    scale_notes="One event_type shuffle shared by the cumulative "
    "and running-max frames (same partitioning + order -> one "
    "WindowExec pair), then a type-sized ledger. The running "
    "structures are O(1) state per row; time-chunked deployments "
    "checkpoint (cum, peak) per key exactly like q_time_holt's "
    "(level, trend).",
)
def q_win_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cums = ev.select(
        "event_type",
        "ts",
        "event_id",
        F.sum(F.round(F.col("value") * 100).cast("bigint"))
        .over(w)
        .alias("cum"),
    )
    s = cums.select(
        "event_type",
        "cum",
        F.max("cum").over(w).alias("run_peak"),
    )
    return s.groupBy("event_type").agg(
        F.max(F.col("run_peak") - F.col("cum"))
        .cast("bigint")
        .alias("max_drawdown_cents"),
        F.sum(
            F.when(F.col("cum") == F.col("run_peak"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_at_peak"),
        F.max("run_peak").cast("bigint").alias("final_peak_cents"),
    )


@register(
    "q_win_rolling_corr",
    oracle="""
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(SUM(CASE WHEN event_type = 'view'
                       THEN CAST(value AS DECIMAL(18,2)) * 100
                       ELSE CAST(0 AS DECIMAL(18,2)) END) AS BIGINT) AS x,
         CAST(SUM(CASE WHEN event_type = 'purchase'
                       THEN CAST(value AS DECIMAL(18,2)) * 100
                       ELSE CAST(0 AS DECIMAL(18,2)) END) AS BIGINT) AS y
  FROM events GROUP BY day
), rolled AS (
  SELECT day,
         COUNT(*)              OVER w AS n,
         SUM(CAST(x AS HUGEINT))     OVER w AS sx,
         SUM(CAST(y AS HUGEINT))     OVER w AS sy,
         SUM(CAST(x AS HUGEINT) * x) OVER w AS sxx,
         SUM(CAST(y AS HUGEINT) * y) OVER w AS syy,
         SUM(CAST(x AS HUGEINT) * y) OVER w AS sxy
  FROM daily
  WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
)
SELECT day, CAST(n AS BIGINT) AS n_days,
       CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
            THEN ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                       / SQRT((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                              * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 4)
       END AS corr_7d
FROM rolled ORDER BY day
""",
    doc="Rolling 7-day Pearson correlation between the daily "
    "view-revenue and purchase-revenue series — the co-movement "
    "monitor layered on the q_time_* daily ledgers. Daily sums are "
    "exact integer cents, the five rolling moments are exact "
    "integer window sums over a 7-row frame, and only the final "
    "correlation drops to DOUBLE (identical IEEE both engines), "
    "NULL while a series is frame-constant (zero variance).",
    scale_notes="One event-scale shuffle to the daily ledger; the "
    "rolling frame is a bounded 7-row state over the day-ordered "
    "ledger (single partition here, per-series partitions in a "
    "multi-metric deployment). HUGEINT/DECIMAL moment sums stay "
    "exact past 2^63 at 100 TB daily volumes.",
)
def q_win_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    cents = F.col("value").cast("decimal(18,2)") * 100
    zero = F.lit(0).cast("decimal(18,2)")
    # HARD CONTRACT on the daily sums: |x|, |y| < 1.4e18 cents/day,
    # ENFORCED at runtime below (raise_error, r8 ADVICE) so an
    # out-of-domain deployment fails loudly instead of silently
    # NULLing corr_7d.
    # The exact-decimal variance guard below squares the 7-day window
    # sum sx (= up to 7 daily sums) as decimal(19,0)^2 -> decimal(38,0);
    # decimal(38,0) cannot hold sx^2 once sx >= 1e19, and the
    # decimal(19,0) cast of a larger sx would NULL the guard (nulling
    # corr_7d where the oracle's HUGEINT guard yields a value).  So the
    # operator's domain is daily cent volume < 1.4e18 (~$14 quadrillion
    # per metric per day); a deployment beyond that must rescale the
    # unit (cents -> dollars) or split the series, not widen the
    # decimals — 38 digits is the engine-wide (and HUGEINT-square)
    # ceiling.
    daily = ev.groupBy(
        F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).agg(
        F.sum(F.when(F.col("event_type") == "view", cents).otherwise(zero))
        .cast("bigint")
        .alias("x"),
        F.sum(
            F.when(F.col("event_type") == "purchase", cents).otherwise(zero)
        )
        .cast("bigint")
        .alias("y"),
    )
    # LOUD contract enforcement (r8 ADVICE): an out-of-domain daily sum
    # fails the query at execution instead of silently NULLing corr_7d
    # where the oracle yields a value.  Inlined into the data path (the
    # guarded column IS the consumed column) so column pruning cannot
    # drop it; stays inside whole-stage codegen, no extra shuffle.
    _bound = F.lit(1_400_000_000_000_000_000)  # 1.4e18 cents/day

    def _in_domain(c: str):
        return F.when(F.abs(F.col(c)) < _bound, F.col(c)).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        "q_win_rolling_corr domain contract violated: "
                        f"daily |{c}| >= 1.4e18 cents (rescale the unit "
                        "or split the series): "
                    ),
                    F.col(c).cast("string"),
                )
            )
        )

    daily = daily.select(
        "day", _in_domain("x").alias("x"), _in_domain("y").alias("y")
    )
    w = Window.orderBy("day").rowsBetween(-6, Window.currentRow)
    xd = F.col("x").cast("decimal(28,0)")
    yd = F.col("y").cast("decimal(28,0)")
    rolled = daily.select(
        "day",
        F.count(F.lit(1)).over(w).cast("bigint").alias("n"),
        F.sum(xd).over(w).alias("sx"),
        F.sum(yd).over(w).alias("sy"),
        F.sum(xd * F.col("x")).over(w).alias("sxx"),
        F.sum(yd * F.col("y")).over(w).alias("syy"),
        F.sum(xd * F.col("y")).over(w).alias("sxy"),
    )
    # Zero-variance GUARD in exact decimal arithmetic, mirroring the
    # oracle's exact HUGEINT (n*sxx - sx*sx) > 0: evaluating the guard
    # in double can round a near-zero variance differently once the
    # 7-day cent-sum moments exceed 2^53, yielding NULL in one engine
    # and a value in the other.  Operand precisions are sized so every
    # product stays inside decimal(38,0) with no scale loss
    # (n <= 7 -> decimal(10,0); sx,sy < 10^19 -> decimal(19,0);
    # products cap at 38 digits, scale 0).
    n38 = F.col("n").cast("decimal(10,0)")
    sx19 = F.col("sx").cast("decimal(19,0)")
    sy19 = F.col("sy").cast("decimal(19,0)")
    varx_exact = n38 * F.col("sxx") - sx19 * sx19
    vary_exact = n38 * F.col("syy") - sy19 * sy19
    # the correlation VALUE itself drops to double, identical IEEE
    # arithmetic to the oracle's CAST(... AS DOUBLE) expression
    nd = F.col("n").cast("double")
    varx = nd * F.col("sxx").cast("double") - F.col("sx").cast(
        "double"
    ) * F.col("sx").cast("double")
    vary = nd * F.col("syy").cast("double") - F.col("sy").cast(
        "double"
    ) * F.col("sy").cast("double")
    cov = nd * F.col("sxy").cast("double") - F.col("sx").cast(
        "double"
    ) * F.col("sy").cast("double")
    return rolled.select(
        "day",
        F.col("n").alias("n_days"),
        F.when(
            (varx_exact > 0) & (vary_exact > 0),
            F.round(cov / F.sqrt(varx * vary), 4),
        ).alias("corr_7d"),
    ).orderBy("day")
