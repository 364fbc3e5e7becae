"""Behavioral / product analytics operators (SURVEY.md §2 B.12,
round 6 late batch): conversion funnel, cohort retention, and
deterministic weighted sampling.

The reference's event pipeline (lambda_function.py:96-150 fetch ->
frame -> filter) stops at per-row transforms; these are the standard
next-step analyses every event warehouse runs on the same table, each
re-expressed as exact-oracled DataFrame plans:

- q_funnel: staged conversion (view -> click -> purchase) as three
  cascaded conditional min-aggregates, never a per-user collect;
- q_cohort_retention: the classic cohort x week-offset retention
  matrix from two shuffles (first-event cohort + distinct activity);
- q_sample_weighted: weight-proportional Bernoulli sampling with an
  md5-derived uniform, all-integer so both engines agree bit-for-bit
  (the float-free cousin of A-ES weighted reservoir sampling).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from weather_etl_spark.io import read_table
from weather_etl_spark.registry import register


@register(
    "q_funnel",
    oracle="""
WITH v AS (
  SELECT user_id, MIN(ts) AS t_view
  FROM events WHERE event_type = 'view' GROUP BY user_id
), c AS (
  SELECT e.user_id, MIN(e.ts) AS t_click
  FROM events e JOIN v USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > v.t_view
  GROUP BY e.user_id
), p AS (
  SELECT e.user_id, MIN(e.ts) AS t_purchase
  FROM events e JOIN c USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > c.t_click
  GROUP BY e.user_id
)
SELECT v.user_id AS user_id,
       1 + CAST(c.t_click IS NOT NULL AS INT)
         + CAST(p.t_purchase IS NOT NULL AS INT) AS stage,
       epoch_us(v.t_view) AS t_view_us,
       epoch_us(c.t_click) AS t_click_us,
       epoch_us(p.t_purchase) AS t_purchase_us
FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
""",
    doc="Conversion funnel view -> click -> purchase: per user, the "
    "earliest view, the earliest click strictly after that view, and "
    "the earliest purchase strictly after that click — the stage "
    "number (1-3) is how far the user converted. Expressed as three "
    "cascaded filter+min aggregates (the set-based funnel formulation) "
    "rather than per-user event-list scans, so no collect_list ordering "
    "is ever relied on.",
    scale_notes="Three user_id-keyed shuffles over event-type-pruned "
    "inputs (each stage filters its event type BEFORE shuffling, so "
    "shuffle volume is one row per user per stage, not the event "
    "stream). At 100 TB the event-type filter pushes into the scan "
    "and AQE picks broadcast for the shrinking stage tables; funnel "
    "depth adds stages linearly, never quadratically.",
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            (
                F.lit(1)
                + F.col("t_click").isNotNull().cast("int")
                + F.col("t_purchase").isNotNull().cast("int")
            ).alias("stage"),
            F.unix_micros("t_view").alias("t_view_us"),
            F.unix_micros("t_click").alias("t_click_us"),
            F.unix_micros("t_purchase").alias("t_purchase_us"),
        )
    )


@register(
    "q_cohort_retention",
    oracle="""
WITH first AS (
  SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_wk
  FROM events GROUP BY user_id
), act AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events
)
SELECT CAST(cohort_wk AS DATE) AS cohort_week,
       CAST(date_diff('day', cohort_wk, wk) // 7 AS INT) AS week_offset,
       COUNT(*) AS n_users
FROM first JOIN act USING (user_id)
GROUP BY 1, 2
""",
    doc="Cohort retention matrix: users grouped by the ISO week of "
    "their first event (the cohort), each cell counting how many of "
    "that cohort were active N weeks later. Two aggregates — "
    "first-event per user and distinct (user, active-week) — joined "
    "on user_id; COUNT(*) is already distinct users because activity "
    "is deduplicated per (user, week) first.",
    scale_notes="Both inputs shuffle once on user_id (the join key), "
    "then one small shuffle on (cohort, offset) whose cardinality is "
    "weeks^2 — trivially bounded however large the corpus. The "
    "distinct-activity table is the only event-volume shuffle and "
    "carries (user, week) pairs, never event payloads.",
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_wk")
    )
    act = ev.select(
        "user_id", F.date_trunc("week", "ts").alias("wk")
    ).distinct()
    return (
        first.join(act, "user_id")
        .groupBy(
            F.col("cohort_wk").cast("date").alias("cohort_week"),
            F.expr(
                "CAST(datediff(CAST(wk AS DATE), CAST(cohort_wk AS DATE))"
                " DIV 7 AS INT)"
            ).alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@register(
    "q_sample_weighted",
    oracle="""
WITH w AS (
  SELECT o_orderkey,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS w_cents,
         CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))
              AS BIGINT) AS u32
  FROM orders
), mx AS (SELECT MAX(w_cents) AS wmax FROM w)
SELECT o_orderkey, w_cents, u32
FROM w CROSS JOIN mx
WHERE u32 * wmax < 2147483648 * w_cents
""",
    doc="Weight-proportional Bernoulli sampling: each order kept with "
    "probability (weight / max_weight) / 2, weight = total price in "
    "integer cents, uniform draw = the first 32 md5 bits of the key. "
    "The inclusion test u * wmax < 2^31 * w is pure 64-bit integer "
    "arithmetic — no float boundary can flip a row between engines "
    "(the same reason the reference's cursor filter compares raw "
    "timestamps, lambda_function.py:142-147). The float-free cousin "
    "of Efraimidis-Spirakis weighted reservoir sampling; for a fixed "
    "sample SIZE, rank the same u/w keys with TakeOrderedAndProject.",
    scale_notes="Zero-shuffle filter over the scan plus one 1-row "
    "global-max broadcast (the q_agg_global_max cursor pattern). "
    "Overflow-safe by construction: u < 2^32 and w_cents < 2^31 keep "
    "both products under 2^63.",
)
def q_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    ords = read_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100)
        .cast("bigint")
        .alias("w_cents"),
        F.conv(
            F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8),
            16,
            10,
        )
        .cast("bigint")
        .alias("u32"),
    )
    mx = ords.agg(F.max("w_cents").alias("wmax"))
    return (
        ords.crossJoin(F.broadcast(mx))
        .filter(
            F.col("u32") * F.col("wmax")
            < F.lit(2147483648) * F.col("w_cents")
        )
        .select("o_orderkey", "w_cents", "u32")
    )
