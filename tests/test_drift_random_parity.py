"""Adversarial-data oracle parity for the drift/stats/eventseq batch.

These modules had zero driver lineage entering round 7 (they queue for
the r8-r10 windows), so their only evidence is fixture-data parity.
The driver fixture's generator is clean: no timestamp ties on the same
value, no zero-variance groups, no empty types, no rounding-boundary
values. This battery re-runs the REGISTERED DuckDB oracles against two
fabricated adversarial event streams and requires full value parity —
any tie-break, interpolation, or rounding divergence between engines
that the clean fixture masks fails here first, not in a driver window.

Full lane: a ~60-case sweep (see pytest.ini).
"""

from __future__ import annotations

import datetime
import random
import shutil

import pytest

from weather_etl_spark.io import TABLES
from weather_etl_spark.registry import load_all
from tests.conftest import battery_seed, SMOKE_SF_DIR
from tests.oracle_utils import compare_to_oracle

pytestmark = pytest.mark.full  # adversarial parity sweep (see pytest.ini)

SPECS = load_all()

#: Never-driver-checked rows whose inputs are the events table (the
#: drift/stats_ext/eventseq/analytics families queued for r8-r10).
EVENTS_OPS = [
    "q_agg_ks_test", "q_agg_mannwhitney", "q_agg_kruskal", "q_agg_levene",
    "q_agg_anova", "q_agg_chisq", "q_agg_spearman", "q_agg_ttest",
    "q_agg_autocorr", "q_agg_gini", "q_agg_hhi", "q_agg_benford",
    "q_agg_entropy", "q_agg_mutual_info", "q_agg_kl_divergence",
    "q_agg_js_divergence", "q_agg_runs_test", "q_agg_dispersion",
    "q_agg_cohens_d", "q_agg_theilsen", "q_agg_quantile_norm",
    "q_agg_pareto", "q_agg_winsorize", "q_agg_weighted_median",
    "q_agg_corr_matrix", "q_time_cusum", "q_time_mad", "q_time_ewma",
    "q_time_stl_strength", "q_time_changepoint", "q_time_holt",
    "q_event_interarrival",
    # eventseq / temporal-join backlog rows (the four eventseq ops with
    # their own random differentials — attribution, transitions, ohlc,
    # bursts — are covered in test_eventseq_random_differential)
    "q_time_anomaly", "q_event_dau_wau", "q_event_lifecycle",
    "q_event_survival", "q_time_backtest", "q_event_markov2",
    "q_event_decay_score", "q_event_pattern", "q_event_time_to_convert",
    "q_event_next_pred", "q_event_calibration", "q_event_rfm",
    "q_event_trigrams",
    "q_join_asof_tol", "q_join_asof_nearest",
    "q_join_time_window_semi", "q_join_time_window_anti",
    # running-window backlog rows (battery residue, r7 verdict #3):
    # the ties stream's duplicate (ts, value) rows stress the
    # distinct-running dedup and the drawdown's plateau tie-breaks
    "q_win_distinct_running", "q_win_drawdown",
]


def _write_events(spark, tmp_path, tag, rows):
    """Adversarial dir = fabricated events + the sf0.001 copies of the
    other tables (the DuckDB harness binds views for all ten).  Written
    with pyarrow as a single file, matching the fixture layout both
    engines read by plain path."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / tag
    d.mkdir()
    for t in TABLES:
        if t != "events":
            shutil.copy(f"{SMOKE_SF_DIR}/{t}.parquet", d / f"{t}.parquet")
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
        }
    )
    pq.write_table(tbl, str(d / "events.parquet"))
    return str(d)


def _ties_stream():
    """Heavy collisions: duplicate timestamps, repeated values (exact
    quarter fractions to sit on ROUND boundaries), one zero-variance
    user, one type with a single row, rank ties everywhere."""
    rng = random.Random(battery_seed(74901))
    t0 = datetime.datetime(2024, 3, 1)
    rows = []
    eid = 0
    for _ in range(600):
        rows.append((
            eid,
            t0 + datetime.timedelta(minutes=rng.randint(0, 240) * 5),
            rng.randint(1, 12),
            rng.choice(["view", "click", "purchase", "error"]),
            rng.randint(1, 40) / 4.0,  # massive value ties, .25 steps
        ))
        eid += 1
    # zero-variance user: constant value, constant gaps
    for k in range(40):
        rows.append((eid, t0 + datetime.timedelta(minutes=7 * k), 13,
                     "view", 5.0))
        eid += 1
    # a type that appears exactly once (df=1 / single-sample edges)
    rows.append((eid, t0 + datetime.timedelta(minutes=11), 14,
                 "signup", 3.25))
    return rows


def _skew_stream():
    """Extreme skew and dynamic range: 90% one type, magnitudes from
    1e-3 to 1e5, two-row groups (degrees-of-freedom edges), and a
    burst day followed by a near-empty day."""
    rng = random.Random(battery_seed(31337))
    t0 = datetime.datetime(2024, 3, 1)
    rows = []
    eid = 0
    for _ in range(540):  # the burst: one type, one day
        rows.append((
            eid,
            t0 + datetime.timedelta(seconds=rng.randint(0, 86399)),
            rng.randint(1, 5),
            "view",
            10 ** rng.uniform(-3, 5),
        ))
        eid += 1
    for _ in range(30):  # the tail day, sparse mixed types
        rows.append((
            eid,
            t0 + datetime.timedelta(days=1 + rng.randint(0, 6),
                                    minutes=rng.randint(0, 1439)),
            rng.randint(1, 20),
            rng.choice(["click", "purchase", "error"]),
            rng.randint(1, 9) * 1000.0,
        ))
        eid += 1
    # two-row groups for the k-sample tests
    rows.append((eid, t0 + datetime.timedelta(days=2), 30, "signup", 1.0))
    rows.append((eid + 1, t0 + datetime.timedelta(days=2), 31, "signup", 2.0))
    return rows


def _one_type_stream():
    """EVERY event is a view: the purchase/click/error categories are
    entirely absent, so two-sample statistics and conversion funnels
    aggregate empty groups. Caught the r7 q_agg_ttest bug where the
    Spark side's group-agg + crossJoin returned ZERO rows while the
    oracle's scalar subqueries return one row of NULLs (and
    q_agg_kruskal's single-group -0.0)."""
    rng = random.Random(battery_seed(90091))
    t0 = datetime.datetime(2024, 3, 1)
    return [
        (
            e,
            t0 + datetime.timedelta(minutes=rng.randint(0, 2000)),
            rng.randint(1, 10),
            "view",
            rng.randint(1, 80) / 4.0,
        )
        for e in range(600)
    ]


def _half_tie_stream():
    """Raw values planted EXACTLY on 4th-decimal half-boundary reprs
    (x.xxxx5) plus a sixteenth-fraction lane whose chain arithmetic
    stays exact in doubles — the rule-8 exposure for GENUINE fp
    outputs (raw ROUND(value, 4) passthroughs, fp recursions over
    low-precision decimals).  Added in r12 after the seed campaign
    tripped q_time_cusum on a constructed 2.72875: this stream hunts
    that class deterministically instead of waiting for a random
    offset to land one (first run tripped q_time_ewma/q_time_anomaly,
    both fixed with the portable-ROUND oracle idiom).  One event per
    (hour, lane) keeps bucket means equal to raw planted values."""
    rng = random.Random(battery_seed(27275))
    t0 = datetime.datetime(2024, 3, 1)
    rows = []
    eid = 0
    for k in range(500):
        v = float(f"{rng.randint(0, 9)}.{rng.randint(0, 9999):04d}5")
        rows.append((
            eid,
            t0 + datetime.timedelta(hours=k % 96, minutes=rng.randint(0, 59)),
            rng.randint(1, 8),
            rng.choice(["view", "click", "purchase", "error"]),
            v,
        ))
        eid += 1
    for k in range(100):  # exact-sixteenth chain lane
        rows.append((eid, t0 + datetime.timedelta(hours=k, seconds=30), 9,
                     "view", rng.randint(1, 400) / 16.0))
        eid += 1
    return rows


@pytest.fixture(scope="module")
def ties_dir(spark, tmp_path_factory):
    return _write_events(
        spark, tmp_path_factory.mktemp("adv"), "ties", _ties_stream()
    )


@pytest.fixture(scope="module")
def one_type_dir(spark, tmp_path_factory):
    return _write_events(
        spark, tmp_path_factory.mktemp("adv"), "onetype", _one_type_stream()
    )


@pytest.fixture(scope="module")
def skew_dir(spark, tmp_path_factory):
    return _write_events(
        spark, tmp_path_factory.mktemp("adv"), "skew", _skew_stream()
    )


@pytest.mark.parametrize("name", EVENTS_OPS)
def test_adversarial_ties_parity(spark, ties_dir, name):
    compare_to_oracle(spark, SPECS[name], ties_dir)


#: q_agg_anova is excluded from the skew stream ONLY: its 1e-3..1e5
#: dynamic range pushes sum(cents^2) past 2^53, where the final
#: DECIMAL->DOUBLE casts differ by one ulp between engines (Spark's
#: Java conversion is correctly rounded; DuckDB's int128-scaled path
#: rounds twice) and ROUND's 4th decimal flips — measured here,
#: documented as a presentation boundary in the operator's
#: scale_notes. Every driver SF keeps sums double-exact; the ties
#: stream still covers anova adversarially.
SKEW_OPS = [n for n in EVENTS_OPS if n != "q_agg_anova"]


@pytest.mark.parametrize("name", SKEW_OPS)
def test_adversarial_skew_parity(spark, skew_dir, name):
    compare_to_oracle(spark, SPECS[name], skew_dir)


@pytest.mark.parametrize("name", EVENTS_OPS)
def test_one_type_exhaustion_parity(spark, one_type_dir, name):
    compare_to_oracle(spark, SPECS[name], one_type_dir)


@pytest.fixture(scope="module")
def half_tie_dir(spark, tmp_path_factory):
    return _write_events(
        spark, tmp_path_factory.mktemp("adv"), "halftie", _half_tie_stream()
    )


@pytest.mark.parametrize("name", EVENTS_OPS)
def test_half_tie_parity(spark, half_tie_dir, name):
    compare_to_oracle(spark, SPECS[name], half_tie_dir)
