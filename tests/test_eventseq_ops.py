"""Semantic invariants for the event-sequence batch (eventseq.py) —
properties the oracle-parity hash cannot state by itself:

- the truncated-kernel EWMA matches a pure-python recomputation of the
  same closed form (and the first observation's EWMA is the value);
- every emitted anomaly z-score matches a python rolling mean/stddev
  over the trailing frame, and the flag is exactly |z| > 3;
- Markov transition probabilities sum to 1 per source state and the
  pair count equals (events - users), the number of consecutive pairs;
- the snapshot-diff classes partition the modular-arithmetic cases the
  snapshots were constructed from (counts re-derived in DuckDB);
- reciprocal-rank fusion matches a python recomputation from the two
  independently re-derived rankings.
"""

from __future__ import annotations

import math

import duckdb

from weather_etl_spark.operators.eventseq import (
    _ANOM_FRAME,
    _ANOM_MIN_N,
    _EWMA_ALPHA,
    _EWMA_TAPS,
    _RRF_K,
    _RRF_OUT,
    _RRF_TOPN,
)
from weather_etl_spark.registry import load_all

SPECS = load_all()


def _events_sorted(sf_dir, cols, order):
    return duckdb.sql(
        f"SELECT {cols} FROM '{sf_dir}/events.parquet' ORDER BY {order}"
    ).fetchall()


def test_ewma_matches_python_closed_form(spark, sf_dir):
    got = {
        r.event_id: r.ewma
        for r in SPECS["q_time_ewma"].fn(spark, sf_dir).collect()
    }
    rows = _events_sorted(
        sf_dir, "user_id, event_id, value", "user_id, ts, event_id"
    )
    hist: dict[int, list[float]] = {}
    checked = 0
    for uid, eid, val in rows:
        h = hist.setdefault(uid, [])
        h.append(val)
        taps = h[::-1][:_EWMA_TAPS]
        w = [_EWMA_ALPHA * (1 - _EWMA_ALPHA) ** k for k in range(len(taps))]
        want = sum(x * wk for x, wk in zip(taps, w)) / sum(w)
        assert math.isclose(got[eid], want, abs_tol=5e-4), (
            f"event {eid}: spark {got[eid]} python {want}"
        )
        if len(h) == 1:
            # single-tap kernel normalizes to the value itself
            assert math.isclose(got[eid], round(val, 4), abs_tol=5e-4)
        checked += 1
    assert checked == len(got)


def test_anomaly_zscores_match_python_rolling_frame(spark, sf_dir):
    out = {
        r.event_id: (r.zscore, r.is_anomaly)
        for r in SPECS["q_time_anomaly"].fn(spark, sf_dir).collect()
    }
    rows = _events_sorted(
        sf_dir, "event_type, event_id, value", "event_type, ts, event_id"
    )
    hist: dict[str, list[float]] = {}
    n_checked = n_flagged = 0
    for etype, eid, val in rows:
        h = hist.setdefault(etype, [])
        frame = h[-_ANOM_FRAME:]
        n = len(frame)
        h.append(val)
        if n < _ANOM_MIN_N:
            assert eid not in out
            continue
        mu = sum(frame) / n
        var = sum((x - mu) ** 2 for x in frame) / (n - 1)
        if var <= 0:
            assert eid not in out
            continue
        z = (val - mu) / math.sqrt(var)
        assert eid in out
        assert math.isclose(out[eid][0], z, abs_tol=5e-4)
        assert out[eid][1] == (abs(z) > 3.0)
        n_flagged += out[eid][1]
        n_checked += 1
    assert n_checked == len(out)
    assert n_flagged >= 1, "fixture produced no |z|>3 outliers to exercise"


def test_transition_probabilities_normalize(spark, sf_dir):
    rows = SPECS["q_event_transitions"].fn(spark, sf_dir).collect()
    by_prev: dict[str, list] = {}
    for r in rows:
        by_prev.setdefault(r.prev_type, []).append(r)
    for prev, grp in by_prev.items():
        assert math.isclose(sum(g.p for g in grp), 1.0, abs_tol=1e-3), prev
    n_events, n_users = duckdb.sql(
        f"SELECT COUNT(*), COUNT(DISTINCT user_id) "
        f"FROM '{sf_dir}/events.parquet'"
    ).fetchone()
    # each user's stream of k events yields k-1 consecutive pairs
    assert sum(r.n for r in rows) == n_events - n_users


def test_snapshot_diff_partitions_modular_cases(spark, sf_dir):
    rows = SPECS["q_snapshot_diff"].fn(spark, sf_dir).collect()
    by_change: dict[str, set[int]] = {"added": set(), "removed": set(), "updated": set()}
    for r in rows:
        by_change[r.change].add(r.o_orderkey)
        if r.change == "added":
            assert r.old_cents is None and r.new_cents is not None
        elif r.change == "removed":
            assert r.new_cents is None and r.old_cents is not None
        else:
            assert r.new_cents - r.old_cents == 1000
    added, removed, updated = duckdb.sql(
        f"""SELECT
        SUM(CASE WHEN o_orderkey % 7 = 0 AND o_orderkey % 5 <> 0
             THEN 1 ELSE 0 END),
        SUM(CASE WHEN o_orderkey % 5 = 0 AND o_orderkey % 7 <> 0
             THEN 1 ELSE 0 END),
        SUM(CASE WHEN o_orderkey % 3 = 0 AND o_orderkey % 5 <> 0
             AND o_orderkey % 7 <> 0 THEN 1 ELSE 0 END)
        FROM '{sf_dir}/orders.parquet'"""
    ).fetchone()
    assert (len(by_change["added"]), len(by_change["removed"]),
            len(by_change["updated"])) == (added, removed, updated)


def test_rank_fusion_matches_python_recomputation(spark, sf_dir):
    rows = SPECS["q_rank_fusion"].fn(spark, sf_dir).collect()
    assert [r.fused_rank for r in rows] == list(range(1, _RRF_OUT + 1))
    by_len = duckdb.sql(
        f"SELECT doc_id FROM '{sf_dir}/documents.parquet' "
        f"ORDER BY n_chars DESC, doc_id LIMIT {_RRF_TOPN}"
    ).fetchall()
    by_hash = duckdb.sql(
        f"SELECT doc_id FROM '{sf_dir}/documents.parquet' "
        f"ORDER BY md5(text), doc_id LIMIT {_RRF_TOPN}"
    ).fetchall()
    r_len = {d: i + 1 for i, (d,) in enumerate(by_len)}
    r_hash = {d: i + 1 for i, (d,) in enumerate(by_hash)}
    score = {
        d: (1.0 / (_RRF_K + r_len[d]) if d in r_len else 0.0)
        + (1.0 / (_RRF_K + r_hash[d]) if d in r_hash else 0.0)
        for d in set(r_len) | set(r_hash)
    }
    want = sorted(score, key=lambda d: (-score[d], d))[:_RRF_OUT]
    assert [r.doc_id for r in rows] == want
    for r in rows:
        assert r.r_len == r_len.get(r.doc_id, 0)
        assert r.r_hash == r_hash.get(r.doc_id, 0)
        assert math.isclose(r.rrf, score[r.doc_id], abs_tol=1e-5)


def test_attribution_matches_python_stream_walk(spark, sf_dir):
    rows = SPECS["q_event_attribution"].fn(spark, sf_dir).collect()
    got = {
        r.event_id: (r.first_click_id, r.last_click_id, r.attributed,
                     r.value_cents)
        for r in rows
    }
    ev = _events_sorted(
        sf_dir, "user_id, event_id, event_type, value",
        "user_id, ts, event_id",
    )
    first_click: dict[int, int] = {}
    last_click: dict[int, int] = {}
    n_purchases = n_attr = 0
    for uid, eid, etype, val in ev:
        if etype == "purchase":
            n_purchases += 1
            want = (
                first_click.get(uid),
                last_click.get(uid),
                uid in last_click,
                round(val * 100),
            )
            assert got[eid] == want, f"purchase {eid}: {got[eid]} != {want}"
            n_attr += want[2]
        if etype == "click":
            first_click.setdefault(uid, eid)
            last_click[uid] = eid
    assert n_purchases == len(got)
    assert 0 < n_attr  # fixture exercises the attributed path


def test_entropy_matches_python_and_bounds(spark, sf_dir):
    rows = SPECS["q_agg_entropy"].fn(spark, sf_dir).collect()
    counts = duckdb.sql(
        f"SELECT user_id, event_type, COUNT(*) FROM "
        f"'{sf_dir}/events.parquet' GROUP BY 1, 2"
    ).fetchall()
    by_user: dict[int, list[int]] = {}
    for uid, _, c in counts:
        by_user.setdefault(uid, []).append(c)
    assert len(rows) == len(by_user)
    for r in rows:
        cs = by_user[r.user_id]
        t = sum(cs)
        want = -sum((c / t) * math.log(c / t) for c in cs)
        assert math.isclose(r.entropy_nats, want, abs_tol=5e-4)
        assert r.n_events == t and r.n_types == len(cs)
        # bounds: 0 <= H <= ln(n_types)
        assert -1e-9 <= r.entropy_nats <= math.log(r.n_types) + 1e-6


def test_rfm_scores_are_balanced_quintiles(spark, sf_dir):
    rows = SPECS["q_event_rfm"].fn(spark, sf_dir).collect()
    n = len(rows)
    for attr in ("r_score", "f_score", "m_score"):
        hist: dict[int, int] = {}
        for r in rows:
            hist[getattr(r, attr)] = hist.get(getattr(r, attr), 0) + 1
        assert set(hist) == {1, 2, 3, 4, 5}
        assert max(hist.values()) - min(hist.values()) <= 1, (
            f"{attr}: ntile must balance bucket sizes"
        )
    # monotonicity: the top monetary quintile outspends the bottom
    top = [r.monetary_cents for r in rows if r.m_score == 5]
    bot = [r.monetary_cents for r in rows if r.m_score == 1]
    assert min(top) >= max(bot)
    # purchases roll up to the per-user frequency
    n_purchases = duckdb.sql(
        f"SELECT COUNT(*) FROM '{sf_dir}/events.parquet' "
        f"WHERE event_type = 'purchase'"
    ).fetchone()[0]
    assert sum(r.frequency for r in rows) == n_purchases


def test_gini_matches_python_and_bounds(spark, sf_dir):
    rows = SPECS["q_agg_gini"].fn(spark, sf_dir).collect()
    for r in rows:
        xs = sorted(
            round(v * 100)
            for (v,) in duckdb.sql(
                f"SELECT o_totalprice FROM '{sf_dir}/orders.parquet' "
                f"WHERE o_orderpriority = '{r.o_orderpriority}'"
            ).fetchall()
        )
        n, tot = len(xs), sum(xs)
        want = 2 * sum((i + 1) * x for i, x in enumerate(xs)) / (n * tot) - (
            n + 1
        ) / n
        assert math.isclose(r.gini, want, abs_tol=5e-4)
        assert (r.n, r.total_cents) == (n, tot)
        assert 0.0 <= r.gini < 1.0


def test_ks_statistic_matches_python_ecdf(spark, sf_dir):
    row = SPECS["q_agg_ks_test"].fn(spark, sf_dir).collect()[0]
    va = [v for (v,) in duckdb.sql(
        f"SELECT value FROM '{sf_dir}/events.parquet' "
        f"WHERE event_type = 'view'").fetchall()]
    vb = [v for (v,) in duckdb.sql(
        f"SELECT value FROM '{sf_dir}/events.parquet' "
        f"WHERE event_type = 'purchase'").fetchall()]
    va.sort(); vb.sort()
    import bisect

    d = max(
        abs(
            bisect.bisect_right(va, x) / len(va)
            - bisect.bisect_right(vb, x) / len(vb)
        )
        for x in va + vb
    )
    assert math.isclose(row.ks_d, d, abs_tol=5e-4)
    assert (row.n_a, row.n_b) == (len(va), len(vb))
    thresh = 1.358 * math.sqrt(
        (len(va) + len(vb)) / (len(va) * len(vb))
    )
    assert row.reject_05 == (d > thresh)


def test_ohlc_endpoints_are_temporal_extremes(spark, sf_dir):
    rows = SPECS["q_time_resample_ohlc"].fn(spark, sf_dir).collect()
    ev = _events_sorted(
        sf_dir,
        "event_type, CAST(date_trunc('hour', ts) AS DATE) AS day, "
        "hour(ts) AS hr, value, ts, event_id",
        "event_type, ts, event_id",
    )
    buckets: dict[tuple, list] = {}
    for etype, day, hr, val, ts, eid in ev:
        buckets.setdefault((etype, day, hr), []).append(val)
    assert len(rows) == len(buckets)
    for r in rows:
        vals = buckets[(r.event_type, r.day, r.hr)]
        assert math.isclose(r.open, round(vals[0], 4), abs_tol=1e-3)
        assert math.isclose(r.close, round(vals[-1], 4), abs_tol=1e-3)
        assert math.isclose(r.high, round(max(vals), 4), abs_tol=1e-3)
        assert math.isclose(r.low, round(min(vals), 4), abs_tol=1e-3)
        assert r.volume == len(vals)
        assert r.low <= r.open <= r.high and r.low <= r.close <= r.high


def test_cooccurrence_pmi_matches_python(spark, sf_dir):
    rows = SPECS["q_event_cooccurrence"].fn(spark, sf_dir).collect()
    pres = duckdb.sql(
        f"SELECT DISTINCT user_id, event_type FROM "
        f"'{sf_dir}/events.parquet'"
    ).fetchall()
    users: dict[int, set] = {}
    for uid, t in pres:
        users.setdefault(uid, set()).add(t)
    n_users = len(users)
    for r in rows:
        n_a = sum(1 for s in users.values() if r.type_a in s)
        n_b = sum(1 for s in users.values() if r.type_b in s)
        n_both = sum(
            1 for s in users.values() if r.type_a in s and r.type_b in s
        )
        assert (r.n_a, r.n_b, r.n_both) == (n_a, n_b, n_both)
        assert r.type_a < r.type_b
        want = math.log(n_both * n_users / (n_a * n_b))
        assert math.isclose(r.pmi, want, abs_tol=5e-4)


def test_autocorr_matches_python_lag_pairs(spark, sf_dir):
    import statistics

    rows = SPECS["q_agg_autocorr"].fn(spark, sf_dir).collect()
    ev = _events_sorted(
        sf_dir, "event_type, value", "event_type, ts, event_id"
    )
    series: dict[str, list[float]] = {}
    for etype, val in ev:
        series.setdefault(etype, []).append(val)
    assert len(rows) == len(series)
    for r in rows:
        s = series[r.event_type]
        pairs = list(zip(s[1:], s[:-1]))
        assert r.n_pairs == len(pairs)
        want = statistics.correlation(
            [a for a, _ in pairs], [b for _, b in pairs]
        )
        assert math.isclose(r.autocorr_lag1, want, abs_tol=5e-4)
        assert -1.0 <= r.autocorr_lag1 <= 1.0


def test_pareto_is_minimal_covering_prefix(spark, sf_dir):
    rows = sorted(
        SPECS["q_agg_pareto"].fn(spark, sf_dir).collect(),
        key=lambda r: r.rk,
    )
    rev = duckdb.sql(
        f"SELECT o_custkey, CAST(SUM(ROUND(o_totalprice * 100)) AS BIGINT) "
        f"FROM '{sf_dir}/orders.parquet' GROUP BY o_custkey"
    ).fetchall()
    order = sorted(rev, key=lambda t: (-t[1], t[0]))
    total = sum(c for _, c in order)
    want, cum = [], 0
    for k, c in order:
        if 5 * cum >= 4 * total:
            break
        cum += c
        want.append(k)
    assert [r.o_custkey for r in rows] == want
    sel = sum(r.cents for r in rows)
    # covers >= 80%, and dropping the last selected row would not
    assert 5 * sel >= 4 * total
    assert 5 * (sel - rows[-1].cents) < 4 * total
    assert [r.rk for r in rows] == list(range(1, len(rows) + 1))


def test_bursts_match_python_bucket_walk(spark, sf_dir):
    out = {
        (r.event_type, r.bucket_id): (r.n_events, r.burst_ratio, r.is_burst)
        for r in SPECS["q_event_bursts"].fn(spark, sf_dir).collect()
    }
    buckets = duckdb.sql(
        f"SELECT event_type, "
        f"CAST(epoch_us(date_trunc('hour', ts)) // 3600000000 AS BIGINT), "
        f"COUNT(*) FROM '{sf_dir}/events.parquet' GROUP BY 1, 2 ORDER BY 1, 2"
    ).fetchall()
    hist: dict[str, list[int]] = {}
    n_checked = 0
    for etype, bid, c in buckets:
        h = hist.setdefault(etype, [])
        frame = h[-24:]
        h.append(c)
        if len(frame) < 6:
            assert (etype, bid) not in out
            continue
        baseline = sum(frame) / len(frame)
        got = out[(etype, bid)]
        assert got[0] == c
        assert math.isclose(got[1], c / baseline, abs_tol=5e-4)
        assert got[2] == (c > 3.0 * baseline)
        n_checked += 1
    assert n_checked == len(out) and n_checked > 0


def test_benford_chi2_terms_and_totals(spark, sf_dir):
    rows = SPECS["q_agg_benford"].fn(spark, sf_dir).collect()
    digits = [
        int(str(int(v))[0])
        for (v,) in duckdb.sql(
            f"SELECT FLOOR(o_totalprice) FROM '{sf_dir}/orders.parquet' "
            f"WHERE o_totalprice >= 1"
        ).fetchall()
    ]
    n = len(digits)
    assert sum(r.n_obs for r in rows) == n
    for r in rows:
        obs = sum(1 for d in digits if d == r.digit)
        exp = math.log10(1 + 1 / r.digit) * n
        assert r.n_obs == obs
        assert math.isclose(r.expected, exp, abs_tol=5e-3)
        assert math.isclose(r.chi2_term, (obs - exp) ** 2 / exp, abs_tol=5e-3)
