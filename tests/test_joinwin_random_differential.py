"""Random-stream differentials for the round-6 join/window batches:
the as-of family (tolerance / nearest), the SCD2 lookup, the
time-window semi/anti pair, peak census, rolling slope/median, and
trigram mining run on ADVERSARIAL synthetic streams with heavy
(user, ts), (type, ts), and value collisions — the exact edge cases
the clean fixture generator never produces — and must match a
pure-python evaluation of the same definition.

Every operator orders by (ts, event_id); the python walks use the
identical composite key, so a divergence means a tie-break contract
is broken.
"""

from __future__ import annotations

import collections
import datetime
import os
import random
import zlib

import pytest

from tests.conftest import battery_seed
from weather_etl_spark.registry import load_all

SPECS = load_all()

_TOL_US = 7_200_000_000  # q_join_asof_tol
_TW_US = 3_600_000_000  # time-window joins


def _random_events(spark, tmp_path, name, n=None, users=18, minutes=300):
    """Dense random stream: heavy (user, ts) and (type, ts) collisions,
    duplicated values (ints / 7) so plateaus and rank ties occur."""
    if n is None:
        # committed lane runs at 700; the off-lane size sweep
        # re-runs the same differentials sparse (empty types,
        # single-row groups) and dense (heavier collisions)
        n = int(os.environ.get("SPARK_GRAFT_BATTERY_N", "700"))
    # stable per-op seed (process-salted builtin hash made a red
    # run unreproducible) + the sweep offset from conftest
    rng = random.Random(battery_seed(zlib.crc32(name.encode())))
    types = ["view", "click", "purchase", "error", "signup"]
    t0 = datetime.datetime(2024, 5, 1)
    rows = [
        (
            eid,
            t0 + datetime.timedelta(minutes=rng.randint(0, minutes)),
            rng.randint(1, users),
            rng.choice(types),
            float(rng.randint(1, 80)) / 4.0,  # many exact value ties
        )
        for eid in range(n)
    ]
    d = tmp_path / name
    d.mkdir()
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double",
    ).write.parquet(str(d / "events.parquet"))
    return str(d), rows


def _us(ts: datetime.datetime) -> int:
    return int(ts.replace(tzinfo=datetime.timezone.utc).timestamp() * 1_000_000)


def _by_user_sorted(rows, etype):
    out = collections.defaultdict(list)
    for eid, ts, uid, et, val in rows:
        if et == etype:
            out[uid].append((ts, eid, val))
    for v in out.values():
        v.sort()
    return out


def test_asof_tol_random_differential(spark, tmp_path):
    sf, rows = _random_events(spark, tmp_path, "asoftol")
    views = _by_user_sorted(rows, "view")
    want = {}
    for eid, ts, uid, et, _v in rows:
        if et != "purchase":
            continue
        cands = [v for v in views.get(uid, []) if v[0] <= ts]
        if not cands:
            want[eid] = None
            continue
        b_us = _us(max(cands)[0])
        want[eid] = b_us if _us(ts) - b_us <= _TOL_US else None
    got = {
        r["purchase_id"]: r["view_ts_us"]
        for r in SPECS["q_join_asof_tol"].fn(spark, sf).collect()
    }
    assert got == want


def test_asof_nearest_random_differential(spark, tmp_path):
    sf, rows = _random_events(spark, tmp_path, "asofnear")
    views = _by_user_sorted(rows, "view")
    want = {}
    for eid, ts, uid, et, _v in rows:
        if et != "purchase":
            continue
        vs = views.get(uid, [])
        back = [v[0] for v in vs if v[0] <= ts]
        fwd = [v[0] for v in vs if v[0] > ts]
        b = _us(max(back)) if back else None
        f = _us(min(fwd)) if fwd else None
        p = _us(ts)
        if b is None and f is None:
            want[eid] = (None, None)
        elif f is None or (b is not None and p - b <= f - p):
            want[eid] = (b, "back")
        else:
            want[eid] = (f, "fwd")
    got = {
        r["purchase_id"]: (r["view_ts_us"], r["direction"])
        for r in SPECS["q_join_asof_nearest"].fn(spark, sf).collect()
    }
    assert got == want


def test_scd2_lookup_random_differential(spark, tmp_path):
    sf, rows = _random_events(spark, tmp_path, "scd2lk")
    views = _by_user_sorted(rows, "view")
    # change rows per user in (ts, event_id) order
    changes = {}
    for uid, vs in views.items():
        ch = []
        prev = None
        for ts, eid, val in vs:
            if prev is None or val != prev:
                ch.append((ts, eid, val))
            prev = val
        changes[uid] = ch
    want = {}
    for eid, ts, uid, et, _v in rows:
        if et != "purchase":
            continue
        ch = changes.get(uid, [])
        idx = None
        for i, (cts, ceid, _cv) in enumerate(ch):
            if cts <= ts:
                idx = i
            else:
                break
        if idx is None:
            want[eid] = (None, None)
        else:
            want[eid] = (idx + 1, round(ch[idx][2], 4))
    got = {
        r["purchase_id"]: (r["version"], r["dim_value"])
        for r in SPECS["q_join_scd2_lookup"].fn(spark, sf).collect()
    }
    assert got == want


def test_time_window_pair_random_differential(spark, tmp_path):
    sf, rows = _random_events(spark, tmp_path, "twj")
    errs = collections.defaultdict(list)
    for eid, ts, uid, et, _v in rows:
        if et == "error":
            errs[uid].append(_us(ts))
    purchases = {
        eid: (uid, _us(ts))
        for eid, ts, uid, et, _v in rows
        if et == "purchase"
    }
    want_semi = {
        eid
        for eid, (uid, p) in purchases.items()
        if any(abs(p - e) <= _TW_US for e in errs.get(uid, []))
    }
    got_semi = {
        r["purchase_id"]
        for r in SPECS["q_join_time_window_semi"].fn(spark, sf).collect()
    }
    got_anti = {
        r["purchase_id"]
        for r in SPECS["q_join_time_window_anti"].fn(spark, sf).collect()
    }
    assert got_semi == want_semi
    assert got_anti == set(purchases) - want_semi


def test_win_peaks_random_differential(spark, tmp_path):
    """Value ties are frequent here (ints/4), so plateau exclusion is
    genuinely exercised."""
    sf, rows = _random_events(spark, tmp_path, "peaks")
    series = collections.defaultdict(list)
    for eid, ts, uid, et, val in sorted(
        rows, key=lambda t: (t[3], t[1], t[0])
    ):
        series[et].append(val)
    got = {
        r["event_type"]: r
        for r in SPECS["q_win_peaks"].fn(spark, sf).collect()
    }
    for et, vs in series.items():
        peaks = [
            vs[i]
            for i in range(1, len(vs) - 1)
            if vs[i] > vs[i - 1] and vs[i] > vs[i + 1]
        ]
        valleys = [
            vs[i]
            for i in range(1, len(vs) - 1)
            if vs[i] < vs[i - 1] and vs[i] < vs[i + 1]
        ]
        r = got[et]
        assert r["n_peaks"] == len(peaks)
        assert r["n_valleys"] == len(valleys)
        if len(vs) >= 4:  # degenerate series trivially satisfy this
            assert len(peaks) < len(vs) // 2, "plateaus must not count"


def test_win_slope_and_median_random_differential(spark, tmp_path):
    import statistics

    sf, rows = _random_events(spark, tmp_path, "slopemed")
    series = collections.defaultdict(list)
    for eid, ts, uid, et, val in sorted(
        rows, key=lambda t: (t[3], t[1], t[0])
    ):
        series[et].append((eid, int(round(val * 100))))
    want_slope, want_med = {}, {}
    for et, pts in series.items():
        for i, (eid, _y) in enumerate(pts):
            lo = max(0, i - 23)
            xs = list(range(lo + 1, i + 2))
            ys = [pts[j][1] for j in range(lo, i + 1)]
            n = len(xs)
            sx, sy = sum(xs), sum(ys)
            sxy = sum(a * b for a, b in zip(xs, ys))
            sx2 = sum(a * a for a in xs)
            den = n * sx2 - sx * sx
            if den == 0:
                want_slope[eid] = None
            else:
                num = (n * sxy - sx * sy) * 10000
                q, sign = abs(num), 1 if num >= 0 else -1
                want_slope[eid] = sign * ((2 * q + den) // (2 * den)) / 1e4
            want_med[eid] = statistics.median(ys) / 100
    got_slope = {
        r["event_id"]: r["slope"]
        for r in SPECS["q_win_slope"].fn(spark, sf).collect()
    }
    got_med = {
        r["event_id"]: r["med"]
        for r in SPECS["q_win_rolling_median"].fn(spark, sf).collect()
    }
    assert got_slope == want_slope
    assert got_med == pytest.approx(want_med)


def test_event_trigrams_random_differential(spark, tmp_path):
    sf, rows = _random_events(spark, tmp_path, "trig")
    per_user = collections.defaultdict(list)
    for eid, ts, uid, et, _v in sorted(
        rows, key=lambda t: (t[2], t[1], t[0])
    ):
        per_user[uid].append(et)
    occ = collections.Counter()
    sup = collections.defaultdict(set)
    for uid, seq in per_user.items():
        for i in range(len(seq) - 2):
            tg = ">".join(seq[i : i + 3])
            occ[tg] += 1
            sup[tg].add(uid)
    want = sorted(
        ((tg, n, len(sup[tg])) for tg, n in occ.items()),
        key=lambda t: (-t[2], -t[1], t[0]),
    )[:20]
    got = [
        (r["trigram"], r["n_occ"], r["support"])
        for r in SPECS["q_event_trigrams"].fn(spark, sf).collect()
    ]
    assert got == want
