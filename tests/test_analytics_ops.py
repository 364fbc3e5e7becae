"""Semantic invariants for the round-6 late batch (analytics, portable
sketches II, graph, tokenizer prep) — guarantees the oracle-parity hash
can't state by itself:

- the bloom filter admits no false negatives (pass = true + false-pos,
  with the true count re-derived independently);
- the count-min sketch never underestimates (the published CM bound);
- degree-oriented triangle counting equals a naive common-neighbor
  count computed in pure Python;
- funnel stages are temporally ordered and consistent with nulls;
- cohort week offsets are non-negative and offset-0 covers the cohort;
- weighted sampling favors heavy rows and every sampled row satisfies
  the integer inclusion inequality re-checked in Python;
- DSIR importance weights separate the target language (en scores
  higher on average than the rest, the property resampling relies on);
- the BPE top pair equals the max adjacent-pair count recomputed in
  Python.
"""

from __future__ import annotations

import duckdb

from weather_etl_spark.registry import load_all

SPECS = load_all()


def test_bloom_filter_no_false_negatives(spark, sf_dir):
    row = SPECS["q_join_bloom"].fn(spark, sf_dir).collect()[0]
    # Bloom guarantee: every true match passes; extras are collisions.
    assert row.n_bloom_pass == row.n_true + row.n_false_pos
    assert row.n_false_pos >= 0
    truth = duckdb.sql(
        f"SELECT COUNT(*) FROM '{sf_dir}/orders.parquet' o "
        f"JOIN '{sf_dir}/customer.parquet' c ON o.o_custkey = c.c_custkey "
        f"WHERE c.c_mktsegment = 'BUILDING'"
    ).fetchone()[0]
    assert row.n_true == truth


def test_cms_never_underestimates(spark, sf_dir):
    rows = SPECS["q_agg_cms_portable"].fn(spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.cms_est >= r.true_cnt, (
            f"CM sketch underestimated key {r.p_partkey}"
        )
        assert r.state_checksum > 0


def test_triangles_match_naive_common_neighbor_count(spark, sf_dir):
    row = SPECS["q_graph_triangles"].fn(spark, sf_dir).collect()[0]
    edges = duckdb.sql(
        f"WITH sup AS (SELECT DISTINCT l_orderkey, l_partkey "
        f"FROM '{sf_dir}/lineitem.parquet') "
        f"SELECT DISTINCT a.l_partkey, b.l_partkey FROM sup a JOIN sup b "
        f"ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey"
    ).fetchall()
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    naive = sum(len(adj[u] & adj[v]) for u, v in edges)
    assert naive % 3 == 0  # each triangle counted once per edge
    assert row.n_triangles == naive // 3
    assert row.n_edges == len(edges)
    assert row.n_nodes == len(adj)


def test_funnel_stages_temporally_ordered(spark, sf_dir):
    rows = SPECS["q_funnel"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.t_view_us is not None
        if r.t_click_us is not None:
            assert r.t_click_us > r.t_view_us
        if r.t_purchase_us is not None:
            assert r.t_click_us is not None  # can't skip a stage
            assert r.t_purchase_us > r.t_click_us
        want = 1 + (r.t_click_us is not None) + (r.t_purchase_us is not None)
        assert r.stage == want


def test_cohort_offsets_nonneg_and_offset0_covers_cohort(spark, sf_dir):
    rows = SPECS["q_cohort_retention"].fn(spark, sf_dir).collect()
    assert rows
    by_cohort: dict[str, dict[int, int]] = {}
    for r in rows:
        assert r.week_offset >= 0
        assert r.n_users > 0
        by_cohort.setdefault(str(r.cohort_week), {})[r.week_offset] = (
            r.n_users
        )
    for cohort, cells in by_cohort.items():
        # a user's first event lies in the cohort week, so the offset-0
        # cell exists and no later cell can exceed it
        assert 0 in cells, f"cohort {cohort} missing offset-0 cell"
        assert cells[0] == max(cells.values())


def test_weighted_sampling_inequality_and_bias(spark, sf_dir):
    rows = SPECS["q_sample_weighted"].fn(spark, sf_dir).collect()
    assert rows
    allw = duckdb.sql(
        f"SELECT o_orderkey, CAST(ROUND(o_totalprice * 100) AS BIGINT) "
        f"FROM '{sf_dir}/orders.parquet'"
    ).fetchall()
    wmax = max(w for _, w in allw)
    sampled = set()
    for r in rows:
        # re-check the integer inclusion test independently
        assert r.u32 * wmax < 2147483648 * r.w_cents
        sampled.add(r.o_orderkey)
    weights = sorted(w for _, w in allw)
    median = weights[len(weights) // 2]
    heavy = [k for k, w in allw if w > median]
    light = [k for k, w in allw if w <= median]
    rate_heavy = sum(k in sampled for k in heavy) / len(heavy)
    rate_light = sum(k in sampled for k in light) / len(light)
    assert rate_heavy > rate_light, (
        "weight-proportional sampling should favor heavy rows"
    )


def test_dsir_weights_separate_target_language(spark, sf_dir):
    rows = SPECS["q_llm_dsir"].fn(spark, sf_dir).collect()
    langs = dict(
        duckdb.sql(
            f"SELECT doc_id, lang FROM '{sf_dir}/documents.parquet'"
        ).fetchall()
    )
    en = [r.dsir_weight_micro for r in rows if langs[r.doc_id] == "en"]
    rest = [r.dsir_weight_micro for r in rows if langs[r.doc_id] != "en"]
    assert en and rest
    assert sum(en) / len(en) > sum(rest) / len(rest), (
        "target-language docs must score higher importance on average"
    )


def test_bpe_top_pair_matches_python_recount(spark, sf_dir):
    rows = SPECS["q_llm_bpe_pairs"].fn(spark, sf_dir).collect()
    assert [r.rk for r in rows] == list(range(1, len(rows) + 1))
    texts = duckdb.sql(
        f"SELECT text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    counts: dict[str, int] = {}
    for (text,) in texts:
        toks = text.split(" ")
        for a, b in zip(toks, toks[1:]):
            pair = f"{a} {b}"
            counts[pair] = counts.get(pair, 0) + 1
    top = rows[0]
    assert top.cnt == max(counts.values())
    assert counts[top.pair] == top.cnt


def test_keywords_topk_shape(spark, sf_dir):
    rows = SPECS["q_llm_keywords"].fn(spark, sf_dir).collect()
    per_doc: dict[int, list[int]] = {}
    for r in rows:
        assert 1 <= r.rk <= 3
        assert r.score_ppm >= 0
        per_doc.setdefault(r.doc_id, []).append(r.rk)
    for doc, rks in per_doc.items():
        assert sorted(rks) == list(range(1, len(rks) + 1)), (
            f"doc {doc} has gapped/duplicate keyword ranks {rks}"
        )


def test_bitmap_popcount_is_exact_distinct(spark, sf_dir):
    rows = SPECS["q_agg_bitmap_portable"].fn(spark, sf_dir).collect()
    truth = dict(
        duckdb.sql(
            f"SELECT event_type, COUNT(DISTINCT user_id) "
            f"FROM '{sf_dir}/events.parquet' GROUP BY event_type"
        ).fetchall()
    )
    assert len(rows) == len(truth)
    for r in rows:
        assert r.exact_distinct == truth[r.event_type], (
            f"bitmap popcount diverged for {r.event_type}"
        )


def test_hist_quantile_bin_contains_kth_element(spark, sf_dir):
    rows = {
        r.q: r for r in SPECS["q_agg_hist_quantile"].fn(spark, sf_dir).collect()
    }
    assert set(rows) == {50, 90, 99}
    # monotone: higher quantile can't land in a lower bin
    assert rows[50].qbin <= rows[90].qbin <= rows[99].qbin
    (n,) = duckdb.sql(
        f"SELECT COUNT(*) FROM '{sf_dir}/lineitem.parquet'"
    ).fetchone()
    for q, r in rows.items():
        k = -(-q * n // 100)  # ceil(q*n/100), the crossing element
        (kth,) = duckdb.sql(
            f"SELECT l_extendedprice FROM '{sf_dir}/lineitem.parquet' "
            f"ORDER BY l_extendedprice LIMIT 1 OFFSET {k - 1}"
        ).fetchone()
        assert min(int(kth // 2000), 63) == r.qbin, (
            f"p{q}: bin {r.qbin} does not contain the k-th element {kth}"
        )
        assert r.q_lower_edge == r.qbin * 2000


def test_scd2_intervals_tile_and_version(spark, sf_dir):
    rows = SPECS["q_scd2_intervals"].fn(spark, sf_dir).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for user, vs in by_user.items():
        vs.sort(key=lambda r: r.version)
        assert [r.version for r in vs] == list(range(1, len(vs) + 1))
        opens = [r for r in vs if r.eff_to_us is None]
        assert len(opens) == 1 and opens[0] is vs[-1], (
            f"user {user}: exactly the last version must be open-ended"
        )
        for a, b in zip(vs, vs[1:]):
            # intervals tile: each version closes where the next opens
            assert a.eff_to_us == b.eff_from_us
            assert a.value != b.value, "consecutive versions must differ"


def test_cdc_upsert_classification(spark, sf_dir):
    rows = SPECS["q_cdc_upsert"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        if r.cdc_op == "inserted":
            assert r.base_value is None and r.upd_value is not None
            assert r.current_value == r.upd_value
        elif r.cdc_op == "updated":
            assert r.base_value is not None and r.upd_value is not None
            assert r.current_value == r.upd_value
        else:
            assert r.cdc_op == "unchanged"
            assert r.upd_value is None
            assert r.current_value == r.base_value


def test_dq_audit_clean_fixture_and_populations(spark, sf_dir):
    rows = {r.check_name: r for r in SPECS["q_dq_audit"].fn(spark, sf_dir).collect()}
    assert len(rows) == 6
    (n_orders,) = duckdb.sql(
        f"SELECT COUNT(*) FROM '{sf_dir}/orders.parquet'"
    ).fetchone()
    (n_li,) = duckdb.sql(
        f"SELECT COUNT(*) FROM '{sf_dir}/lineitem.parquet'"
    ).fetchone()
    for name, r in rows.items():
        assert 0 <= r.n_violations <= r.n_checked
        want = n_li if name.startswith("lineitem") else n_orders
        assert r.n_checked == want
    # the synthetic fixture is referentially clean by construction
    assert rows["orders_orphan_custkey"].n_violations == 0
    assert rows["orders_dup_orderkey"].n_violations == 0


def test_dedup_weights_unit_mass_per_cluster(spark, sf_dir):
    rows = SPECS["q_llm_dedup_weights"].fn(spark, sf_dir).collect()
    by_size: dict[int, int] = {}
    for r in rows:
        assert r.weight_ppm == 1000000 // r.cluster_size
        by_size[r.cluster_size] = by_size.get(r.cluster_size, 0) + 1
    # each cluster's members sum to <= 1e6 ppm (one doc of mass),
    # short only by the integer-division remainder
    for size, n_members in by_size.items():
        assert n_members % size == 0  # whole clusters
        mass = size * (1000000 // size)
        assert 1000000 - size < mass <= 1000000


def test_kmv_intersect_invariants_vs_exact(spark, sf_dir):
    row = SPECS["q_agg_kmv_intersect"].fn(spark, sf_dir).collect()[0]
    assert 0 <= row.n_overlap <= 8
    assert row.union_est > 0
    assert row.inter_est <= row.union_est
    # the estimate should be in the right ballpark of the exact
    # intersection (k=8 is a coarse sketch; assert within 3x bounds)
    (exact,) = duckdb.sql(
        f"SELECT COUNT(*) FROM ("
        f"  SELECT DISTINCT user_id FROM '{sf_dir}/events.parquet'"
        f"  WHERE event_type = 'view'"
        f"  INTERSECT"
        f"  SELECT DISTINCT user_id FROM '{sf_dir}/events.parquet'"
        f"  WHERE event_type = 'purchase')"
    ).fetchone()
    if exact > 0 and row.n_overlap > 0:
        assert exact / 3 <= row.inter_est <= exact * 3


def test_skew_profile_consistency(spark, sf_dir):
    row = SPECS["q_skew_profile"].fn(spark, sf_dir).collect()[0]
    assert row.p50_rows <= row.p99_rows <= row.max_rows
    assert row.n_keys > 0 and row.n_rows >= row.n_keys
    truth = duckdb.sql(
        f"SELECT COUNT(DISTINCT l_suppkey), COUNT(*), "
        f"MAX(c) FROM (SELECT l_suppkey, COUNT(*) AS c "
        f"FROM '{sf_dir}/lineitem.parquet' GROUP BY l_suppkey)"
    ).fetchone()
    assert row.n_keys == truth[0]
    assert row.max_rows == truth[2]
    assert row.max_over_mean_pct == (
        row.max_rows * row.n_keys * 100
    ) // row.n_rows


def test_weighted_sampling_python_differential(spark, tmp_path):
    """Differential on synthetic weights the fixture can't produce
    (extremes: w=1 cent vs w=max): the Spark sample must equal a pure
    python evaluation of the same integer inclusion rule."""
    import hashlib
    import random

    rng = random.Random(77)
    rows = [
        (k, float(rng.choice([0.01, 0.5, 10.0, 500.0, 21474836.47])))
        for k in range(1, 400)
    ]
    sf = tmp_path / "wsample"
    sf.mkdir()
    spark.createDataFrame(
        rows, "o_orderkey long, o_totalprice double"
    ).write.parquet(str(sf / "orders.parquet"))

    got = sorted(
        r.o_orderkey
        for r in SPECS["q_sample_weighted"].fn(spark, str(sf)).collect()
    )

    def u32(k: int) -> int:
        return int(hashlib.md5(str(k).encode()).hexdigest()[:8], 16)

    cents = {k: round(w * 100) for k, w in rows}
    wmax = max(cents.values())
    want = sorted(
        k for k in cents if u32(k) * wmax < 2147483648 * cents[k]
    )
    assert got == want


def test_funnel_python_differential_random_streams(spark, tmp_path):
    """Funnel on random event streams vs a pure-python evaluation of
    the same earliest-view -> first-later-click -> first-later-purchase
    cascade (exercises orderings the fixture doesn't: purchase-first
    users, click-only users, interleaved repeats)."""
    import datetime
    import random

    rng = random.Random(4242)
    types = ["view", "click", "purchase", "error"]
    rows = []
    t0 = datetime.datetime(2024, 3, 1)
    for eid in range(600):
        rows.append(
            (
                eid,
                t0 + datetime.timedelta(minutes=rng.randint(0, 10000)),
                rng.randint(1, 25),
                rng.choice(types),
                float(rng.randint(1, 100)),
            )
        )
    sf = tmp_path / "funnel"
    sf.mkdir()
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double",
    ).write.parquet(str(sf / "events.parquet"))

    got = {
        r.user_id: (r.stage, r.t_view_us, r.t_click_us, r.t_purchase_us)
        for r in SPECS["q_funnel"].fn(spark, str(sf)).collect()
    }

    def us(dt):
        return int(dt.timestamp() * 1_000_000)

    by_user: dict[int, list] = {}
    for eid, ts, user, etype, _ in rows:
        by_user.setdefault(user, []).append((ts, etype))
    want = {}
    for user, evs in by_user.items():
        views = [t for t, e in evs if e == "view"]
        if not views:
            continue
        t_view = min(views)
        clicks = [t for t, e in evs if e == "click" and t > t_view]
        t_click = min(clicks) if clicks else None
        t_purch = None
        if t_click is not None:
            purch = [t for t, e in evs if e == "purchase" and t > t_click]
            t_purch = min(purch) if purch else None
        stage = 1 + (t_click is not None) + (t_purch is not None)
        want[user] = (
            stage,
            us(t_view),
            us(t_click) if t_click else None,
            us(t_purch) if t_purch else None,
        )
    assert got == want


def test_cohort_python_differential_random_streams(spark, tmp_path):
    import datetime
    import random

    rng = random.Random(99)
    rows = []
    t0 = datetime.datetime(2024, 1, 1)  # a Monday
    for eid in range(500):
        rows.append(
            (
                eid,
                t0 + datetime.timedelta(hours=rng.randint(0, 24 * 70)),
                rng.randint(1, 20),
                "click",
                1.0,
            )
        )
    sf = tmp_path / "cohort"
    sf.mkdir()
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double",
    ).write.parquet(str(sf / "events.parquet"))

    got = {
        (str(r.cohort_week), r.week_offset): r.n_users
        for r in SPECS["q_cohort_retention"].fn(spark, str(sf)).collect()
    }

    def week(dt):
        d = dt.date()
        return d - datetime.timedelta(days=d.weekday())

    first: dict[int, datetime.date] = {}
    active: set = set()
    for _, ts, user, _, _ in rows:
        w = week(ts)
        active.add((user, w))
        if user not in first or w < first[user]:
            first[user] = w
    want: dict = {}
    for user, w in active:
        cohort = first[user]
        key = (str(cohort), (w - cohort).days // 7)
        want[key] = want.get(key, 0) + 1
    assert got == want


def test_kanonymity_flags_match_counts(spark, sf_dir):
    rows = SPECS["q_kanonymity"].fn(spark, sf_dir).collect()
    assert rows
    total = 0
    for r in rows:
        assert r.k_safe == (r.n_docs >= 5)
        total += r.n_docs
    (n_docs,) = duckdb.sql(
        f"SELECT COUNT(*) FROM '{sf_dir}/documents.parquet'"
    ).fetchone()
    assert total == n_docs  # classes partition the corpus


def test_ab_metrics_sufficient_statistics(spark, sf_dir):
    rows = {r.arm: r for r in SPECS["q_ab_metrics"].fn(spark, sf_dir).collect()}
    assert set(rows) == {0, 1}
    (n_users,) = duckdb.sql(
        f"SELECT COUNT(DISTINCT user_id) FROM '{sf_dir}/events.parquet'"
    ).fetchone()
    assert rows[0].n_users + rows[1].n_users == n_users
    for r in rows.values():
        assert 0 <= r.n_converted <= r.n_users
        assert r.conv_ppm == r.n_converted * 1000000 // r.n_users
        assert r.revenue_cents >= 0


def test_binaryfile_matches_duckdb_read_blob(spark, sf_dir):
    """src_binaryfile is rows-only for the driver (its oracle would
    need a file path, which the driver's view-based SQL can't take);
    this test IS its cross-engine byte check: Spark's binaryFile and
    DuckDB's read_blob must agree on every file's name, size, and
    first/last-8-byte hex."""
    got = {
        r.file_name: (r.n_bytes, r.head_hex, r.tail_hex)
        for r in SPECS["src_binaryfile"].fn(spark, sf_dir).collect()
    }
    want = {
        name: (size, head, tail)
        for name, size, head, tail in duckdb.sql(
            f"SELECT regexp_extract(filename, '([^/]+)$', 1), "
            f"CAST(size AS BIGINT), substr(hex(content), 1, 16), "
            f"substr(hex(content), size * 2 - 15, 16) "
            f"FROM read_blob('{sf_dir}/*.parquet')"
        ).fetchall()
    }
    assert got == want
    assert all(h.startswith("50415231") for _, h, _t in got.values()), (
        "every parquet file must open with the PAR1 magic"
    )


def test_downsample_picks_max_area_point_python(spark, sf_dir):
    """Pure-python recompute of the bucketed largest-triangle choice
    (fractions module = exact rational arithmetic, an independent
    third opinion beside the DECIMAL oracle)."""
    from fractions import Fraction

    got = {
        (r.user_id, r.bucket): (r.ts_us, r.value_cents)
        for r in SPECS["q_time_downsample"].fn(spark, sf_dir).collect()
    }
    rows = duckdb.sql(
        f"SELECT user_id, epoch_us(ts) // 1000000 - 1704067200, "
        f"CAST(ROUND(value * 100) AS BIGINT), epoch_us(ts) "
        f"FROM '{sf_dir}/events.parquet'"
    ).fetchall()
    buckets: dict = {}
    for user, x, y, ts_us in rows:
        buckets.setdefault((user, x // 21600), []).append((x, y, ts_us))
    want = {}
    for (user, bk), pts in buckets.items():
        prev = buckets.get((user, bk - 1))
        nxt = buckets.get((user, bk + 1))
        if not prev or not nxt:
            continue
        ax = Fraction(sum(p[0] for p in prev), len(prev))
        ay = Fraction(sum(p[1] for p in prev), len(prev))
        bx = Fraction(sum(p[0] for p in nxt), len(nxt))
        by = Fraction(sum(p[1] for p in nxt), len(nxt))
        best = max(
            pts,
            key=lambda p: (
                abs((p[0] - ax) * (by - ay) - (p[1] - ay) * (bx - ax)),
                -p[2],
            ),
        )
        want[(user, bk)] = (best[2], best[1])
    assert got == want
