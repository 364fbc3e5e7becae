"""Rule-8 exact-tie battery: half-boundary fixtures for the radar rows.

The r10 verdict's order #3: instead of waiting for a fresh-seed battery
to trip one of the audited ROUND(mean-or-ratio) rows (SCALE.md
"Round-10 radar"), construct fixtures whose rounded output lands
EXACTLY on a 4th-decimal half boundary and run the full cross-engine
compare.  The primitive divergence is real and measured (see
test_round_half_tie_primitive_divergence): for ratios like 57/800 =
0.07125, Spark's ROUND (HALF_UP on the double's shortest decimal repr)
gives 0.0713 while DuckDB's ROUND (half-away-from-zero on the
fp-scaled product) gives 0.0712 — 21 of the 400 odd-numerator ties at
denominator 800 diverge.  Every radar row therefore now computes its
rounded ratio/mean in EXACT bigint space (functions/exact.py
ratio_round4_sql / decimal_mean_round4_sql, the q_llm_ppl_holdout
remedy generalized); these tests pin that the hardened rows agree
across engines ON the tie, and each fixture asserts the crafted tie
value actually occurs (a fixture that misses its tie proves nothing).

Run before the fix, every fixture here FAILED its cross-engine compare
(recorded in SCALE.md §Round-11); after it, all pass.
"""

from __future__ import annotations

import hashlib
import math
import shutil
from decimal import ROUND_HALF_UP, Decimal

import pytest

from weather_etl_spark.io import TABLES
from weather_etl_spark.registry import load_all
from tests.conftest import SMOKE_SF_DIR
from tests.oracle_utils import compare_to_oracle

pytestmark = pytest.mark.full  # adversarial parity sweep (see pytest.ini)

SPECS = load_all()


# ---------------------------------------------------------------------------
# rounding simulators (document the two engines' primitive behavior)
# ---------------------------------------------------------------------------

def _duck_round(v: float, s: int = 4) -> float:
    """DuckDB double ROUND: half away from zero on the fp-scaled value."""
    scaled = v * (10 ** s)
    f = math.floor(scaled)
    return (f + 1 if scaled - f >= 0.5 else f) / 10 ** s


def _spark_round(v: float, s: int = 4) -> float:
    """Spark double ROUND: HALF_UP on the shortest decimal repr."""
    return float(
        Decimal(repr(v)).quantize(Decimal(1).scaleb(-s), ROUND_HALF_UP)
    )


def test_round_half_tie_primitive_divergence():
    """Pin the MOTIVATION: the engines' float ROUNDs genuinely disagree
    on 57/800 = 0.07125 (the double sits just below the true rational,
    so DuckDB's scaled round goes down while Spark's shortest-repr
    HALF_UP goes up).  If a future DuckDB/JVM changes this, the exact
    bigint remedy is still correct — but this test tells us the ground
    shifted."""
    import duckdb

    d = duckdb.connect().execute(
        "SELECT ROUND(CAST(57 AS DOUBLE) / 800, 4)"
    ).fetchone()[0]
    assert d == 0.0712 == _duck_round(57 / 800)
    assert _spark_round(57 / 800) == 0.0713
    # the exact bigint half-up both engines now compute:
    assert ((57 % 800) * 20000 + 800) // (2 * 800) == 713


# ---------------------------------------------------------------------------
# fixture writers (single-file parquet; other tables copied from sf0.001)
# ---------------------------------------------------------------------------

def _fixture_dir(tmp_path, tag, replace: dict):
    """Fixture dir = fabricated table(s) + sf0.001 copies of the rest."""
    import pyarrow.parquet as pq

    d = tmp_path / tag
    d.mkdir()
    for t in TABLES:
        if t not in replace:
            shutil.copy(f"{SMOKE_SF_DIR}/{t}.parquet", d / f"{t}.parquet")
    for t, tbl in replace.items():
        pq.write_table(tbl, str(d / f"{t}.parquet"))
    return str(d)


def _events_table(rows):
    import pyarrow as pa

    return pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
        }
    )


def _docs_table(docs):
    import pyarrow as pa

    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in docs], pa.int64()),
            "text": pa.array([r[1] for r in docs], pa.string()),
            "lang": pa.array([r[2] for r in docs], pa.string()),
            "source": pa.array([r[3] for r in docs], pa.string()),
            "n_chars": pa.array([len(r[1]) for r in docs], pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# 1. q_event_next_pred — accuracy 57/800
# ---------------------------------------------------------------------------

def test_tie_next_pred(spark, tmp_path):
    import datetime

    t_train = datetime.datetime(2024, 1, 10)
    t_test = datetime.datetime(2024, 1, 25)
    rows, eid = [], 0

    def add(ts, uid, typ):
        nonlocal eid
        rows.append((eid, ts, uid, typ, 1.0))
        eid += 1

    # user 1: training chain (all transitions complete before the
    # split) — model: A -> B (2 beats 1), B -> A
    for k, typ in enumerate(["A", "B", "A", "B", "A", "C"]):
        add(t_train + datetime.timedelta(minutes=k), 1, typ)
    # user 2: test chain of 800 A -> x transitions, exactly 57 to the
    # predicted B -> accuracy = 57/800 = 0.07125, the diverging tie
    seq = []
    for k in range(800):
        seq += ["A", "B" if k < 57 else "C"]
    for k, typ in enumerate(seq):
        add(t_test + datetime.timedelta(seconds=k), 2, typ)

    d = _fixture_dir(tmp_path, "nextpred", {"events": _events_table(rows)})
    spec = SPECS["q_event_next_pred"]
    out = {r["prev"]: r for r in spec.fn(spark, d).collect()}
    a = out["A"]
    assert (a["n_test"], a["n_correct"]) == (800, 57), "tie construction"
    assert a["accuracy"] == 0.0713  # exact bigint half-up
    compare_to_oracle(spark, spec, d)


# ---------------------------------------------------------------------------
# 2. q_llm_gram_novelty — novelty 57/800
# ---------------------------------------------------------------------------

def test_tie_gram_novelty(spark, tmp_path):
    toks = [f"t{j:04d}" for j in range(802)]
    docs = [
        (0, " ".join(toks[:745]), "en", "srcA"),   # 743 grams, all novel
        (1, " ".join(toks), "en", "srcA"),         # 800 grams, 57 novel
    ]
    d = _fixture_dir(tmp_path, "novelty", {"documents": _docs_table(docs)})
    spec = SPECS["q_llm_gram_novelty"]
    out = {r["doc_id"]: r for r in spec.fn(spark, d).collect()}
    assert (out[1]["n_grams"], out[1]["n_novel"]) == (800, 57)
    assert out[1]["novelty"] == 0.0713
    compare_to_oracle(spark, spec, d)


# ---------------------------------------------------------------------------
# 3. q_llm_boilerplate — doc_share 57/800
# ---------------------------------------------------------------------------

def test_tie_boilerplate(spark, tmp_path):
    docs = []
    for i in range(800):
        mid = ""
        if 100 <= i < 700:
            mid = " ga gb gc"          # df=600 gram
        elif 1 <= i < 58:
            mid = " ha hb hc"          # df=57 gram -> 57/800 tie
        # unique flankers keep every boundary gram at df=1
        docs.append((i, f"u{i}a u{i}b{mid} u{i}c u{i}d", "en", "srcT"))
    d = _fixture_dir(tmp_path, "boiler", {"documents": _docs_table(docs)})
    spec = SPECS["q_llm_boilerplate"]
    out = {r["gram"]: r for r in spec.fn(spark, d).collect()}
    row = out["ha hb hc"]
    assert (row["df"], row["n_docs"]) == (57, 800), "tie construction"
    assert row["doc_share"] == 0.0713
    compare_to_oracle(spark, spec, d)


# ---------------------------------------------------------------------------
# 4. q_llm_minhash_eval — recall 57/800 (deterministic per-pair search)
# ---------------------------------------------------------------------------

def _py_bands(tokens: list[str]) -> list[str]:
    """Replicate the engines' 12-perm / 4x3-band MinHash exactly:
    md5(i || ':' || shingle) first 15 hex chars as int, min per perm,
    band key = comma-joined mins in perm order."""
    sh = {" ".join(tokens[i:i + 3]) for i in range(len(tokens) - 2)}
    sig = [
        min(
            int(hashlib.md5(f"{i}:{s}".encode()).hexdigest()[:15], 16)
            for s in sh
        )
        for i in range(12)
    ]
    return [
        ",".join(str(sig[j]) for j in range(b * 3, b * 3 + 3))
        for b in range(4)
    ]


def test_tie_minhash_eval(spark, tmp_path):
    """800 near-dup truth pairs (J = 29/51 ~ 0.569, disjoint vocab per
    pair), selected deterministically so EXACTLY 57 are banding-caught:
    recall = 57/800 = 0.07125, the diverging tie.  No false positives
    (band keys verified pairwise-distinct across pairs), so precision
    stays 1.0 and n_candidates == tp."""
    caught_pairs, missed_pairs, k = [], [], 0
    all_band_keys: dict[str, int] = {}
    while len(caught_pairs) < 57 or len(missed_pairs) < 743:
        ta = [f"p{k}w{j}" for j in range(42)]
        tb = ta[:31] + [f"p{k}x{j}" for j in range(11)]
        ba, bb = _py_bands(ta), _py_bands(tb)
        hit = any(x == y for x, y in zip(ba, bb))
        pair = (ta, tb, ba, bb)
        if hit and len(caught_pairs) < 57:
            caught_pairs.append(pair)
        elif not hit and len(missed_pairs) < 743:
            missed_pairs.append(pair)
        k += 1
        assert k < 20000, "pair search runaway"
    docs, did = [], 0
    for ta, tb, ba, bb in caught_pairs + missed_pairs:
        for toks, bands in ((ta, ba), (tb, bb)):
            for b, key in enumerate(bands):
                fq = f"{b}|{key}"
                owner = all_band_keys.setdefault(fq, did // 2)
                assert owner == did // 2, "cross-pair band collision"
            docs.append((did, " ".join(toks), "en", "srcA"))
            did += 1
    d = _fixture_dir(tmp_path, "mheval", {"documents": _docs_table(docs)})
    spec = SPECS["q_llm_minhash_eval"]
    row = spec.fn(spark, d).collect()[0]
    assert (row["n_truth"], row["n_candidates"], row["tp"]) == (800, 57, 57)
    assert row["recall"] == 0.0713 and row["precision"] == 1.0
    compare_to_oracle(spark, spec, d)


# ---------------------------------------------------------------------------
# 5. q_llm_perplexity — avg_nll on a 4th-decimal half boundary
# ---------------------------------------------------------------------------

def test_tie_perplexity(spark, tmp_path):
    """One doc 'z z' (a single bigram) scored under tuned corpus counts
    m = c2('z z'), n = c1('z'): its avg_nll IS round6(-ln(m/n)).  Search
    (m, n) so that the 6-decimal NLL (a) ends in micro-digits 50 — a
    4th-decimal half boundary — (b) sits safely off its OWN 6th-decimal
    boundary (1-ulp ln() differences between libm and the JVM must not
    flip the 6-decimal round), and (c) would have split the engines'
    float ROUNDs."""
    pick = None
    for m in range(1, 30):
        for extra in range(1, 1500):
            n = m + extra
            raw = -math.log(m / n)
            scaled = raw * 1e6
            frac = scaled - math.floor(scaled)
            if not (0.05 < frac < 0.45 or 0.55 < frac < 0.95):
                continue  # too close to the 6-decimal boundary
            micro = round(scaled)
            if micro % 100 != 50:
                continue  # not a 4th-decimal half boundary
            v = micro / 1e6
            if _duck_round(v) != _spark_round(v):
                pick = (m, n, micro)
                break
        if pick:
            break
    assert pick, "no diverging (m, n) found in search range"
    m, n, micro = pick
    docs = [(0, "z z", "en", "srcA")]
    docs += [(i, "z z", "en", "srcA") for i in range(1, m)]
    docs += [(m - 1 + i, "z q", "en", "srcA") for i in range(1, n - m + 1)]
    d = _fixture_dir(tmp_path, "ppl", {"documents": _docs_table(docs)})
    spec = SPECS["q_llm_perplexity"]
    out = {r["doc_id"]: r for r in spec.fn(spark, d).collect()}
    want = ((2 * micro + 100) // 200) / 1e4  # exact half-up of the tie
    assert out[0]["avg_nll"] == want
    compare_to_oracle(spark, spec, d)


# ---------------------------------------------------------------------------
# 6. q_llm_embed_pq — avg_sse 57/800 in every subspace
# ---------------------------------------------------------------------------

def test_tie_embed_pq(spark, tmp_path):
    import pyarrow as pa

    vecs = []
    for i in range(16):                       # anchors: 0.1*i in all dims
        vecs.append((i, [0.1 * i] * 64, i % 7))
    for i in range(16, 799):                  # exact copies of anchor 0
        vecs.append((i, [0.0] * 64, i % 7))
    dev = []
    for _ in range(8):                        # d2 = 49 + 4 + 4 = 57 per subspace
        dev += [0.0007, 0.0002, 0.0002, 0.0, 0.0, 0.0, 0.0, 0.0]
    vecs.append((799, dev, 0))
    tbl = pa.table(
        {
            "vec_id": pa.array([v[0] for v in vecs], pa.int64()),
            "embedding": pa.array(
                [v[1] for v in vecs], pa.list_(pa.float32())
            ),
            "label": pa.array([v[2] for v in vecs], pa.int32()),
        }
    )
    d = _fixture_dir(tmp_path, "pq", {"embeddings": tbl})
    spec = SPECS["q_llm_embed_pq"]
    rows = spec.fn(spark, d).collect()
    assert len(rows) == 8
    for r in rows:
        assert r["n_vecs"] == 800
        assert r["avg_sse"] == 0.0713  # half-up of the 57/800 tie
    compare_to_oracle(spark, spec, d)


# ---------------------------------------------------------------------------
# 7. q_graph_pagerank — iteration-1 contribution tie 249/2 micro-units
# ---------------------------------------------------------------------------

def test_tie_pagerank(spark, tmp_path):
    """4016-node bipartite graph: init rank = half_up(1e6/4016) = 249
    micro-units; one customer has degree 2, so its first-iteration
    contribution is 249/2 micro — exactly the measured scale-6
    divergence (DuckDB 0.000124 vs Spark 0.000125 under the old float
    ROUND).  The bigint micro-unit loop gives 125 in both engines."""
    import datetime

    import pyarrow as pa

    t0 = datetime.datetime(1995, 6, 1)
    edges = [(c, c) for c in range(1, 2009)] + [(1, 2)]
    orders, lineitem = [], []
    for k, (c, s) in enumerate(edges, start=1):
        orders.append((k, c))
        lineitem.append((k, s))
    otbl = pa.table(
        {
            "o_orderkey": pa.array([r[0] for r in orders], pa.int64()),
            "o_custkey": pa.array([r[1] for r in orders], pa.int64()),
            "o_orderstatus": pa.array(["O"] * len(orders), pa.string()),
            "o_totalprice": pa.array([100.0] * len(orders), pa.float64()),
            "o_orderdate": pa.array([t0] * len(orders), pa.timestamp("us")),
            "o_orderpriority": pa.array(
                ["1-URGENT"] * len(orders), pa.string()
            ),
        }
    )
    ltbl = pa.table(
        {
            "l_orderkey": pa.array([r[0] for r in lineitem], pa.int64()),
            "l_partkey": pa.array([1] * len(lineitem), pa.int64()),
            "l_suppkey": pa.array([r[1] for r in lineitem], pa.int64()),
            "l_linenumber": pa.array([1] * len(lineitem), pa.int32()),
            "l_quantity": pa.array([1.0] * len(lineitem), pa.float64()),
            "l_extendedprice": pa.array(
                [100.0] * len(lineitem), pa.float64()
            ),
            "l_discount": pa.array([0.0] * len(lineitem), pa.float64()),
            "l_tax": pa.array([0.0] * len(lineitem), pa.float64()),
            "l_returnflag": pa.array(["N"] * len(lineitem), pa.string()),
            "l_linestatus": pa.array(["O"] * len(lineitem), pa.string()),
            "l_shipdate": pa.array(
                [t0] * len(lineitem), pa.timestamp("us")
            ),
        }
    )
    d = _fixture_dir(
        tmp_path, "prtie", {"orders": otbl, "lineitem": ltbl}
    )
    # construction guard: n = 4016 nodes, init = 249 micro (a tie:
    # 1e6/4016 = 249.0039... is NOT the tie — the tie is 249/2 inside
    # iteration 1 via the degree-2 customer node)
    assert (2_000_000 + 4016) // (2 * 4016) == 249
    assert (2 * 249 + 2) // (2 * 2) == 125  # the half-up the engines share
    compare_to_oracle(spark, SPECS["q_graph_pagerank"], d)


# ---------------------------------------------------------------------------
# batch-2 sweep representatives (one per helper path): the same remedy
# was applied to every remaining final-output rational ROUND in the
# registry — these two pin the wide (base-100 long division) helper and
# a count-ratio row end-to-end on crafted ties.
# ---------------------------------------------------------------------------

def test_tie_length_hist(spark, tmp_path):
    """57 of 800 documents in one 10-token-wide length bucket: share =
    57/800 = 0.07125, the diverging tie, through the overflow-safe wide
    helper (signed_ratio_round_sql)."""
    docs = []
    for i in range(57):                                  # bucket_lo = 10
        docs.append((i, " ".join(f"a{i}x{j}" for j in range(12)), "en", "s"))
    for i in range(57, 800):                             # bucket_lo = 20
        docs.append((i, " ".join(f"b{i}x{j}" for j in range(25)), "en", "s"))
    d = _fixture_dir(tmp_path, "lenhist", {"documents": _docs_table(docs)})
    spec = SPECS["q_llm_length_hist"]
    out = {r["bucket_lo"]: r for r in spec.fn(spark, d).collect()}
    assert out[10]["n_docs"] == 57
    assert out[10]["share"] == 0.0713
    compare_to_oracle(spark, spec, d)


def test_tie_dau_wau(spark, tmp_path):
    """One day with DAU=57 inside a trailing window of WAU=800:
    stickiness = 57/800, the diverging tie."""
    import datetime

    t0 = datetime.datetime(2024, 3, 4)
    rows, eid = [], 0
    # day 0: 800 distinct users
    for u in range(800):
        rows.append((eid, t0, u, "view", 1.0))
        eid += 1
    # day 3: 57 of them return -> WAU(day 3) = 800, DAU(day 3) = 57
    for u in range(57):
        rows.append((eid, t0 + datetime.timedelta(days=3), u, "view", 1.0))
        eid += 1
    d = _fixture_dir(tmp_path, "dauwau", {"events": _events_table(rows)})
    spec = SPECS["q_event_dau_wau"]
    out = {r["day"]: r for r in spec.fn(spark, d).collect()}
    day3 = out[(t0 + datetime.timedelta(days=3)).date()]
    assert (day3["dau"], day3["wau"]) == (57, 800)
    assert day3["stickiness"] == 0.0713
    compare_to_oracle(spark, spec, d)


def test_tie_event_bursts(spark, tmp_path):
    """Burst ratio c*n_hist/s_hist = 3*19/800 = 57/800, the diverging
    tie: one event type with 19 history hour-buckets summing 800
    events, then a current bucket of 3.  (The trailing BASELINE itself
    can never tie — every reachable n_hist <= 24 with a 2^a*5^b
    structure scales to an integer — so the ratio is the exposed
    output.)"""
    import datetime

    t0 = datetime.datetime(2024, 3, 1)
    rows, eid = [], 0
    # 19 buckets: 18 of 42 events + 1 of 44 = 800
    sizes = [42] * 18 + [44]
    assert sum(sizes) == 800
    for b, size in enumerate(sizes):
        for k in range(size):
            rows.append((eid, t0 + datetime.timedelta(hours=b, seconds=k),
                         k % 7, "view", 1.0))
            eid += 1
    for k in range(3):  # current bucket: c = 3
        rows.append((eid, t0 + datetime.timedelta(hours=19, seconds=k),
                     k, "view", 1.0))
        eid += 1
    d = _fixture_dir(tmp_path, "bursts", {"events": _events_table(rows)})
    spec = SPECS["q_event_bursts"]
    out = {r["bucket_id"]: r for r in spec.fn(spark, d).collect()}
    row = out[max(out)]
    assert (row["n_events"], row["is_burst"]) == (3, False)
    assert row["burst_ratio"] == 0.0713  # exact half-up of 57/800
    compare_to_oracle(spark, spec, d)


def test_tie_cohens_d_means(spark, tmp_path):
    """mean_purchase = sm1/(100*n1) = 57/800 cents-dollars, the
    diverging tie: 8 purchases totaling 57 cents."""
    import datetime

    t0 = datetime.datetime(2024, 3, 1)
    rows = [(i, t0 + datetime.timedelta(minutes=i), i, "purchase",
             0.57 if i == 0 else 0.0) for i in range(8)]
    rows += [(100 + i, t0 + datetime.timedelta(minutes=i), i, "click",
              1.25) for i in range(4)]
    d = _fixture_dir(tmp_path, "cohend", {"events": _events_table(rows)})
    spec = SPECS["q_agg_cohens_d"]
    row = spec.fn(spark, d).collect()[0]
    assert row["n1"] == 8
    assert row["mean_purchase"] == 0.0713  # exact half-up of 57/800
    compare_to_oracle(spark, spec, d)


def test_tie_markov2(spark, tmp_path):
    """Second-order transition probability n_abc/n_ab = 57/800: the
    context (A, B) occurs 800 times, 57 followed by C, 743 by D."""
    import datetime

    t0 = datetime.datetime(2024, 3, 1)
    rows, eid = [], 0
    for k in range(800):
        for typ in ("A", "B", "C" if k < 57 else "D"):
            rows.append((eid, t0 + datetime.timedelta(seconds=eid),
                         k, "X" + typ, 1.0))
            eid += 1
    d = _fixture_dir(tmp_path, "markov2", {"events": _events_table(rows)})
    spec = SPECS["q_event_markov2"]
    out = {(r["context"], r["next_type"]): r for r in spec.fn(spark, d).collect()}
    row = out[("XA>XB", "XC")]
    assert (row["n_abc"], row["n_ab"]) == (57, 800)
    assert row["p_next"] == 0.0713
    compare_to_oracle(spark, spec, d)


def test_tie_vocab_coverage(spark, tmp_path):
    """Top-10 coverage = 57/800 occurrences: ten head tokens totaling
    57, the remaining 743 occurrences spread over rarer tokens that
    rank strictly below the head."""
    head = []
    for j in range(10):          # counts 6x7 + 5x3 = 57
        head += [f"h{j:02d}"] * (6 if j < 7 else 5)
    tail = []
    k = 0
    while len(tail) < 743:       # counts of 4 rank below every head token
        tail += [f"t{k:04d}"] * min(4, 743 - len(tail))
        k += 1
    docs = [(0, " ".join(head), "en", "s"), (1, " ".join(tail), "en", "s")]
    d = _fixture_dir(tmp_path, "vocab", {"documents": _docs_table(docs)})
    spec = SPECS["q_llm_vocab_coverage"]
    out = {r["k"]: r for r in spec.fn(spark, d).collect()}
    row = out[10]
    assert (row["covered_occurrences"], row["total_occurrences"]) == (57, 800)
    assert row["coverage"] == 0.0713
    assert row["oov_rate"] == 0.9288  # 743/800 = 0.92875, half-up
    compare_to_oracle(spark, spec, d)


def test_tie_filter_funnel(spark, tmp_path):
    """Stage-4 cumulative survival = 57/800: 744 exact copies of one
    good doc (743 die at the dedup stage, 1 survives every gate) plus
    56 more good docs -> 57 survivors of 800."""
    good = "the quick example " * 7  # 21 tokens, has stopword, 21 distinct-ish
    # ensure repetition gate passes: distinct/total >= 0.3
    good = " ".join(f"w{j} the" for j in range(10))  # 20 tokens, 11 distinct
    docs = [(i, good, "en", "s") for i in range(744)]
    docs += [(744 + i, " ".join(f"u{i}x{j} of" for j in range(8)), "en", "s")
             for i in range(56)]
    d = _fixture_dir(tmp_path, "funnel", {"documents": _docs_table(docs)})
    spec = SPECS["q_llm_filter_funnel"]
    out = {r["stage"]: r for r in spec.fn(spark, d).collect()}
    assert (out[4]["n_out"], out[1]["n_in"]) == (57, 800)
    assert out[4]["cum_survival"] == 0.0713
    compare_to_oracle(spark, spec, d)


def test_tie_cusum_chain(spark, tmp_path):
    """The r12 seed-campaign regression (offset 31337007), distilled:
    a CUSUM chain value landing EXACTLY on a 4th-decimal half.  Two
    hourly buckets of one event each (8.0, 1.5425) give mu = 4.77125
    and S_1 = 8.0 - mu - 0.5 = 2.72875 — shortest-repr "...5", where
    float ROUND splits the engines (Spark half-up 2.7288, DuckDB
    fp-scale 2.7287; _spark_round/_duck_round pin both).  The chain
    output is a DOUBLE, not a pure rational, so the remedy is the
    q_time_holt portable-ROUND oracle idiom, not the bigint helpers:
    both engines compute the bit-identical chain double and the oracle
    reproduces Spark's shortest-repr rounding."""
    import datetime

    t0 = datetime.datetime(2024, 3, 1, 12)
    rows = [
        (0, t0, 1, "view", 8.0),
        (1, t0 + datetime.timedelta(hours=1), 2, "view", 1.5425),
    ]
    d = _fixture_dir(tmp_path, "cusum", {"events": _events_table(rows)})
    # the crafted chain value really lands the diverging tie
    assert _spark_round(8.0 - 4.77125 - 0.5) == 2.7288
    assert _duck_round(8.0 - 4.77125 - 0.5) == 2.7287
    spec = SPECS["q_time_cusum"]
    out = sorted(spec.fn(spark, d).collect(), key=lambda r: r["h_us"])
    assert [r["cusum"] for r in out] == [2.7288, 0.0], "tie construction"
    compare_to_oracle(spark, spec, d)
