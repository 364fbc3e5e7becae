"""Accuracy bound for the rows-only HLL row at REAL cardinality.

q_agg_approx_cd is rows-only by design (HLL sketches are
engine-specific, so no DuckDB value oracle exists), and at every
driver SF the per-type cardinality is tiny enough (<=150 distinct)
that approx_count_distinct stays in its exact sparse mode — error 0,
which verifies nothing about the estimator the operator actually
ships for 100 TB.  This test fabricates an events table whose
per-type cardinalities (50k / 20k / 5k) force the dense HLL++ path
and pins the relative error to 3x the requested rsd (0.02 -> 6%),
plus exactness of the accompanying row count.

Full lane: fabricates and writes ~150k rows (see pytest.ini).
"""

from __future__ import annotations

import datetime

import pytest

from weather_etl_spark.registry import load_all

pytestmark = pytest.mark.full  # 150k-row fabrication (see pytest.ini)

SPECS = load_all()

#: (event_type, distinct user_ids, rows) — distinct counts chosen to
#: sit well past the HLL++ sparse->dense switchover.
CARDS = [("view", 50_000, 70_000), ("click", 20_000, 30_000),
         ("purchase", 5_000, 12_000)]


def test_approx_cd_error_bound_at_dense_cardinality(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    t0 = datetime.datetime(2024, 6, 1)
    eids, tss, uids, types, vals = [], [], [], [], []
    eid = 0
    base = 0
    for et, n_users, n_rows in CARDS:
        for i in range(n_rows):
            eids.append(eid)
            # deterministic, collision-rich beyond n_users: wrap around
            tss.append(t0 + datetime.timedelta(seconds=i % 86_400))
            uids.append(base + (i % n_users))
            types.append(et)
            vals.append(float(i % 97))
            eid += 1
        base += n_users  # disjoint user ranges per type
    d = tmp_path / "dense"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(eids, pa.int64()),
                "ts": pa.array(tss, pa.timestamp("us")),
                "user_id": pa.array(uids, pa.int64()),
                "event_type": pa.array(types, pa.string()),
                "value": pa.array(vals, pa.float64()),
            }
        ),
        str(d / "events.parquet"),
    )

    out = {
        r["event_type"]: r
        for r in SPECS["q_agg_approx_cd"].fn(spark, str(d)).collect()
    }
    for et, n_users, n_rows in CARDS:
        r = out[et]
        assert r["n"] == n_rows  # the exact companion count
        rel_err = abs(r["approx_users"] - n_users) / n_users
        assert rel_err <= 0.06, (
            f"{et}: approx {r['approx_users']} vs exact {n_users} "
            f"(rel_err {rel_err:.4f} > 3x rsd)"
        )


#: llm_near_dedup (MLlib MinHashLSH, rows-only — engine-specific hash
#: family) has the same structural guarantee as the ANN rows: an EXACT
#: duplicate text yields an identical shingle set, identical feature
#: vector, identical minhash signature in every table — so the pair is
#: co-bucketed by construction and approxSimilarityJoin MUST emit it at
#: jaccard_dist exactly 0.0, under any corpus.
def test_near_dedup_planted_exact_duplicates(spark, tmp_path):
    import random

    import pyarrow as pa
    import pyarrow.parquet as pq

    from tests.conftest import battery_seed

    rng = random.Random(battery_seed(515151))
    vocab = [f"w{i}" for i in range(300)]
    docs = []
    for did in range(80):
        docs.append(
            (did, " ".join(rng.choice(vocab) for _ in range(40)), "en", "srcA")
        )
    planted = [(100, 0), (101, 7), (102, 33)]  # (dup_id, original_id)
    for dup_id, orig in planted:
        docs.append((dup_id, docs[orig][1], "en", "srcB"))
    d = tmp_path / "neardup"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in docs], pa.int64()),
                "text": pa.array([r[1] for r in docs], pa.string()),
                "lang": pa.array([r[2] for r in docs], pa.string()),
                "source": pa.array([r[3] for r in docs], pa.string()),
                "n_chars": pa.array([len(r[1]) for r in docs], pa.int64()),
            }
        ),
        str(d / "documents.parquet"),
    )
    out = {
        (r["id_a"], r["id_b"]): r["jaccard_dist"]
        for r in SPECS["llm_near_dedup"].fn(spark, str(d)).collect()
    }
    for dup_id, orig in planted:
        pair = (min(orig, dup_id), max(orig, dup_id))
        assert pair in out, f"planted exact duplicate {pair} missed"
        assert out[pair] == 0.0, (pair, out[pair])
