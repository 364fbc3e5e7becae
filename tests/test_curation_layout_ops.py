"""Semantic invariants for the curation + layout batch (llm_prep.py
second batch, layout.py) — properties the parity hash can't state:

- markup stripping recovers the original text modulo the
  deterministic ' and ' -> ' & ' entity round-trip (python recheck
  on a sample);
- the encoding audit flags exactly the 0-mod-13 corrupted docs, and
  byte/char arithmetic matches python's UTF-8 encoder;
- sentence stats match a python re-split on a sample;
- token-budget selection IS the greedy prefix: equals a python
  take-while over the full ratio-sorted corpus, never exceeds the
  budget, and adding the best rejected doc would exceed it;
- Z-order cluster bounding boxes are tight (<= 16x16 cells) —
  the data-skipping guarantee — and cluster ids partition the rows;
- compaction groups are contiguous in path order and every closed
  group crosses the target only by its last file.
"""

from __future__ import annotations

import math
import re

import duckdb

from weather_etl_spark.operators.layout import (
    _COMPACT_TARGET,
    _Z_CLUSTER_SHIFT,
)
from weather_etl_spark.operators.llm_prep import (
    _BUDGET_TOKENS,
    _CORRUPT_MOD,
    _REPL,
)
from weather_etl_spark.registry import load_all

SPECS = load_all()


def _docs(sf_dir):
    return duckdb.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet' "
        f"ORDER BY doc_id"
    ).fetchall()


def test_strip_markup_roundtrips_text(spark, sf_dir):
    got = {
        r.doc_id: (r.n_wrapped, r.n_clean, r.clean_prefix)
        for r in SPECS["q_llm_strip_markup"].fn(spark, sf_dir).collect()
    }
    for doc_id, text in _docs(sf_dir)[:50]:
        wrapped = f'<p id="{doc_id}">' + text.replace(" and ", " &amp; ") + "</p>"
        c = re.sub("<[^>]*>", " ", wrapped)
        for ent, ch in (("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">")):
            c = c.replace(ent, ch)
        c = re.sub(" +", " ", c).strip()
        assert got[doc_id] == (len(wrapped), len(c), c[:80])
        # stripping undoes the wrap: clean == original with ' and '
        # replaced by ' & ' (collapsed), if the source had no markup
        assert c == re.sub(" +", " ", text.replace(" and ", " & ")).strip()


def test_encoding_check_flags_exactly_corrupted_docs(spark, sf_dir):
    rows = SPECS["q_llm_encoding_check"].fn(spark, sf_dir).collect()
    texts = dict(_docs(sf_dir))
    assert len(rows) == len(texts)
    for r in rows:
        corrupted = r.doc_id % _CORRUPT_MOD == 0
        x = texts[r.doc_id] + (_REPL + "\x07" if corrupted else "")
        assert r.n_chars == len(x)
        assert r.n_bytes == len(x.encode("utf-8"))
        assert r.has_replacement == corrupted
        want_ctrl = sum(1 for ch in x if 1 <= ord(ch) <= 31)
        assert r.n_ctrl == want_ctrl
        assert r.is_clean == (
            r.n_extra_bytes == 0 and r.n_ctrl == 0 and not r.has_replacement
        )
        if corrupted:
            assert not r.is_clean


def test_sentence_stats_match_python_resplit(spark, sf_dir):
    got = {
        r.doc_id: (r.n_sentences, r.avg_sent_chars, r.max_sent_chars)
        for r in SPECS["q_llm_sentences"].fn(spark, sf_dir).collect()
    }
    for doc_id, text in _docs(sf_dir)[:50]:
        sents = [s for s in re.split(r"[.!?]+", text) if s.strip()]
        if not sents:
            assert doc_id not in got
            continue
        lens = [len(s.strip()) for s in sents]
        n, avg, mx = got[doc_id]
        assert n == len(sents)
        assert math.isclose(avg, sum(lens) / len(lens), abs_tol=5e-4)
        assert mx == max(lens)


def test_token_budget_is_exact_greedy_prefix(spark, sf_dir):
    rows = SPECS["q_llm_token_budget"].fn(spark, sf_dir).collect()
    docs = _docs(sf_dir)
    stats = []
    for doc_id, text in docs:
        toks = text.split(" ")
        stats.append((doc_id, len(toks), len(set(toks)) / len(toks)))
    order = sorted(stats, key=lambda t: (-t[2], t[0]))
    want, cum = [], 0
    for doc_id, n_tok, ratio in order:
        if cum + n_tok > _BUDGET_TOKENS:
            break
        cum += n_tok
        want.append(doc_id)
    got_ids = {r.doc_id for r in rows}
    assert got_ids == set(want), (
        f"selection diverges from greedy prefix: extra="
        f"{sorted(got_ids - set(want))[:5]} "
        f"missing={sorted(set(want) - got_ids)[:5]}"
    )
    total = sum(r.n_tokens for r in rows)
    assert total <= _BUDGET_TOKENS
    if len(want) < len(order):
        # take-while: the next candidate would not have fit
        assert total + order[len(want)][1] > _BUDGET_TOKENS


def test_zorder_boxes_are_tight_and_partition_rows(spark, sf_dir):
    rows = SPECS["q_layout_zorder"].fn(spark, sf_dir).collect()
    cell = 1 << (_Z_CLUSTER_SHIFT // 2)  # 16x16 cells per cluster
    n_total = 0
    for r in rows:
        assert r.bbox_area == (r.max_px - r.min_px + 1) * (
            r.max_sx - r.min_sx + 1
        )
        # Z-order guarantee: a cluster of 2^8 interleaved low bits
        # spans at most a 16x16 aligned cell in (px, sx) space.
        assert r.max_px - r.min_px < cell
        assert r.max_sx - r.min_sx < cell
        n_total += r.n_rows
    n_li = duckdb.sql(
        f"SELECT COUNT(*) FROM '{sf_dir}/lineitem.parquet'"
    ).fetchone()[0]
    assert n_total == n_li


def test_compaction_groups_contiguous_and_sized(spark, sf_dir):
    rows = sorted(
        SPECS["q_layout_compaction"].fn(spark, sf_dir).collect(),
        key=lambda r: (r.source, r.lang),
    )
    # bins are nondecreasing along the path walk (contiguity)
    bins = [r.bin for r in rows]
    assert bins == sorted(bins)
    # python next-fit recheck
    cum = 0
    for r in rows:
        assert r.bin == cum // _COMPACT_TARGET
        cum += r.bytes
    by_bin: dict[int, list] = {}
    for r in rows:
        by_bin.setdefault(r.bin, []).append(r)
    for b, grp in by_bin.items():
        assert all(g.bin_bytes == sum(x.bytes for x in grp) for g in grp)
        assert all(g.bin_files == len(grp) for g in grp)


def test_domain_cap_keeps_exactly_topk_per_source(spark, sf_dir):
    from weather_etl_spark.operators.stats_ext import _DOMAIN_CAP_K

    rows = SPECS["q_llm_domain_cap"].fn(spark, sf_dir).collect()
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    truth = duckdb.sql(
        f"SELECT source, doc_id, n_chars FROM "
        f"'{sf_dir}/documents.parquet' ORDER BY source, n_chars DESC, doc_id"
    ).fetchall()
    want: dict[str, list] = {}
    for src, doc_id, n_chars in truth:
        if len(want.setdefault(src, [])) < _DOMAIN_CAP_K:
            want[src].append(doc_id)
    assert set(by_src) == set(want)
    for src, grp in by_src.items():
        grp.sort(key=lambda r: r.rk)
        assert [r.doc_id for r in grp] == want[src]
        assert [r.rk for r in grp] == list(range(1, len(grp) + 1))


def test_corr_matrix_matches_python(spark, sf_dir):
    rows = SPECS["q_agg_corr_matrix"].fn(spark, sf_dir).collect()
    import statistics

    for r in rows:
        data = duckdb.sql(
            f"SELECT l_quantity, l_extendedprice FROM "
            f"'{sf_dir}/lineitem.parquet' WHERE l_returnflag = '{r.l_returnflag}'"
        ).fetchall()
        want = statistics.correlation(
            [x for x, _ in data], [y for _, y in data]
        )
        assert math.isclose(r.corr_qty_price, want, abs_tol=5e-4)
        assert r.n == len(data)
        for c in (r.corr_qty_disc, r.corr_price_tax, r.corr_disc_tax):
            assert -1.0 <= c <= 1.0


def test_weighted_median_crossing_rule(spark, sf_dir):
    rows = SPECS["q_agg_weighted_median"].fn(spark, sf_dir).collect()
    for r in rows:
        data = sorted(
            duckdb.sql(
                f"SELECT l_extendedprice, l_quantity FROM "
                f"'{sf_dir}/lineitem.parquet' "
                f"WHERE l_returnflag = '{r.l_returnflag}'"
            ).fetchall()
        )
        total = sum(w for _, w in data)
        assert math.isclose(r.total_weight, round(total, 4), abs_tol=1e-3)
        cum = 0.0
        for price, w in data:
            cum += w
            if 2 * cum >= total:
                assert math.isclose(
                    r.weighted_median_price, round(price, 4), abs_tol=1e-3
                )
                break
        # at least half the weight sits at or below the median price
        below = sum(w for p, w in data if p <= r.weighted_median_price + 1e-9)
        assert 2 * below >= total - 1e-6


def test_gram_novelty_first_doc_scores_one_on_unique_text(spark, sf_dir):
    rows = {r.doc_id: r for r in
            SPECS["q_llm_gram_novelty"].fn(spark, sf_dir).collect()}
    from weather_etl_spark.operators.llm_prep import _NOVEL_GRAM

    # python recheck on the first 80 docs in id order (novelty is
    # defined against ALL lower ids, so walk the full corpus)
    seen: set[str] = set()
    for doc_id, text in _docs(sf_dir):
        toks = text.split(" ")
        grams = {
            " ".join(toks[i : i + _NOVEL_GRAM])
            for i in range(len(toks) - _NOVEL_GRAM + 1)
        }
        if not grams:
            assert doc_id not in rows
            continue
        novel = {g for g in grams if g not in seen}
        seen |= grams
        if doc_id not in rows:
            continue
        r = rows[doc_id]
        assert r.n_grams == len(grams)
        assert r.n_novel == len(novel)
        assert math.isclose(
            r.novelty, round(len(novel) / len(grams), 4), abs_tol=1e-3
        )
    # the lowest doc_id is all-novel by definition
    first = min(rows)
    assert rows[first].novelty == 1.0


def test_readability_matches_python_formula(spark, sf_dir):
    rows = {r.doc_id: r for r in
            SPECS["q_llm_readability"].fn(spark, sf_dir).collect()}
    for doc_id, text in _docs(sf_dir)[:60]:
        words = [w for w in text.split(" ") if w]
        sents = [s for s in re.split(r"[.!?]+", text) if s.strip()]
        sylls = re.findall(r"[aeiouy]+", text.lower())
        if not words or not sents:
            assert doc_id not in rows
            continue
        r = rows[doc_id]
        assert (r.n_words, r.n_sents, r.n_syll) == (
            len(words), len(sents), len(sylls),
        )
        want = (
            206.835
            - 1.015 * (len(words) / len(sents))
            - 84.6 * (len(sylls) / len(words))
        )
        assert math.isclose(r.flesch, want, abs_tol=5e-4)


def test_token_budget_bin_trick_random_differential(spark, tmp_path):
    """The bin-ledger decomposition must equal pure greedy take-while
    on ADVERSARIAL data: random token counts, ratio collisions, and
    docs far larger than the budget remainder. Random but seeded
    corpora are written to parquet and run through the real operator."""
    import random

    import pandas as pd

    from weather_etl_spark.operators.llm_prep import _BUDGET_TOKENS

    rng = random.Random(42)
    for trial in range(3):
        words = [f"w{i}" for i in range(40)]
        rows = []
        for doc_id in range(400):
            n = rng.randint(1, 120)
            # force ratio collisions: half the docs reuse few words
            pool = words[:4] if rng.random() < 0.5 else words
            text = " ".join(rng.choice(pool) for _ in range(n))
            rows.append((doc_id, text, "en", "s", len(text)))
        pdf = pd.DataFrame(
            rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
        )
        d = tmp_path / f"budget{trial}"
        d.mkdir()
        pdf.to_parquet(d / "documents.parquet")
        got = {
            r.doc_id
            for r in SPECS["q_llm_token_budget"].fn(spark, str(d)).collect()
        }
        stats = []
        for doc_id, text, *_ in rows:
            toks = text.split(" ")
            stats.append((doc_id, len(toks), len(set(toks)) / len(toks)))
        order = sorted(stats, key=lambda t: (-t[2], t[0]))
        want, cum = set(), 0
        for doc_id, n_tok, _ in order:
            if cum + n_tok > _BUDGET_TOKENS:
                break
            cum += n_tok
            want.add(doc_id)
        assert got == want, f"trial {trial}: bin trick != greedy prefix"


def test_spatial_grid_matches_python_all_pairs(spark, sf_dir):
    from weather_etl_spark.operators.layout import _SPATIAL_EPS

    rows = SPECS["q_join_spatial_grid"].fn(spark, sf_dir).collect()
    pts = duckdb.sql(
        f"SELECT vec_id, CAST(embedding[1] AS DOUBLE), "
        f"CAST(embedding[2] AS DOUBLE) "
        f"FROM '{sf_dir}/embeddings.parquet'"
    ).fetchall()
    want = {}
    for i, (ida, xa, ya) in enumerate(pts):
        for idb, xb, yb in pts[i + 1 :]:
            d2 = (xa - xb) ** 2 + (ya - yb) ** 2
            if d2 <= _SPATIAL_EPS * _SPATIAL_EPS:
                a, b = min(ida, idb), max(ida, idb)
                want[(a, b)] = math.sqrt(d2)
    got = {(r.id_a, r.id_b): r.dist for r in rows}
    assert set(got) == set(want), (
        f"grid join missed {len(set(want) - set(got))} pairs, "
        f"invented {len(set(got) - set(want))}"
    )
    for k, d in got.items():
        assert r_close(d, want[k])
        assert k[0] < k[1]
    assert len(got) == len(rows), "pair emitted more than once"
    assert got, "eps produced no pairs — fixture no longer exercises this"


def r_close(a, b):
    return math.isclose(a, round(b, 4), abs_tol=1e-3)


def test_winsorize_bounds_and_means(spark, sf_dir):
    rows = SPECS["q_agg_winsorize"].fn(spark, sf_dir).collect()
    for r in rows:
        data = [
            v
            for (v,) in duckdb.sql(
                f"SELECT l_extendedprice FROM '{sf_dir}/lineitem.parquet' "
                f"WHERE l_returnflag = '{r.l_returnflag}'"
            ).fetchall()
        ]
        data.sort()
        n = len(data)
        assert r.n == n

        def q(p):
            idx = p * (n - 1)
            lo, hi = int(math.floor(idx)), int(math.ceil(idx))
            return data[lo] + (data[hi] - data[lo]) * (idx - lo)

        p05, p95 = q(0.05), q(0.95)
        assert r.n_clipped_low == sum(1 for v in data if v < p05)
        assert r.n_clipped_high == sum(1 for v in data if v > p95)
        mean_raw = sum(data) / n
        mean_w = sum(min(max(v, p05), p95) for v in data) / n
        assert math.isclose(r.mean_raw, mean_raw, abs_tol=1e-2)
        assert math.isclose(r.mean_winsorized, mean_w, abs_tol=1e-2)
        # winsorizing must pull the mean toward the median, never past
        # the clip bounds
        assert p05 <= r.mean_winsorized <= p95


def test_feature_hash_conserves_tokens_and_bounds_features(spark, sf_dir):
    from weather_etl_spark.operators.stats_ext import _FEAT_BUCKETS

    rows = SPECS["q_llm_feature_hash"].fn(spark, sf_dir).collect()
    by_doc: dict[int, int] = {}
    for r in rows:
        assert 0 <= r.feature < _FEAT_BUCKETS
        assert r.weight >= 1
        by_doc[r.doc_id] = by_doc.get(r.doc_id, 0) + r.weight
    # total weight per doc == its token count (mass conservation)
    truth = dict(
        duckdb.sql(
            f"SELECT doc_id, len(list_filter(string_split(text, ' '), "
            f"x -> x <> '')) FROM '{sf_dir}/documents.parquet'"
        ).fetchall()
    )
    assert by_doc == {d: n for d, n in truth.items() if n > 0}


def test_prefix_dup_finds_exactly_the_salted_extensions(spark, sf_dir):
    from weather_etl_spark.operators.llm_prep import _PREFIX_EXT_MOD

    rows = SPECS["q_llm_prefix_dup"].fn(spark, sf_dir).collect()
    texts = dict(_docs(sf_dir))
    # python ground truth over the same salted corpus
    corpus = dict(texts)
    for doc_id, text in texts.items():
        if doc_id % _PREFIX_EXT_MOD == 0:
            corpus[doc_id + 1000000] = text + " extended suffix content"
    want = set()
    items = sorted(corpus.items())
    for ida, ta in items:
        for idb, tb in items:
            if ida != idb and len(ta) < len(tb) and tb.startswith(ta):
                want.add((ida, idb))
    got = {(r.short_id, r.long_id) for r in rows}
    assert got == want
    assert len(rows) == len(got), "pair emitted more than once"
    # every salted twin is found
    for doc_id in texts:
        if doc_id % _PREFIX_EXT_MOD == 0:
            assert (doc_id, doc_id + 1000000) in got
    for r in rows:
        assert r.short_len < r.long_len
