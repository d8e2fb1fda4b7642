"""Structural contracts for queries/llm4.py (containment dedup and
two-stage retrieve-rerank) beyond the value-hash parity the oracle
gate already provides.

The containment test proves COMPLETENESS, not just soundness: the
prefix-32 candidate join finds EVERY containment pair whose shorter
side has >= 32 chars (brute-force ground truth recomputed in pandas),
so the keyed plan loses nothing vs the cross product it replaces. The
rerank test recomputes the expected top-5 per query in numpy under the
same round-to-6dp / tie-on-vec_id rules, proving the broadcast +
cell-join + ranking chain IS exact retrieval within the cell.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from reactive_data_pipeline_spark.queries.llm import _docs, _emb
from reactive_data_pipeline_spark.queries.llm4 import (
    _PK,
    prefix_containment_pairs,
    retrieve_rerank_cell,
)
from reactive_data_pipeline_spark.similarity.centroid import (
    label_centroids,
    nearest_centroid,
)

from .conftest import SF_DIR


def test_containment_pairs_complete_and_sound(spark):
    got = {
        (r.short_id, r.long_id, r.short_chars, r.long_chars)
        for r in prefix_containment_pairs(spark, SF_DIR).collect()
    }
    docs = {
        r.doc_id: r.text
        for r in _docs(spark, SF_DIR).select("doc_id", "text").collect()
        if len(r.text) >= _PK
    }
    ids = sorted(docs)
    expected = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            ta, tb = docs[a], docs[b]
            s, l = (a, b) if len(ta) <= len(tb) else (b, a)
            if docs[l].startswith(docs[s]):
                expected.add((s, l, len(docs[s]), len(docs[l])))
    # Exact set equality: the prefix-keyed join neither invents pairs
    # (soundness: startswith verify) nor misses any (completeness: a
    # containment pair with short side >= _PK must share the key).
    assert got == expected
    assert expected, "fixture must exercise the operator"


def test_containment_plan_is_keyed_join(spark):
    plan = prefix_containment_pairs(spark, SF_DIR)._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" in plan
    assert "pk" in plan  # candidate join keyed by the prefix column


def test_rerank_matches_numpy_within_cell(spark):
    emb = _emb(spark, SF_DIR)
    assigned = {
        r.vec_id: r.assigned_label
        for r in nearest_centroid(emb, label_centroids(emb)).collect()
    }
    vecs = {
        r.vec_id: np.asarray(r.embedding, dtype=np.float64)
        for r in emb.select("vec_id", "embedding").collect()
    }
    out = retrieve_rerank_cell(spark, SF_DIR).collect()
    by_query: dict[int, list] = {}
    for r in out:
        by_query.setdefault(r.query_id, []).append(r)
    queries = [v for v in vecs if v % 100 == 0]
    assert set(by_query) == set(queries)
    for qid in queries:
        cell = assigned[qid]
        qv = vecs[qid]
        scored = []
        for vid, v in vecs.items():
            if vid == qid or assigned[vid] != cell:
                continue
            cos = float(np.dot(qv, v) / (np.linalg.norm(qv) * np.linalg.norm(v)))
            scored.append((-round(cos, 6), vid))
        scored.sort()
        expect = [
            (vid, int(np.round(-c * 1e6)), rank + 1)
            for rank, (c, vid) in enumerate(scored[:5])
        ]
        got = sorted(
            ((r.vec_id, r.cos_e6, r.rank) for r in by_query[qid]),
            key=lambda t: t[2],
        )
        assert got == expect


def _python_bpe(word_counts: dict[str, int], rounds: int):
    """Reference greedy BPE: per round, count adjacent symbol pairs
    weighted by word frequency, merge the (count desc, a, b)-best pair
    greedily left-to-right in every word, report trajectory stats."""
    state = {w: tuple(w) for w in word_counts}
    out = []
    for r in range(1, rounds + 1):
        counts: dict[tuple, int] = {}
        for w, syms in state.items():
            for i in range(len(syms) - 1):
                counts[syms[i], syms[i + 1]] = (
                    counts.get((syms[i], syms[i + 1]), 0) + word_counts[w]
                )
        (a, b), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        for w, syms in state.items():
            merged, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    merged.append(a + b)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            state[w] = tuple(merged)
        types = {s for syms in state.values() for s in syms}
        total = sum(word_counts[w] * len(syms) for w, syms in state.items())
        out.append((r, a, b, c, len(types), total))
    return out


def test_bpe_rounds_match_python_reference(spark):
    from reactive_data_pipeline_spark.functions.text import tokens
    from reactive_data_pipeline_spark.queries.llm4 import (
        _BPE_ROUNDS,
        bpe_train_rounds,
    )

    wc: dict[str, int] = {}
    for r in (
        _docs(spark, SF_DIR).select(F.explode(tokens("text")).alias("w")).collect()
    ):
        wc[r.w] = wc.get(r.w, 0) + 1
    expect = _python_bpe(wc, _BPE_ROUNDS)
    got = sorted(
        (
            (r.round, r.sym_a, r.sym_b, r.pair_count, r.n_types_after, r.corpus_tokens_after)
            for r in bpe_train_rounds(spark, SF_DIR).collect()
        ),
    )
    assert got == expect


def test_bpe_encode_conserves_training_totals(spark):
    from reactive_data_pipeline_spark.queries.llm4 import (
        _BPE_ROUNDS,
        bpe_encode_by_source,
        bpe_train_rounds,
    )

    enc = bpe_encode_by_source(spark, SF_DIR).collect()
    final = next(
        r for r in bpe_train_rounds(spark, SF_DIR).collect()
        if r.round == _BPE_ROUNDS
    )
    # Every corpus word is encoded: the per-source token counts must sum
    # to the final training round's corpus total exactly.
    assert sum(r.n_tokens for r in enc) == final.corpus_tokens_after
    for r in enc:
        # Merges only shrink: token count bounded by chars (and by words
        # from below), so chars-per-token is a genuine ratio >= 1.
        assert r.n_words <= r.n_tokens <= r.n_chars
        assert r.chars_per_token_e6 >= 10**6


def test_bpe_first_round_agrees_with_single_step_query(spark):
    from reactive_data_pipeline_spark.queries.llm2 import bpe_pair_merges
    from reactive_data_pipeline_spark.queries.llm4 import bpe_train_rounds

    top = bpe_pair_merges(spark, SF_DIR).collect()[0]
    r1 = next(r for r in bpe_train_rounds(spark, SF_DIR).collect() if r.round == 1)
    assert r1.sym_a + r1.sym_b == top.pair
    assert r1.pair_count == top.n


def test_cusum_telescopes_to_zero(spark):
    from reactive_data_pipeline_spark.queries.etl import cusum_daily_changepoint

    rows = sorted(
        cusum_daily_changepoint(spark, SF_DIR).collect(), key=lambda r: r.day
    )
    # Sum of scaled deviations over the whole period is D*T - D*T = 0,
    # so the cusum at the last day telescopes to exactly zero.
    assert rows[-1].cusum_scaled == 0
    assert sum(r.is_peak for r in rows) >= 1
    # Each step is exactly D*n_i - T.
    d, t = len(rows), sum(r.n_events for r in rows)
    prev = 0
    for r in rows:
        assert r.cusum_scaled - prev == d * r.n_events - t
        prev = r.cusum_scaled


def test_rerank_ranks_are_contiguous_and_ordered(spark):
    rows = retrieve_rerank_cell(spark, SF_DIR).collect()
    by_query: dict[int, list] = {}
    for r in rows:
        by_query.setdefault(r.query_id, []).append(r)
    for qid, rs in by_query.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= 5
        for prev, cur in zip(rs, rs[1:]):
            assert (prev.cos_e6, -prev.vec_id) >= (cur.cos_e6, -cur.vec_id)
            assert prev.cos_e6 >= cur.cos_e6
