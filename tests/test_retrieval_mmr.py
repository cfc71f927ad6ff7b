"""Property tests for the MMR diversity re-rank: the inline greedy loop
must match an independent brute-force reference on random inputs, and the
selection must satisfy MMR's structural invariants."""

from __future__ import annotations

import math

import numpy as np
import pytest

from pyspark.sql import functions as F

from hw_kafka_flink_health_spark.queries import QUERIES


def _brute_force_mmr(vecs: dict[int, np.ndarray], k_cand: int, k_sel: int):
    """Independent reference: same spec (top-k_cand candidates for vec 0
    by round(cos,6) desc/id, greedy 0.7*rel - 0.3*max-sim, ties to the
    lowest id), written against numpy instead of Spark/SQL."""

    def cos(a, b):
        return float(np.dot(a, b) / (math.sqrt(np.dot(a, a)) * math.sqrt(np.dot(b, b))))

    q = vecs[0]
    rel = {
        i: round(cos(v, q), 6) for i, v in vecs.items() if i != 0
    }
    cand = sorted(rel, key=lambda i: (-rel[i], i))[:k_cand]
    pw = {
        (a, b): round(cos(vecs[a], vecs[b]), 6)
        for a in cand
        for b in cand
        if a != b
    }
    sel = []
    remaining = set(cand)
    while remaining and len(sel) < k_sel:
        best = None
        for c in sorted(remaining):
            pen = max((pw[(c, s)] for s, *_ in sel), default=0.0)
            score = 0.7 * rel[c] - 0.3 * pen
            if best is None or (-score, c) < (-best[1], best[0]):
                best = (c, score, pen)
        sel.append(best)
        remaining.discard(best[0])
    return [(i + 1, c, rel[c], pen) for i, (c, _, pen) in enumerate(sel)]


@pytest.mark.parametrize("seed,n,dim", [(7, 30, 8), (11, 60, 16), (23, 12, 4)])
@pytest.mark.slow  # ~21 s brute-force matrix; full-suite tier
def test_mmr_matches_brute_force_reference(spark, tmp_path, seed, n, dim):
    rng = np.random.default_rng(seed)
    vecs = {i: rng.normal(size=dim).astype(np.float32) for i in range(n)}
    rows = [(i, v.tolist(), 0) for i, v in vecs.items()]
    base = str(tmp_path / f"mmr{seed}")
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(f"{base}/embeddings.parquet")

    got = sorted(
        QUERIES["retrieval_mmr_rerank"](spark, base).collect(),
        key=lambda r: r["step"],
    )
    want = _brute_force_mmr(
        {i: v.astype(np.float64) for i, v in vecs.items()}, 20, 8
    )
    assert [(r["step"], r["vec_id"]) for r in got] == [(s, c) for s, c, _, _ in want]
    for r, (_, _, rel, pen) in zip(got, want):
        assert abs(r["rel"] - rel) < 1e-9, (r, rel)
        assert abs(r["max_sim_selected"] - pen) < 1e-9, (r, pen)
    # structural invariants: no repeats; mmr_score non-increasing (the
    # feasible max can only shrink as the penalty set grows)
    ids = [r["vec_id"] for r in got]
    assert len(ids) == len(set(ids))
    scores = [r["mmr_score"] for r in got]
    assert all(a >= b - 1e-12 for a, b in zip(scores, scores[1:]))


def test_mmr_fewer_candidates_than_selections(spark, tmp_path):
    """A 4-vector corpus (3 candidates) must emit 3 picks, not crash."""
    rng = np.random.default_rng(3)
    rows = [(i, rng.normal(size=4).astype(float).tolist(), 0) for i in range(4)]
    base = str(tmp_path / "mmr_small")
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(f"{base}/embeddings.parquet")
    out = QUERIES["retrieval_mmr_rerank"](spark, base)
    assert out.count() == 3
    assert out.agg(F.max("step")).first()[0] == 3
