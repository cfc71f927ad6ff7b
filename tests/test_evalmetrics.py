"""Independent numpy validation of the classifier-eval pack: recompute
AUC / PR / calibration from the raw parquet with a third implementation
(row-level sort, not the engine's distinct-value reduction)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from hw_kafka_flink_health_spark.queries import QUERIES

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def scored_pd():
    import hashlib

    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    docs = docs[docs.n_chars.notna()]
    score = ((docs.n_chars - 100) / 500.0).clip(0.05, 0.95)
    u = docs.doc_id.map(
        lambda d: int(hashlib.md5(f"{d}lbl".encode()).hexdigest()[:8], 16)
        / 4294967296.0
    )
    label = (u < score).astype(int)
    return pd.DataFrame({"label": label.to_numpy(), "score": score.to_numpy()})


def _auc_numpy(label: np.ndarray, score: np.ndarray) -> float:
    """Rank AUC with tie half-credit via average ranks (scipy-free)."""
    order = np.argsort(score, kind="mergesort")
    ranks = np.empty(len(score), dtype=float)
    s = score[order]
    i = 0
    while i < len(s):
        j = i
        while j + 1 < len(s) and s[j + 1] == s[i]:
            j += 1
        ranks[order[i : j + 1]] = (i + j) / 2.0 + 1.0
        i = j + 1
    n_pos = int(label.sum())
    n_neg = len(label) - n_pos
    r_pos = ranks[label == 1].sum()
    return (r_pos - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg)


def test_auc_matches_numpy(spark, scored_pd):
    row = QUERIES["eval_auc_roc"](spark, SF_DIR).collect()[0]
    assert row.n_pos == int(scored_pd.label.sum())
    assert row.n_neg == len(scored_pd) - row.n_pos
    auc = _auc_numpy(scored_pd.label.to_numpy(), scored_pd.score.to_numpy())
    assert 0.0 <= row.auc <= 1.0
    assert row.auc == pytest.approx(auc, abs=1e-5)
    # the length-ramp true-probability construction genuinely separates
    # the classes: AUC must beat chance by a wide margin, else the worked
    # example is meaningless
    assert row.auc > 0.7


def test_pr_curve_matches_numpy(spark, scored_pd):
    out = (
        QUERIES["eval_pr_curve"](spark, SF_DIR)
        .toPandas()
        .sort_values("threshold", ascending=False)
        .reset_index(drop=True)
    )
    lab, sc = scored_pd.label.to_numpy(), scored_pd.score.to_numpy()
    n_pos = lab.sum()
    for _, r in out.head(25).iterrows():
        tp = int(((sc >= r.threshold) & (lab == 1)).sum())
        fp = int(((sc >= r.threshold) & (lab == 0)).sum())
        assert (r.tp, r.fp) == (tp, fp)
        assert r.precision == pytest.approx(tp / (tp + fp), abs=1e-6)
        assert r.recall == pytest.approx(tp / n_pos, abs=1e-6)
    # curve invariants: recall non-decreasing as threshold drops; the
    # last point (lowest threshold) predicts everything -> recall 1
    assert (out.recall.diff().dropna() >= -1e-12).all()
    assert out.recall.iloc[-1] == pytest.approx(1.0)


def test_confusion_consistency(spark, scored_pd):
    rows = QUERIES["eval_confusion_thresholds"](spark, SF_DIR).collect()
    assert {round(r.th, 2) for r in rows} == {0.3, 0.5, 0.7}
    n = len(scored_pd)
    for r in rows:
        assert r.tp + r.fp + r.fn + r.tn == n
        if r.precision is not None:
            assert r.precision == pytest.approx(r.tp / (r.tp + r.fp), abs=1e-6)
        assert r.recall == pytest.approx(r.tp / (r.tp + r.fn), abs=1e-6)


def test_calibration_bins_partition_data(spark, scored_pd):
    rows = QUERIES["eval_calibration_bins"](spark, SF_DIR).collect()
    assert sum(r.n for r in rows) == len(scored_pd)
    for r in rows:
        assert 0 <= r.bin <= 9
        # mean score of a bin lies inside the bin (modulo the top clamp)
        lo, hi = r.bin / 10.0, (r.bin + 1) / 10.0 if r.bin < 9 else 1.01
        assert lo - 1e-9 <= r.mean_score <= hi + 1e-9
        assert 0.0 <= r.pos_rate <= 1.0
