"""Independent validation of the resampling pack and Holt smoothing: a
THIRD implementation (pure numpy + hashlib, no Spark, no DuckDB) replays
the deterministic md5 draws and the recursions from the raw parquet and
must reproduce the engine's numbers exactly (the draws and all money
math are integer-exact by construction)."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
import pytest

from hw_kafka_flink_health_spark.queries import QUERIES

from tests.conftest import SF_DIR

_POISSON_CDF = [
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238463,
    0.9963401531726563,
    0.9994058151824183,
    0.999916758850712,
    0.9999897508033253,
]


def _unit(key: str) -> float:
    return int(hashlib.md5(key.encode()).hexdigest()[:8], 16) / 4294967296.0


def _unit4(key_g: str, s: int) -> float:
    """Slice s (0..3) of one md5 digest — the 4-draws-per-hash scheme the
    resampling queries use (replicate b reads slice b%4 of key:(b//4))."""
    h = hashlib.md5(key_g.encode()).hexdigest()
    return int(h[8 * s : 8 * s + 8], 16) / 4294967296.0


def _poisson(u: float) -> int:
    for k, t in enumerate(_POISSON_CDF):
        if u < t:
            return k
    return 8


@pytest.fixture(scope="module")
def orders_pd():
    return pd.read_parquet(f"{SF_DIR}/orders.parquet")


def test_poisson_bootstrap_ci_matches_hashlib_replay(spark, orders_pd):
    """Replay all 100 replicates row-by-row in pure Python: every weight,
    every replicate mean, and the interpolated CI must equal the engine's
    output (rounded fields compared exactly)."""
    row = QUERIES["stats_poisson_bootstrap_ci"](spark, SF_DIR).toPandas().iloc[0]
    cents = np.round(orders_pd.o_totalprice.to_numpy() * 100).astype(np.int64)
    keys = orders_pd.o_orderkey.to_numpy()
    means = []
    for b in range(100):
        wc = wn = 0
        for k, c in zip(keys, cents):
            w = _poisson(_unit4(f"{k}:{b // 4}:boot", b % 4))
            wc += w * int(c)
            wn += w
        if wn > 0:
            means.append(wc / (100.0 * wn))
    means = np.array(sorted(means))
    assert row["n_replicates"] == len(means)
    assert row["boot_mean"] == round(float(np.mean(means)), 2)

    def q_cont(a, p):
        h = (len(a) - 1) * p
        lo, hi = int(math.floor(h)), int(math.ceil(h))
        return a[lo] + (h - lo) * (a[hi] - a[lo])

    assert row["ci_lo"] == round(q_cont(means, 0.025), 2)
    assert row["ci_hi"] == round(q_cont(means, 0.975), 2)
    assert row["ci_lo"] <= row["boot_mean"] <= row["ci_hi"]
    # the CI must bracket the plain sample mean for this well-behaved data
    assert row["ci_lo"] <= row["sample_mean"] <= row["ci_hi"]


def test_permutation_test_matches_hashlib_replay(spark, orders_pd):
    """Replay all 200 relabelings; the count of replicates at least as
    extreme as the observed gap (and so the p-value) must match."""
    row = QUERIES["stats_permutation_diff_test"](spark, SF_DIR).toPandas().iloc[0]
    sub = orders_pd[orders_pd.o_orderpriority.isin(["1-URGENT", "5-LOW"])]
    cents = np.round(sub.o_totalprice.to_numpy() * 100).astype(np.int64)
    grp = (sub.o_orderpriority == "1-URGENT").to_numpy()
    keys = sub.o_orderkey.to_numpy()
    obs = cents[grp].sum() / (100.0 * grp.sum()) - cents[~grp].sum() / (
        100.0 * (~grp).sum()
    )
    p_a = grp.sum() / len(sub)
    n_extreme = 0
    for b in range(200):
        u = np.array([_unit4(f"{k}:{b // 4}:perm", b % 4) for k in keys])
        in_a = u < p_a
        if in_a.sum() == 0 or (~in_a).sum() == 0:
            continue
        d = cents[in_a].sum() / (100.0 * in_a.sum()) - cents[~in_a].sum() / (
            100.0 * (~in_a).sum()
        )
        if abs(d) >= abs(obs):
            n_extreme += 1
    assert row["n_rows"] == len(sub)
    assert row["obs_diff"] == round(obs, 2)
    assert row["n_extreme_plus1"] == 1 + n_extreme
    assert row["p_value"] == round((1 + n_extreme) / 201.0, 4)


def test_holt_matches_numpy_recursion(spark, orders_pd):
    """Re-run the level/trend recursion in plain Python over the same
    integer-cent month series; every fitted value must match."""
    out = (
        QUERIES["recursive_holt_linear_trend"](spark, SF_DIR)
        .toPandas()
        .sort_values("step")
        .reset_index(drop=True)
    )
    months = (
        orders_pd.assign(
            m=orders_pd.o_orderdate.dt.to_period("M"),
            c=np.round(orders_pd.o_totalprice.to_numpy() * 100).astype(np.int64),
        )
        .groupby("m")["c"]
        .sum()
        .sort_index()
    )
    y = (months.to_numpy() / 100.0).tolist()
    lvl, trd = y[0], 0.0
    expect = [(y[0], lvl, trd)]
    for t in range(1, len(y)):
        new_lvl = 0.4 * y[t] + 0.6 * (lvl + trd)
        trd = 0.3 * (new_lvl - lvl) + 0.7 * trd
        lvl = new_lvl
        expect.append((y[t], lvl, trd))
    assert len(out) == len(expect)
    for i, (ey, el, et) in enumerate(expect):
        assert out.loc[i, "revenue"] == round(ey, 2)
        assert out.loc[i, "level"] == round(el, 2)
        assert out.loc[i, "trend"] == round(et, 2)
        assert out.loc[i, "forecast_next"] == round(el + et, 2)


def test_fellegi_sunter_weights_ordering(spark):
    """Structural invariants: exactly the agreement patterns present, the
    full-agreement pattern scores highest, full-disagreement lowest, and
    score is monotone in the number of agreeing fields."""
    df = QUERIES["linkage_fellegi_sunter"](spark, SF_DIR).toPandas()
    assert set(zip(df.a_band, df.a_dig)) <= {(0, 0), (0, 1), (1, 0), (1, 1)}
    scores = {(r.a_band, r.a_dig): r.score_bits for r in df.itertuples()}
    if (1, 1) in scores and (0, 0) in scores:
        assert scores[(1, 1)] > scores[(0, 0)]
    for one in [(1, 0), (0, 1)]:
        if (1, 1) in scores and one in scores:
            assert scores[(1, 1)] > scores[one]
        if one in scores and (0, 0) in scores:
            assert scores[one] > scores[(0, 0)]
    # u-probabilities are genuine probabilities
    assert ((df.u_band > 0) & (df.u_band <= 1)).all()
    assert ((df.u_dig > 0) & (df.u_dig <= 1)).all()
