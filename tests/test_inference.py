"""Independent validation of the inference pack: recompute every
statistic with numpy/pure-Python from the raw parquet (a third
implementation, independent of both Spark and the DuckDB oracle) and
check invariants the algebra must satisfy."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from hw_kafka_flink_health_spark.queries import QUERIES

from tests.conftest import SF_DIR

URGENT, LOW = "1-URGENT", "5-LOW"


@pytest.fixture(scope="module")
def orders_pd():
    return pd.read_parquet(f"{SF_DIR}/orders.parquet")


@pytest.fixture(scope="module")
def two_groups(orders_pd):
    a = orders_pd.loc[orders_pd.o_orderpriority == URGENT, "o_totalprice"].to_numpy()
    b = orders_pd.loc[orders_pd.o_orderpriority == LOW, "o_totalprice"].to_numpy()
    return a, b


def _avg_ranks(pooled: np.ndarray) -> np.ndarray:
    """Average ranks (1-based, ties share the mean rank) — reference
    implementation via argsort, deliberately different from the
    cumulative-count formulation the engine uses."""
    order = np.argsort(pooled, kind="mergesort")
    ranks = np.empty(len(pooled), dtype=float)
    i = 0
    sorted_vals = pooled[order]
    while i < len(pooled):
        j = i
        while j + 1 < len(pooled) and sorted_vals[j + 1] == sorted_vals[i]:
            j += 1
        ranks[order[i : j + 1]] = (i + j) / 2.0 + 1.0
        i = j + 1
    return ranks


def test_welch_ttest_matches_numpy(spark, two_groups):
    a, b = two_groups
    row = QUERIES["stats_welch_ttest"](spark, SF_DIR).collect()[0]
    va, vb = a.var(ddof=1), b.var(ddof=1)
    se2 = va / len(a) + vb / len(b)
    t_exp = (a.mean() - b.mean()) / math.sqrt(se2)
    df_exp = se2**2 / (
        (va / len(a)) ** 2 / (len(a) - 1) + (vb / len(b)) ** 2 / (len(b) - 1)
    )
    assert row.n_a == len(a) and row.n_b == len(b)
    assert row.t_stat == pytest.approx(t_exp, abs=1e-4)
    assert row.welch_df == pytest.approx(df_exp, abs=0.01)


def test_mannwhitney_matches_numpy(spark, two_groups):
    a, b = two_groups
    row = QUERIES["stats_mannwhitney_u"](spark, SF_DIR).collect()[0]
    pooled = np.concatenate([a, b])
    ranks = _avg_ranks(pooled)
    r_a = ranks[: len(a)].sum()
    u_a = r_a - len(a) * (len(a) + 1) / 2.0
    assert row.u_a == pytest.approx(u_a, abs=1e-6)
    assert row.u_b == pytest.approx(len(a) * len(b) - u_a, abs=1e-6)
    # invariant: U_a + U_b == n_a * n_b
    assert row.u_a + row.u_b == pytest.approx(row.n_a * row.n_b, abs=1e-6)
    # no ties in real data -> z should match the untied normal approx
    n, m = len(a), len(b)
    z_exp = (u_a - n * m / 2.0) / math.sqrt(n * m * (n + m + 1) / 12.0)
    assert row.z_stat == pytest.approx(z_exp, abs=1e-3)


def test_ks_matches_numpy(spark, two_groups):
    a, b = two_groups
    row = QUERIES["stats_ks_two_sample"](spark, SF_DIR).collect()[0]
    grid = np.unique(np.concatenate([a, b]))
    fa = np.searchsorted(np.sort(a), grid, side="right") / len(a)
    fb = np.searchsorted(np.sort(b), grid, side="right") / len(b)
    d_exp = np.abs(fa - fb).max()
    assert 0.0 <= row.ks_d <= 1.0
    assert row.ks_d == pytest.approx(d_exp, abs=1e-6)
    # location attains the max gap
    i = int(np.argmax(np.abs(fa - fb)))
    assert row.ks_location == pytest.approx(round(float(grid[i]), 2), abs=1e-6)


def test_spearman_matches_numpy(spark, orders_pd):
    out = {
        r.o_orderpriority: r
        for r in QUERIES["stats_spearman_rho"](spark, SF_DIR).collect()
    }
    for prio, grp in orders_pd.groupby("o_orderpriority"):
        rp = _avg_ranks(grp.o_totalprice.to_numpy())
        rd = _avg_ranks(grp.o_orderdate.astype("int64").to_numpy())
        rho_exp = np.corrcoef(rp, rd)[0, 1]
        row = out[prio]
        assert row.n == len(grp)
        assert -1.0 <= row.spearman_rho <= 1.0
        assert row.spearman_rho == pytest.approx(rho_exp, abs=1e-4)


def test_anova_matches_numpy(spark, orders_pd):
    row = QUERIES["stats_anova_f"](spark, SF_DIR).collect()[0]
    groups = [
        g.o_totalprice.to_numpy() for _, g in orders_pd.groupby("o_orderpriority")
    ]
    all_v = np.concatenate(groups)
    gm = all_v.mean()
    ssb = sum(len(g) * (g.mean() - gm) ** 2 for g in groups)
    ssw = sum(((g - g.mean()) ** 2).sum() for g in groups)
    k, n = len(groups), len(all_v)
    f_exp = (ssb / (k - 1)) / (ssw / (n - k))
    assert row.k == k and row.big_n == n
    assert row.f_stat == pytest.approx(f_exp, abs=1e-3)
    assert row.eta_sq == pytest.approx(ssb / (ssb + ssw), abs=1e-4)


def test_recursive_month_spine_is_gapless(spark, orders_pd):
    rows = sorted(
        QUERIES["recursive_month_spine_revenue"](spark, SF_DIR).collect(),
        key=lambda r: r.month_start,
    )
    months = [r.month_start for r in rows]
    # consecutive calendar months, no gaps, endpoints = data min/max month
    for prev, cur in zip(months, months[1:]):
        nxt = (prev.replace(day=1) + pd.DateOffset(months=1)).to_pydatetime()
        assert cur == nxt, f"gap between {prev} and {cur}"
    assert months[0] == orders_pd.o_orderdate.min().to_period("M").to_timestamp()
    assert months[-1] == orders_pd.o_orderdate.max().to_period("M").to_timestamp()
    # gap-filled months carry explicit zeros
    assert all(r.n_orders >= 0 and r.revenue >= 0.0 for r in rows)
    # total revenue conserved
    assert sum(r.revenue for r in rows) == pytest.approx(
        orders_pd.o_totalprice.sum(), rel=1e-9
    )


def test_recursive_hierarchy_conserves_root(spark, orders_pd):
    part = pd.read_parquet(f"{SF_DIR}/part.parquet")
    rows = {
        r.ancestor: r
        for r in QUERIES["recursive_part_hierarchy_rollup"](spark, SF_DIR).collect()
    }
    # ancestor 1 is the root: every part with key >= 1 descends from it
    assert rows[1].n_desc == (part.p_partkey >= 1).sum()
    # children partition the parent (minus the parent node itself)
    for parent in (1, 2, 3, 4, 5, 6, 7):
        assert (
            rows[parent].n_desc
            == rows[2 * parent].n_desc + rows[2 * parent + 1].n_desc + 1
        )
        assert rows[parent].subtree_price == pytest.approx(
            round(
                float(
                    part.loc[part.p_partkey == parent, "p_retailprice"].iloc[0]
                    + 0.0
                ),
                2,
            )
            + rows[2 * parent].subtree_price
            + rows[2 * parent + 1].subtree_price,
            abs=0.05,
        )


def test_range_frame_matches_pandas(spark):
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    out = QUERIES["window_range_interval_frame"](spark, SF_DIR).toPandas()
    # pandas reference: per user, trailing 3600 s inclusive window
    # unit-safe epoch seconds (parquet may surface ns or us resolution)
    ev = ev.assign(ts_s=ev.ts.astype("datetime64[s]").astype("int64"))
    sample_users = ev.user_id.drop_duplicates().head(5)
    for uid in sample_users:
        g = ev[ev.user_id == uid].sort_values("ts_s")
        got = out[out.user_id == uid].set_index("event_id")
        for _, r in g.iterrows():
            in_win = g[(g.ts_s >= r.ts_s - 3600) & (g.ts_s <= r.ts_s)]
            assert got.loc[r.event_id, "cnt_1h"] == len(in_win)
            expect = in_win.value.mean()
            actual = got.loc[r.event_id, "avg_1h"]
            if pd.isna(expect):  # all-NULL window: engines emit NULL avg
                assert pd.isna(actual)
            else:
                assert actual == pytest.approx(round(float(expect), 4), abs=1e-6)


def test_drawdown_invariants(spark):
    rows = sorted(
        QUERIES["orders_drawdown_daily"](spark, SF_DIR).collect(),
        key=lambda r: r.day,
    )
    peak = 0.0
    for r in rows:
        peak = max(peak, r.cum_revenue)
        assert r.drawdown >= 0.0
        assert r.drawdown == pytest.approx(peak - r.cum_revenue, abs=0.02)
        if r.drawdown_frac is not None:
            assert 0.0 <= r.drawdown_frac <= 1.0
    # cumulative sum is monotone in cum - drawdown reconstruction
    assert rows[0].drawdown == 0.0
