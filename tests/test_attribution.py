"""Independent validation of the exact Shapley attribution: a pure
pandas/itertools replay of the coalition game from the raw parquet must
reproduce phi exactly, and the game-theoretic axioms must hold."""

from __future__ import annotations

from itertools import combinations

import pandas as pd
import pytest

from hw_kafka_flink_health_spark.queries import QUERIES

from tests.conftest import SF_DIR

CHANNELS = {"view": 1, "click": 2, "signup": 4, "error": 8}


@pytest.fixture(scope="module")
def events_pd():
    return pd.read_parquet(f"{SF_DIR}/events.parquet")


def _game(events_pd):
    """conv(mask) and the zeta transform v(T) computed independently."""
    ev = events_pd[events_pd.user_id.notna()]
    t_p = (
        ev[ev.event_type == "purchase"].groupby("user_id").ts.min().rename("t_p")
    )
    touched = ev.join(t_p, on="user_id", how="inner")
    touched = touched[touched.ts < touched.t_p]
    masks = (
        touched.groupby("user_id")
        .event_type.agg(lambda s: sum(CHANNELS.get(t, 0) for t in set(s)))
        .rename("mask")
    )
    conv = masks.value_counts().to_dict()
    v = {T: sum(c for S, c in conv.items() if (S & T) == S) for T in range(16)}
    return conv, v


def test_shapley_matches_bruteforce_replay(spark, events_pd):
    df = (
        QUERIES["attribution_shapley"](spark, SF_DIR)
        .toPandas()
        .set_index("channel")
    )
    _, v = _game(events_pd)
    w24 = {0: 6, 1: 2, 2: 2, 3: 6}
    for name, bit in CHANNELS.items():
        others = [b for b in CHANNELS.values() if b != bit]
        phi24 = 0
        for r in range(4):
            for combo in combinations(others, r):
                T = sum(combo)
                phi24 += w24[bin(T).count("1")] * (v[T | bit] - v[T])
        assert df.loc[name, "phi_24ths"] == phi24, name
        assert df.loc[name, "shapley_conversions"] == round(phi24 / 24.0, 4)


def test_shapley_efficiency_axiom(spark, events_pd):
    """sum of phi over channels == v(grand coalition) - v(empty set),
    exactly (in 24ths — no float tolerance needed)."""
    df = QUERIES["attribution_shapley"](spark, SF_DIR).toPandas()
    _, v = _game(events_pd)
    assert df.phi_24ths.sum() == 24 * (v[15] - v[0])
