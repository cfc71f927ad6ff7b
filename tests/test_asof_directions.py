"""asof_join direction semantics: backward / forward / nearest, pinned
against pandas merge_asof's rules (backward = latest <=, forward =
earliest >=, nearest = closer side with backward winning exact ties).
All three run the same single-shuffle union+window plan — these tests
pin the tie and missing-side rules that plan must reproduce."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from hw_kafka_flink_health_spark.operators.relational import asof_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _mk(spark):
    left = spark.createDataFrame(
        [
            (1, "u", _ts("2024-01-01T10:00:00")),  # between clicks
            (2, "u", _ts("2024-01-01T12:00:00")),  # exactly on a click
            (3, "u", _ts("2024-01-01T00:00:00")),  # before all clicks
            (4, "u", _ts("2024-01-01T23:00:00")),  # after all clicks
            (5, "v", _ts("2024-01-01T10:00:00")),  # key with no clicks
            (6, "u", _ts("2024-01-01T10:30:00")),  # exact midpoint tie
        ],
        "event_id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u", _ts("2024-01-01T09:00:00"), 9.0),
            ("u", _ts("2024-01-01T12:00:00"), 12.0),
        ],
        "user_id string, ts timestamp, val double",
    )
    return left, right


def _run(spark, direction):
    left, right = _mk(spark)
    out = asof_join(
        left,
        right,
        on="user_id",
        ts_col="ts",
        value_cols=["val"],
        right_ts_alias="match_ts",
        direction=direction,
    )
    return {r["event_id"]: r["val"] for r in out.collect()}


def test_asof_backward(spark):
    got = _run(spark, "backward")
    assert got == {1: 9.0, 2: 12.0, 3: None, 4: 12.0, 5: None, 6: 9.0}


def test_asof_forward(spark):
    got = _run(spark, "forward")
    assert got == {1: 12.0, 2: 12.0, 3: 9.0, 4: None, 5: None, 6: 12.0}


def test_asof_nearest(spark):
    # event 1 (10:00): 1h back vs 2h fwd -> 9.0; event 6 (10:30) is the
    # EXACT midpoint (90 min both ways) -> backward wins the tie -> 9.0;
    # events 3/4 have only one side; event 5 has none.
    got = _run(spark, "nearest")
    assert got == {1: 9.0, 2: 12.0, 3: 9.0, 4: 12.0, 5: None, 6: 9.0}


def test_asof_rejects_unknown_direction(spark):
    left, right = _mk(spark)
    import pytest

    with pytest.raises(ValueError, match="direction"):
        asof_join(
            left, right, on="user_id", ts_col="ts", value_cols=["val"],
            direction="sideways",
        )


def test_asof_nearest_single_shuffle(spark):
    """The nearest direction must stay ONE exchange (key-partitioned
    union) — a second shuffle or a join node means the plan regressed to
    the quadratic/range-join shape."""
    left, right = _mk(spark)
    out = asof_join(
        left, right, on="user_id", ts_col="ts", value_cols=["val"],
        direction="nearest",
    )
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" not in plan, plan


def test_asof_tolerance_matches_pandas_rule(spark):
    """tolerance masks candidates farther than the bound (values null,
    left rows kept), and for `nearest` it filters each side BEFORE the
    nearest pick — pinned against pandas merge_asof(tolerance=...)
    semantics on the same fixture. With a 90-minute tolerance:
      backward: id1 (10:00, click 09:00, 60m) matches; id4 (23:00,
      click 12:00, 11h) does not; forward: id3 (00:00 -> 09:00, 9h)
      does not; nearest: id6 midpoint tie still backward."""
    import pandas as pd

    left, right = _mk(spark)
    for direction in ("backward", "forward", "nearest"):
        out = asof_join(
            left,
            right,
            on="user_id",
            ts_col="ts",
            value_cols=["val"],
            direction=direction,
            tolerance_seconds=90 * 60,
        )
        got = {r["event_id"]: r["val"] for r in out.collect()}
        lp = left.toPandas().sort_values("ts").reset_index(drop=True)
        rp = right.toPandas().sort_values("ts").reset_index(drop=True)
        exp_df = pd.merge_asof(
            lp,
            rp,
            on="ts",
            by="user_id",
            direction=direction,
            tolerance=pd.Timedelta(minutes=90),
        )
        exp = {
            int(r.event_id): (None if pd.isna(r.val) else float(r.val))
            for r in exp_df.itertuples()
        }
        assert got == exp, direction
