"""Versioned snapshot tables: time travel, snapshot isolation, append
sharing files across versions, and vacuum retention."""

from __future__ import annotations

import os

from hw_kafka_flink_health_spark.operators.versioned import (
    commit_snapshot,
    current_version,
    read_snapshot,
    vacuum,
)


def test_time_travel_and_overwrite_isolation(spark, tmp_path):
    t = str(tmp_path / "tbl")
    v0 = commit_snapshot(spark.range(10).selectExpr("id", "id * 2 AS v"), t)
    assert v0 == 0 and current_version(t) == 0

    # a reader pins v0 BEFORE the overwrite commits...
    pinned = read_snapshot(spark, t)
    v1 = commit_snapshot(spark.range(5).selectExpr("id + 100 AS id", "id AS v"), t)
    assert v1 == 1 and current_version(t) == 1

    # ...and still sees the old snapshot after it (snapshot isolation)
    assert {r.id for r in pinned.collect()} == set(range(10))
    # latest readers see the overwrite
    assert {r.id for r in read_snapshot(spark, t).collect()} == {
        100 + i for i in range(5)
    }
    # explicit time travel back to v0
    assert {r.id for r in read_snapshot(spark, t, version=0).collect()} == set(
        range(10)
    )


def test_append_shares_files_and_vacuum_retains_reachable(spark, tmp_path):
    t = str(tmp_path / "tbl")
    commit_snapshot(spark.range(3).selectExpr("id"), t)
    commit_snapshot(spark.range(3, 6).selectExpr("id"), t, mode="append")
    assert {r.id for r in read_snapshot(spark, t).collect()} == set(range(6))
    # v1 references v0's files — append did not rewrite them
    v0_files = {n for n in os.listdir(t) if n.startswith("data-v0-")}
    assert v0_files

    # two overwrites push v0/v1 out of the keep-last-2 window
    commit_snapshot(spark.range(100, 103).selectExpr("id"), t)
    commit_snapshot(spark.range(200, 203).selectExpr("id"), t)
    deleted = vacuum(t, keep_last=2)
    assert any(n.startswith("data-v0-") for n in deleted)
    # retained versions still read cleanly
    assert {r.id for r in read_snapshot(spark, t).collect()} == {200, 201, 202}
    assert {r.id for r in read_snapshot(spark, t, version=2).collect()} == {
        100,
        101,
        102,
    }


def test_version_diff_composes_with_snapshot_diff(spark, tmp_path):
    """Change-data between any two retained versions falls out of
    composing time travel with the existing CDC diff operator — no new
    machinery: diff(read(v0), read(v1)) names exactly the added/removed/
    changed keys."""
    from hw_kafka_flink_health_spark.operators.timeseries import snapshot_diff

    t = str(tmp_path / "tbl")
    commit_snapshot(
        spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], ["id", "val"]
        ),
        t,
    )
    commit_snapshot(
        spark.createDataFrame(
            [(1, "a"), (2, "B"), (4, "d")], ["id", "val"]
        ),
        t,
    )
    diff = {
        (r.id, r.status)
        for r in snapshot_diff(
            read_snapshot(spark, t, version=0),
            read_snapshot(spark, t, version=1),
            ["id"],
        ).collect()
    }
    assert diff == {(2, "changed"), (3, "removed"), (4, "added")}
