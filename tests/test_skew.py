"""Salted aggregation == plain aggregation, on a deliberately skewed key."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hw_kafka_flink_health_spark.operators.skew import salted_agg


@pytest.fixture(scope="module")
def skewed(spark):
    # 90% of rows land on key 'hot'
    return spark.range(20000).select(
        F.when(F.col("id") % 10 < 9, F.lit("hot"))
        .otherwise(F.concat(F.lit("k"), (F.col("id") % 100).cast("string")))
        .alias("key"),
        (F.col("id") % 997).cast("double").alias("v"),
    )


def test_salted_agg_exact(spark, skewed):
    plain = {
        r.key: (r.n, r.total, r.mn, r.mx, round(r.mean, 9))
        for r in skewed.groupBy("key")
        .agg(
            F.count("v").alias("n"),
            F.sum("v").alias("total"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
            F.avg("v").alias("mean"),
        )
        .collect()
    }
    salted = {
        r.key: (r.n, r.total, r.mn, r.mx, round(r.mean, 9))
        for r in salted_agg(
            skewed,
            ["key"],
            {
                "n": ("count", "v"),
                "total": ("sum", "v"),
                "mn": ("min", "v"),
                "mx": ("max", "v"),
                "mean": ("avg", "v"),
            },
            n_salts=8,
        ).collect()
    }
    assert plain == salted


def test_salted_agg_rejects_non_algebraic(spark, skewed):
    with pytest.raises(ValueError):
        salted_agg(skewed, ["key"], {"m": ("median", "v")})


def test_salted_join_exact(spark, skewed):
    from hw_kafka_flink_health_spark.operators.skew import salted_join

    # k50..k99 are missing from dim so left-outer actually exercises nulls
    dim = spark.range(50).select(
        F.concat(F.lit("k"), F.col("id").cast("string")).alias("key"),
        (F.col("id") * 2).alias("attr"),
    ).union(spark.sql("SELECT 'hot' AS key, -1 AS attr"))

    plain = sorted(
        (r.key, r.v, r.attr)
        for r in skewed.join(dim, "key", "inner").collect()
    )
    salted = sorted(
        (r.key, r.v, r.attr)
        for r in salted_join(skewed, dim, "key", n_salts=8).collect()
    )
    assert plain == salted
    # left-outer parity too: unmatched big-side keys survive null-padded
    plain_lo = sorted(
        (r.key, r.v, r.attr)
        for r in skewed.join(dim, "key", "left_outer").collect()
    )
    salted_lo = sorted(
        (r.key, r.v, r.attr)
        for r in salted_join(skewed, dim, "key", n_salts=8, how="left_outer").collect()
    )
    assert plain_lo == salted_lo


def test_salted_join_rejects_dim_preserving_types(spark, skewed):
    """right/full outer would emit each unmatched dim row n_salts times;
    salted_join must refuse rather than silently duplicate (ADVICE r1)."""
    from hw_kafka_flink_health_spark.operators.skew import salted_join

    dim = spark.sql("SELECT 'hot' AS key, -1 AS attr")
    for how in ("right", "full", "full_outer", "right_outer", "cross"):
        with pytest.raises(ValueError, match="big-side-preserving"):
            salted_join(skewed, dim, "key", how=how)


def test_global_prefix_sum_matches_single_task_window(spark):
    """The two-pass distributed prefix sum must equal the naive global
    window cumsum over the same total order, and must actually spread the
    work: the ranged intermediate uses >1 partition (the naive plan
    funnels every row through one task)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from hw_kafka_flink_health_spark.operators.relational import global_prefix_sum
    from hw_kafka_flink_health_spark.sources.files import load_table
    from tests.conftest import SF_DIR

    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_linenumber", F.col("l_quantity").cast("long").alias("q")
    )
    got = global_prefix_sum(
        li, "q", [F.col("q").desc(), F.col("l_orderkey"), F.col("l_linenumber")],
        out_col="run", n_partitions=8,
    )
    w = (
        Window.orderBy(F.col("q").desc(), "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    expect = li.withColumn("run", F.sum("q").over(w))
    key = lambda r: (r["l_orderkey"], r["l_linenumber"])  # noqa: E731
    g = {key(r): r["run"] for r in got.collect()}
    e = {key(r): r["run"] for r in expect.collect()}
    assert g == e
    n_parts = (
        li.repartitionByRange(8, F.col("q").desc(), "l_orderkey", "l_linenumber")
        .rdd.getNumPartitions()
    )
    assert n_parts > 1


def test_global_prefix_sum_signed_values(spark):
    """Signed inputs (sweep-line +1/-1 deltas): partition offsets must be
    the SUM of prior partitions' values, not the max of their running
    sums — regression for the offset bug max_concurrent_sessions caught."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from hw_kafka_flink_health_spark.operators.relational import global_prefix_sum

    rows = [(i, 1 if i % 3 != 2 else -2) for i in range(300)]  # dips negative
    df = spark.createDataFrame(rows, ["pos", "delta"]).repartition(8)
    got = {
        r.pos: r.running_total
        for r in global_prefix_sum(df, "delta", ["pos"], n_partitions=6).collect()
    }
    expected = {
        r.pos: r.t
        for r in df.withColumn(
            "t",
            F.sum("delta").over(
                Window.orderBy("pos").rowsBetween(Window.unboundedPreceding, 0)
            ),
        ).collect()
    }
    assert got == expected


def test_global_prefix_scan_max_min_exclusive_and_nulls(spark):
    """global_prefix_scan's max/min ops and the exclusive frame must
    match the naive global window exactly, including NULL semantics
    (NULLs contribute nothing; rows with no non-NULL predecessor in the
    frame get NULL — the skyline's first point)."""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from hw_kafka_flink_health_spark.operators.relational import (
        global_prefix_scan,
    )

    random.seed(11)
    rows = [
        (i, random.choice([None, random.randint(-40, 40)]))
        for i in range(500)
    ]
    df = spark.createDataFrame(rows, "pos long, v long")
    for op, fn in (("max", F.max), ("min", F.min), ("sum", F.sum)):
        for excl in (False, True):
            hi = -1 if excl else Window.currentRow
            w = Window.orderBy(F.desc("pos")).rowsBetween(
                Window.unboundedPreceding, hi
            )
            exp = {
                r["pos"]: r["o"]
                for r in df.withColumn("o", fn("v").over(w)).collect()
            }
            got = {
                r["pos"]: r["o"]
                for r in global_prefix_scan(
                    df,
                    ["v"],
                    [F.col("pos").desc()],
                    ops=[op],
                    out_cols=["o"],
                    exclusive=excl,
                    n_partitions=6,
                ).collect()
            }
            assert got == exp, (op, excl)


def test_prefix_scan_window_fallback_tier_doubles(spark):
    """Non-integral value columns take the windowed fallback tier (no
    catalog caller today — this test keeps it correct): sum/max,
    inclusive/exclusive, NULLs, vs the naive global window. Values are
    dyadic (k/2) so every partial sum is exact in double and equality
    is exact regardless of where the range cut lands."""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from hw_kafka_flink_health_spark.operators.relational import (
        global_prefix_scan,
    )

    random.seed(3)
    rows = [
        (i, random.choice([None, random.randint(-20, 20) / 2.0]))
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "pos long, v double")
    for op, fn in (("sum", F.sum), ("max", F.max)):
        for excl in (False, True):
            hi = -1 if excl else Window.currentRow
            w = Window.orderBy("pos").rowsBetween(
                Window.unboundedPreceding, hi
            )
            exp = {
                r["pos"]: r["o"]
                for r in df.withColumn("o", fn("v").over(w)).collect()
            }
            got = {
                r["pos"]: r["o"]
                for r in global_prefix_scan(
                    df,
                    ["v"],
                    ["pos"],
                    ops=[op],
                    out_cols=["o"],
                    exclusive=excl,
                    n_partitions=5,
                ).collect()
            }
            assert got == exp, (op, excl)


def test_prefix_scan_single_exchange_no_window(spark):
    """The Arrow tier's pre-checkpoint plan must carry EXACTLY ONE
    exchange (the range shuffle) and no Window operator — the r10-r11
    shape paid a second hashpartitioning(_pid) exchange plus a window
    sort that Catalyst inserted above the range exchange."""
    from pyspark.sql import functions as F

    from hw_kafka_flink_health_spark.operators.relational import (
        distributed_row_number,
        global_prefix_scan,
    )
    from hw_kafka_flink_health_spark.plans import capture_checkpoints

    df = spark.range(2000).select(
        F.col("id").alias("pos"), (F.col("id") % 7).cast("long").alias("v")
    )
    for build in (
        lambda: global_prefix_scan(
            df, ["v"], ["pos"], out_cols=["rt"], n_partitions=6
        ),
        lambda: distributed_row_number(df, ["pos"], out_col="rn"),
    ):
        captured, executed = [], []
        with capture_checkpoints(captured, executed):
            build()
        pre = "\n".join(executed)
        assert pre.count("Exchange") == 1, pre[:2000]
        assert "Exchange rangepartitioning" in pre
        assert "Window" not in pre, pre[:2000]


def test_distributed_row_number_matches_single_task_window(spark):
    """distributed_row_number over a total order must equal the naive
    single-partition `row_number().over(Window.orderBy(...))`, for asc,
    desc, and expression sort keys, with heavy ties on the leading key."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from hw_kafka_flink_health_spark.operators.relational import (
        distributed_row_number,
    )

    rows = [(i, i % 37) for i in range(1500)]  # 37 values -> dense ties
    df = spark.createDataFrame(rows, ["id", "v"]).repartition(8)

    for order, worder in [
        (["v", "id"], [F.asc("v"), F.asc("id")]),
        ([F.col("v").desc(), F.col("id")], [F.desc("v"), F.asc("id")]),
        (
            [F.coalesce(F.col("v"), F.lit(-1)).desc(), F.col("id")],
            [F.coalesce(F.col("v"), F.lit(-1)).desc(), F.asc("id")],
        ),
    ]:
        got = {
            r.id: r.rn
            for r in distributed_row_number(
                df, order, out_col="rn", n_partitions=6
            ).collect()
        }
        exp = {
            r.id: r.rn
            for r in df.withColumn(
                "rn", F.row_number().over(Window.orderBy(*worder))
            ).collect()
        }
        assert got == exp


def test_distributed_row_number_total_col_and_empty(spark):
    from pyspark.sql import functions as F

    from hw_kafka_flink_health_spark.operators.relational import (
        distributed_row_number,
    )

    df = spark.range(123).select(F.col("id"))
    out = distributed_row_number(df, ["id"], out_col="rn", total_col="n")
    rows = out.collect()
    assert {r.n for r in rows} == {123}
    assert sorted(r.rn for r in rows) == list(range(1, 124))
    empty = df.filter(F.lit(False))
    assert (
        distributed_row_number(empty, ["id"], out_col="rn", total_col="n").count()
        == 0
    )


@pytest.mark.slow  # ~10 s all-k matrix; basic parity stays in the fast tier; full-suite tier
def test_distributed_ntile_matches_builtin_all_k(spark):
    """distributed_ntile must reproduce SQL-standard NTILE bucket
    placement bit-for-bit (first N%k buckets one row larger), including
    k that doesn't divide N, k == N, and k > N."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from hw_kafka_flink_health_spark.operators.relational import distributed_ntile

    rows = [(i, (i * 7919) % 41) for i in range(997)]  # 997 is prime
    df = spark.createDataFrame(rows, ["id", "v"]).repartition(8)
    for k in (2, 4, 8, 10, 13, 997, 1500):
        got = {
            r.id: r.t
            for r in distributed_ntile(
                df, k, ["v", "id"], out_col="t", n_partitions=6
            ).collect()
        }
        exp = {
            r.id: r.t
            for r in df.withColumn(
                "t", F.ntile(k).over(Window.orderBy("v", "id")).cast("long")
            ).collect()
        }
        assert got == exp, f"k={k}"


def test_distributed_rank_pass1_never_single_partition(spark):
    """The pass-1 plan (pre-checkpoint) must be range-partitioned with
    the (_pid, _local_rn) pair read straight out of
    monotonically_increasing_id — ONE exchange total, no Window operator
    at all. (The r10-r11 window-based pass paid a second full
    hashpartitioning(_pid) exchange Catalyst inserted above the range
    exchange — the shape this test now forbids.)"""
    from pyspark.sql import functions as F

    from hw_kafka_flink_health_spark.operators.relational import (
        _range_local_row_number,
    )

    df = spark.range(1000).select(F.col("id"), (F.col("id") % 13).alias("v"))
    local = _range_local_row_number(df, ["v", "id"], 8)
    plan = local._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan
    assert "Exchange rangepartitioning" in plan
    assert "Exchange hashpartitioning" not in plan  # the r12 win
    assert "Window" not in plan  # id-based, no window sort pass
