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
