"""Storage-layout plan guarantees: bucketed joins shuffle zero times,
partitioned reads prune directories, bucketed aggs skip their exchange."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hw_kafka_flink_health_spark.operators.storage import (
    write_bucketed,
    write_partitioned,
)
from hw_kafka_flink_health_spark.sources.files import load_table

from tests.conftest import SF_DIR


def physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    wh = tmp_path_factory.mktemp("warehouse")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS buck LOCATION '{wh}'")
    yield "buck"
    spark.sql("DROP DATABASE IF EXISTS buck CASCADE")


def test_bucketed_join_has_no_exchange(spark, warehouse):
    orders = load_table(spark, SF_DIR, "orders")
    li = load_table(spark, SF_DIR, "lineitem")
    write_bucketed(
        orders, f"{warehouse}.orders_b", buckets=4, key="o_orderkey"
    )
    write_bucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"),
        f"{warehouse}.lineitem_b",
        buckets=4,
        key="o_orderkey",
    )
    ob = spark.table(f"{warehouse}.orders_b")
    lb = spark.table(f"{warehouse}.lineitem_b")
    joined = ob.join(lb, "o_orderkey").select("o_orderkey", "o_totalprice", "l_quantity")
    # Bucketing targets big-fact x big-fact joins where neither side can
    # broadcast; at test scale the planner would broadcast instead (and
    # skip bucketed scans), so pin the scenario bucketing exists for.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = physical(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "Exchange" not in plan, plan  # the whole point of bucketing
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    # same co-located layout also covers the join both tables were bucketed for
    n = joined.count()
    expected = (
        load_table(spark, SF_DIR, "orders")
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .count()
    )
    assert n == expected


def test_bucketed_groupby_skips_shuffle(spark, warehouse):
    ob = spark.table(f"{warehouse}.orders_b")
    agg = ob.groupBy("o_orderkey").agg(F.sum("o_totalprice").alias("t"))
    assert "Exchange" not in physical(agg)


def test_partitioned_write_prunes_directories(spark, tmp_path):
    events = load_table(spark, SF_DIR, "events")
    path = str(tmp_path / "events_by_type")
    write_partitioned(events, path, partition_cols="event_type")
    back = spark.read.parquet(path).filter(F.col("event_type") == "click")
    plan = physical(back)
    assert "PartitionFilters" in plan and "event_type" in plan.split("PartitionFilters")[1].split("]")[0]
    # pruning must not change the answer
    expected = events.filter(F.col("event_type") == "click").count()
    assert back.count() == expected


def test_compact_small_files(spark, tmp_path):
    from hw_kafka_flink_health_spark.operators.storage import compact_small_files

    events = load_table(spark, SF_DIR, "events")
    frag = str(tmp_path / "fragmented")
    events.repartition(40).write.parquet(frag)  # simulate micro-batch litter
    import glob

    assert len(glob.glob(f"{frag}/*.parquet")) == 40
    out = str(tmp_path / "compacted")
    n_out = compact_small_files(spark, frag, out, target_file_mb=128)
    files = glob.glob(f"{out}/*.parquet")
    assert len(files) == n_out == 1  # sf0.001 events << 128 MB
    assert spark.read.parquet(out).count() == events.count()
