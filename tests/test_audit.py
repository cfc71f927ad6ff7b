"""Audit primitives: observe-during-write metrics and constraint
quarantine — numbers match a direct computation, rows are never lost."""

from __future__ import annotations

from pyspark.sql import functions as F

from hw_kafka_flink_health_spark.operators.audit import (
    observed_write,
    split_by_constraints,
)
from hw_kafka_flink_health_spark.sources.files import load_table

from tests.conftest import SF_DIR


def test_observed_write_matches_direct_aggregates(spark, tmp_path):
    events = load_table(spark, SF_DIR, "events")
    out = str(tmp_path / "out")
    got = observed_write(
        events,
        out,
        {
            "n_rows": F.count(F.lit(1)),
            "n_null_props": F.count(F.lit(1)) - F.count("props"),
            "sum_value": F.round(F.sum("value"), 4),
        },
    )
    direct = events.agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.count(F.lit(1)) - F.count("props")).alias("n_null_props"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    ).collect()[0]
    assert got["n_rows"] == direct.n_rows
    assert got["n_null_props"] == direct.n_null_props
    assert got["sum_value"] == direct.sum_value
    # the write actually happened, in the same pass
    assert spark.read.parquet(out).count() == direct.n_rows


def test_split_by_constraints_partitions_rows_exactly(spark):
    df = spark.createDataFrame(
        [
            (1, 10.0, "click"),
            (2, -5.0, "click"),      # negative value
            (3, 20.0, None),         # null type
            (4, -1.0, None),         # both violations
        ],
        "event_id long, value double, event_type string",
    )
    good, bad = split_by_constraints(
        df,
        {
            "value_non_negative": F.col("value") >= 0,
            "type_present": F.col("event_type").isNotNull(),
        },
    )
    assert [r.event_id for r in good.orderBy("event_id").collect()] == [1]
    b = {r.event_id: sorted(r["__violations"]) for r in bad.collect()}
    assert b == {
        2: ["value_non_negative"],
        3: ["type_present"],
        4: ["type_present", "value_non_negative"],
    }
    # conservation: every input row lands in exactly one side
    assert good.count() + bad.count() == df.count()
