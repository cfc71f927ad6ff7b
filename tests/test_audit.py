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


def test_streaming_observe_reports_per_batch_metrics(spark, tmp_path):
    """DataFrame.observe on a STREAMING query: per-micro-batch audit
    metrics (row count, value sum, null count) arrive through the
    StreamingQueryListener's observedMetrics — the zero-extra-pass
    monitoring channel (no second aggregation query, no sink coupling).
    Metric values must equal the batch's actual content."""
    import json as _json
    import os
    import threading

    from pyspark.sql import functions as F
    from pyspark.sql.streaming import StreamingQueryListener

    captured, done = [], threading.Event()

    class Capture(StreamingQueryListener):
        def onQueryStarted(self, event):
            pass

        def onQueryProgress(self, event):
            om = event.progress.observedMetrics.get("ingest_audit")
            if om is not None:
                captured.append((om["n"], om["bpm_sum"], om["n_null"]))
                if len(captured) >= 2:
                    done.set()

        def onQueryIdle(self, event):
            pass

        def onQueryTerminated(self, event):
            done.set()

    listener = Capture()
    spark.streams.addListener(listener)
    try:
        src = tmp_path / "observe_src"
        os.makedirs(src)
        rows0 = [{"patient_id": "p1", "bpm": 80}, {"patient_id": "p2", "bpm": 90}]
        rows1 = [{"patient_id": "p3", "bpm": None}]
        with open(src / "b0.json", "w") as f:
            for r in rows0:
                f.write(_json.dumps(r) + "\n")
        with open(src / "b1.json", "w") as f:
            for r in rows1:
                f.write(_json.dumps(r) + "\n")
        t0 = os.stat(src / "b0.json").st_mtime
        os.utime(src / "b0.json", (t0 - 60, t0 - 60))

        reader = (
            spark.readStream.schema("patient_id string, bpm int")
            .option("maxFilesPerTrigger", 1)
            .json(str(src))
        )
        observed = reader.observe(
            "ingest_audit",
            F.count(F.lit(1)).alias("n"),
            F.sum("bpm").alias("bpm_sum"),
            F.sum(F.when(F.col("bpm").isNull(), 1).otherwise(0)).alias("n_null"),
        )
        q = (
            observed.writeStream.outputMode("append")
            .format("memory")
            .queryName("observe_stream")
            .start()
        )
        q.processAllAvailable()
        q.stop()
        done.wait(timeout=30)
    finally:
        spark.streams.removeListener(listener)

    batches = sorted(captured)
    assert (1, None, 1) in batches or (1, 0, 1) in batches  # the all-null batch
    assert (2, 170, 0) in batches
