"""Kafka integration smoke — requires a live broker + the
spark-sql-kafka connector jar, neither of which exists in CI; gate behind
SPARK_KAFKA_SMOKE=1 (mirrors the reference, whose Kafka round-trip is a
manual check too — README 'verify via kafka-console-consumer')."""

from __future__ import annotations

import os
import uuid

import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("SPARK_KAFKA_SMOKE") != "1"
    and os.environ.get("SPARK_GRAFT_KAFKA") != "1",
    reason="no Kafka broker/connector in this environment; "
    "set SPARK_GRAFT_KAFKA=1 (or SPARK_KAFKA_SMOKE=1)",
)


def test_kafka_roundtrip(spark, tmp_path):
    from hw_kafka_flink_health_spark.sources.kafka import (
        read_kafka_batch,
        read_kafka_stream,
        write_kafka_stream,
    )
    from hw_kafka_flink_health_spark.sources.rate import synthetic_heart_rate_raw_stream
    from hw_kafka_flink_health_spark.streaming.health_pipeline import build_streaming_job

    topic_in = f"hr_events_{uuid.uuid4().hex[:8]}"
    topic_out = f"hr_alerts_{uuid.uuid4().hex[:8]}"

    gen = synthetic_heart_rate_raw_stream(spark, rows_per_second=50)
    feed = write_kafka_stream(
        gen.withColumnRenamed("raw", "value"),
        topic=topic_in,
        checkpoint_dir=str(tmp_path / "ck_feed"),
        trigger_seconds=1,
    )
    alerts = build_streaming_job(read_kafka_stream(spark, topic=topic_in, starting_offsets="earliest"))
    sink = write_kafka_stream(
        alerts, topic=topic_out, checkpoint_dir=str(tmp_path / "ck_alerts"), trigger_seconds=1
    )
    import time

    time.sleep(90)  # > one full window + watermark
    feed.stop()
    sink.stop()
    out = read_kafka_batch(spark, topic_out)
    assert out.count() > 0


def test_kafka_hello_roundtrip(spark, tmp_path):
    """Reference README Part 1 flow (/root/reference/README.md:379-404):
    hello producer -> hello job (parse/annotate/serialize) -> consume.
    Executes only against a live broker (SPARK_GRAFT_KAFKA=1); uses the
    same library functions the `producer_job --hello` and `hello_job`
    CLIs wire together, with unique topics per run."""
    import json
    import time

    from hw_kafka_flink_health_spark.functions.parsing import annotate_df
    from hw_kafka_flink_health_spark.sources.kafka import (
        read_kafka_batch,
        read_kafka_stream,
        write_kafka_stream,
    )
    from hw_kafka_flink_health_spark.sources.rate import hello_raw_stream

    topic_in = f"hello_input_{uuid.uuid4().hex[:8]}"
    topic_out = f"hello_output_{uuid.uuid4().hex[:8]}"

    feed = write_kafka_stream(
        hello_raw_stream(spark, rows_per_second=20),
        topic=topic_in,
        checkpoint_dir=str(tmp_path / "ck_hello_feed"),
        value_col="raw",
        trigger_seconds=1,
    )
    annotated = annotate_df(
        read_kafka_stream(
            spark, topic=topic_in, starting_offsets="earliest",
            group_id="spark-hello-world",
        ),
        processed_by="hello_spark_job",
    )
    sink = write_kafka_stream(
        annotated,
        topic=topic_out,
        checkpoint_dir=str(tmp_path / "ck_hello_sink"),
        trigger_seconds=1,
    )
    time.sleep(20)
    feed.stop()
    sink.stop()
    rows = read_kafka_batch(spark, topic_out).collect()
    assert rows, "no annotated hello messages came back from Kafka"
    doc = json.loads(rows[0]["raw"])
    assert doc["processed_by"] == "hello_spark_job"
    assert doc["message"] == "hello flink"
