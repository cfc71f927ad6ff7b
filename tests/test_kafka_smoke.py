"""Kafka integration smoke — requires a live broker + the
spark-sql-kafka connector jar, neither of which exists in CI; gate behind
SPARK_KAFKA_SMOKE=1 (mirrors the reference, whose Kafka round-trip is a
manual check too — README 'verify via kafka-console-consumer')."""

from __future__ import annotations

import os
import uuid

import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("SPARK_KAFKA_SMOKE") != "1",
    reason="no Kafka broker/connector in this environment; set SPARK_KAFKA_SMOKE=1",
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
