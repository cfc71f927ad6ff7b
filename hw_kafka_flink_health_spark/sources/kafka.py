"""Kafka source/sink wrappers (reference operators S1-S4).

The reference consumes `heart_rate_events` and produces `heart_rate_alerts`
as JSON strings (``src/flink_job.py:66-73,131-143``). Structured Streaming
equivalents below; value-only, string-serialized, consumer-group pinned.

NOTE: the spark-sql-kafka connector jar is not bundled in this container,
and no broker runs in CI — these wrappers are exercised by integration
smoke only (tests gate on SPARK_KAFKA_SMOKE=1); the pipeline logic itself
is covered through file/memory sources (same unified DataFrame API).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_BOOTSTRAP = "localhost:9092"
EVENTS_TOPIC = "heart_rate_events"  # reference: src/flink_job.py:69
ALERTS_TOPIC = "heart_rate_alerts"  # reference: src/flink_job.py:135
CONSUMER_GROUP = "flink-heart-monitor"  # reference: src/flink_job.py:70


def read_kafka_stream(
    spark: SparkSession,
    topic: str = EVENTS_TOPIC,
    bootstrap: str = DEFAULT_BOOTSTRAP,
    group_id: str = CONSUMER_GROUP,
    starting_offsets: str = "latest",
) -> DataFrame:
    """S1/S2: Kafka topic -> streaming DataFrame of raw JSON strings
    (column `raw`) — the value-only SimpleStringSchema analog."""
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
        .option("kafka.group.id", group_id)
        .option("startingOffsets", starting_offsets)
        .load()
        .selectExpr("CAST(value AS STRING) AS raw")
    )


def write_kafka_stream(
    df: DataFrame,
    topic: str = ALERTS_TOPIC,
    bootstrap: str = DEFAULT_BOOTSTRAP,
    checkpoint_dir: str = "/tmp/ckpt/kafka_alerts",
    value_col: str = "value",
    trigger_seconds: int = 5,
):
    """S3/S4: streaming DataFrame (string `value` column) -> Kafka topic.

    5 s trigger cadence mirrors the reference's 5 s checkpoint interval
    (src/flink_job.py:58); checkpointLocation gives exactly-once state
    recovery, the Flink-checkpoint analog."""
    return (
        df.select(F.col(value_col).cast("string").alias("value"))
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .start()
    )


def read_kafka_batch(
    spark: SparkSession,
    topic: str,
    bootstrap: str = DEFAULT_BOOTSTRAP,
) -> DataFrame:
    """Batch read of a whole topic (offsets earliest..latest)."""
    return (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
        .option("endingOffsets", "latest")
        .load()
        .selectExpr("CAST(value AS STRING) AS raw")
    )
