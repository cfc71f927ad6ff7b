"""Kafka source/sink wrappers (reference operators S1-S4).

The reference consumes `heart_rate_events` and produces `heart_rate_alerts`
as JSON strings (``src/flink_job.py:66-73,131-143``). Structured Streaming
equivalents below; value-only, string-serialized, consumer-group pinned.

NOTE: the spark-sql-kafka connector jar is not bundled in this container,
and no broker runs in CI — real-broker round-trips are exercised by the
gated integration smoke (SPARK_GRAFT_KAFKA=1). To keep the S1-S4 builder
code EXECUTING in CI anyway, every wrapper also accepts an
``emulated://<dir>`` bootstrap: messages live as base64-JSONL files per
topic with the Kafka wire schema (value binary, topic, partition, offset,
timestamp), and the value-bytes -> CAST -> parse -> to_json -> sink chain
runs unchanged above the transport swap — see
tests/test_kafka_emulated.py (un-gated).
"""

from __future__ import annotations

import base64
import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_BOOTSTRAP = "localhost:9092"
EVENTS_TOPIC = "heart_rate_events"  # reference: src/flink_job.py:69
ALERTS_TOPIC = "heart_rate_alerts"  # reference: src/flink_job.py:135
CONSUMER_GROUP = "flink-heart-monitor"  # reference: src/flink_job.py:70

# --- emulated transport: an in-process stand-in for the broker wire.
# A topic is a directory of JSONL files; each line is one message with
# its value base64-coded (JSON can't carry raw bytes) plus the same
# metadata columns the Kafka connector exposes. Offsets-from-earliest
# only (file sources replay everything), which is exactly what the CI
# round-trip needs.
EMULATED_SCHEME = "emulated://"
_EMULATED_WIRE_SCHEMA = "value_b64 string, partition int, offset long, ts_ms long"


def _is_emulated(bootstrap: str) -> bool:
    return bootstrap.startswith(EMULATED_SCHEME)


def _emulated_topic_dir(bootstrap: str, topic: str) -> str:
    d = os.path.join(bootstrap[len(EMULATED_SCHEME):], topic)
    os.makedirs(d, exist_ok=True)
    return d


def _emulated_wire_cols(df: DataFrame, topic: str) -> DataFrame:
    """JSONL rows -> the Kafka connector's wire schema (value is BINARY,
    so downstream CAST(value AS STRING) is byte-for-byte the real path)."""
    return df.selectExpr(
        "unbase64(value_b64) AS value",
        f"'{topic}' AS topic",
        "partition",
        "offset",
        "timestamp_millis(ts_ms) AS timestamp",
    )


def emulated_produce(bootstrap: str, topic: str, values: list) -> None:
    """Producer-side emulation (the kafka-console-producer analog): append
    one JSONL file of messages to the topic dir. `values` are str or
    bytes; they land as base64 so arbitrary bytes survive."""
    d = _emulated_topic_dir(bootstrap, topic)
    now = int(time.time() * 1000)
    name = f"batch-{now}-{uuid.uuid4().hex[:8]}.jsonl"
    path = os.path.join(d, name)
    # stage under a DOT-prefixed name: Spark's file listing ignores hidden
    # files, so a reader can never observe the half-written batch (a
    # "<name>.tmp" suffix would NOT be hidden and could be listed mid-write)
    tmp = os.path.join(d, f".{name}.tmp")
    with open(tmp, "w") as f:
        for i, v in enumerate(values):
            raw = v if isinstance(v, bytes) else str(v).encode("utf-8")
            f.write(
                json.dumps(
                    {
                        "value_b64": base64.b64encode(raw).decode("ascii"),
                        "partition": 0,
                        "offset": now * 1000 + i,
                        "ts_ms": now,
                    }
                )
                + "\n"
            )
    os.rename(tmp, path)  # atomic: the file source never sees a torn batch


def read_kafka_stream(
    spark: SparkSession,
    topic: str = EVENTS_TOPIC,
    bootstrap: str = DEFAULT_BOOTSTRAP,
    group_id: str = CONSUMER_GROUP,
    starting_offsets: str = "latest",
) -> DataFrame:
    """S1/S2: Kafka topic -> streaming DataFrame of raw JSON strings
    (column `raw`) — the value-only SimpleStringSchema analog."""
    if _is_emulated(bootstrap):
        wire = _emulated_wire_cols(
            spark.readStream.schema(_EMULATED_WIRE_SCHEMA).json(
                _emulated_topic_dir(bootstrap, topic)
            ),
            topic,
        )
    else:
        wire = (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap)
            .option("subscribe", topic)
            .option("kafka.group.id", group_id)
            .option("startingOffsets", starting_offsets)
            .load()
        )
    return wire.selectExpr("CAST(value AS STRING) AS raw")


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
    out = df.select(F.col(value_col).cast("string").alias("value"))
    if _is_emulated(bootstrap):
        d = _emulated_topic_dir(bootstrap, topic)

        def emit(batch_df: DataFrame, batch_id: int) -> None:
            # Unique, per-batch-advancing offsets without any shuffle:
            # monotonically_increasing_id() packs the partition id into its
            # HIGH 33 bits, so naively adding it to a batch stride collides
            # across batches (round-5 advice). Pack explicitly instead —
            # bits [43..62] batch, [33..42] partition (emulated sink is a
            # local fixture; 1024 partitions is plenty), [0..32] the
            # within-partition row counter (mono-id's documented low 33
            # bits). Offsets order rows within (batch, partition); readers
            # replay whole files and never seek by offset. The packing
            # bounds are ENFORCED, not assumed: batch_id >= 2^20 would
            # spill into the sign bit (negative, non-monotonic offsets)
            # and a 1025th partition would collide with partition 0 — both
            # fail loudly instead of silently corrupting uniqueness.
            if batch_id >= 1 << 20:
                raise ValueError(
                    f"emulated kafka sink: batch_id {batch_id} overflows the "
                    "20-bit offset packing field (supports < 1048576 batches "
                    "per checkpoint lineage)"
                )
            rows = (
                batch_df.selectExpr(
                    "base64(CAST(value AS BINARY)) AS value_b64",
                    "CAST(spark_partition_id() AS INT) AS partition",
                    f"shiftleft(CAST({batch_id} AS LONG), 43)"
                    " + shiftleft(CAST(spark_partition_id() AS LONG), 33)"
                    " + (monotonically_increasing_id() & 8589934591)"
                    " + coalesce(CAST(assert_true(spark_partition_id() < 1024,"
                    " 'emulated kafka sink: >= 1024 partitions in one batch"
                    " overflows the 10-bit offset packing field')"
                    " AS LONG), 0) AS offset",
                    "unix_millis(current_timestamp()) AS ts_ms",
                )
            )
            rows.write.mode("append").json(d)

        return (
            out.writeStream.foreachBatch(emit)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(processingTime=f"{trigger_seconds} seconds")
            .start()
        )
    return (
        out.writeStream.format("kafka")
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
    if _is_emulated(bootstrap):
        wire = _emulated_wire_cols(
            spark.read.schema(_EMULATED_WIRE_SCHEMA).json(
                _emulated_topic_dir(bootstrap, topic)
            ),
            topic,
        )
        return wire.selectExpr("CAST(value AS STRING) AS raw")
    return (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
        .option("endingOffsets", "latest")
        .load()
        .selectExpr("CAST(value AS STRING) AS raw")
    )
