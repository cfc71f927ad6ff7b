"""Synthetic heart-rate producer — the kafka_producer.py analog (reference
src/kafka_producer.py:31-51): ~10 events/s over 5 patients, to Kafka.

    python -m hw_kafka_flink_health_spark.streaming.producer_job \
        [--bootstrap localhost:9092] [--topic heart_rate_events] [--rate 10]

Spark-native: the rate source drives cadence; the event distribution
(patients p001-p005, bpm 55-95) matches the reference's generator and is
deterministic per row id (sources/rate.py).
"""

from __future__ import annotations

import argparse


def main() -> None:
    p = argparse.ArgumentParser(description="Synthetic heart-rate event producer")
    p.add_argument("--bootstrap", default="localhost:9092")
    p.add_argument("--topic", default="heart_rate_events")
    p.add_argument("--rate", type=int, default=10, help="events per second")
    p.add_argument("--checkpoint", default="/tmp/ckpt/producer")
    p.add_argument(
        "--hello",
        action="store_true",
        help="emit hello_kafka_producer.py-shaped messages instead "
        "(reference src/hello_kafka_producer.py:16-21; default topic hello_input)",
    )
    args = p.parse_args()

    from hw_kafka_flink_health_spark.session import get_spark
    from hw_kafka_flink_health_spark.sources.kafka import write_kafka_stream
    from hw_kafka_flink_health_spark.sources.rate import (
        hello_raw_stream,
        synthetic_heart_rate_raw_stream,
    )

    spark = get_spark(app_name="HeartRateProducer")
    if args.hello:
        if args.topic == "heart_rate_events":
            args.topic = "hello_input"
        raw = hello_raw_stream(spark, rows_per_second=args.rate)
    else:
        raw = synthetic_heart_rate_raw_stream(spark, rows_per_second=args.rate)
    write_kafka_stream(
        raw,
        topic=args.topic,
        bootstrap=args.bootstrap,
        checkpoint_dir=args.checkpoint,
        value_col="raw",
        trigger_seconds=1,
    ).awaitTermination()


if __name__ == "__main__":
    main()
