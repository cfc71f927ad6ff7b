"""Hello-world smoke job — the hello_flink_job.py analog (reference
src/hello_flink_job.py:24-68): Kafka -> parse/annotate/serialize -> Kafka.

    python -m hw_kafka_flink_health_spark.streaming.hello_job \
        [--bootstrap localhost:9092] [--input hello_input] [--output hello_output]
"""

from __future__ import annotations

import argparse


def main() -> None:
    p = argparse.ArgumentParser(description="Hello streaming smoke job")
    p.add_argument("--bootstrap", default="localhost:9092")
    p.add_argument("--input", default="hello_input")
    p.add_argument("--output", default="hello_output")
    p.add_argument("--checkpoint", default="/tmp/ckpt/hello")
    args = p.parse_args()

    from hw_kafka_flink_health_spark.functions.parsing import annotate_df
    from hw_kafka_flink_health_spark.session import get_spark
    from hw_kafka_flink_health_spark.sources.kafka import read_kafka_stream, write_kafka_stream

    spark = get_spark(app_name="HelloSparkJob")
    raw = read_kafka_stream(
        spark, topic=args.input, bootstrap=args.bootstrap, group_id="spark-hello-world"
    )
    annotated = annotate_df(raw, processed_by="hello_spark_job")
    write_kafka_stream(
        annotated,
        topic=args.output,
        bootstrap=args.bootstrap,
        checkpoint_dir=args.checkpoint,
    ).awaitTermination()


if __name__ == "__main__":
    main()
