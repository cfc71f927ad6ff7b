"""Runnable CEP monitor — the FlinkCEP-job analog for this engine: watch
a live event stream and emit a match row whenever a user completes
view → (no purchase between) → purchase within the window.

    python -m hw_kafka_flink_health_spark.streaming.cep_job --demo
        broker-less: deterministic synthetic events through the matcher,
        matches printed to the console sink, stops after --demo-seconds.

    python -m hw_kafka_flink_health_spark.streaming.cep_job \
        --source-dir /data/events_jsonl [--out-dir /data/matches]
        file-stream mode: tail a JSONL directory (schema: user_id long,
        event_id long, ts_ms long, event_type string), write matches as
        JSON; swap the reader for the Kafka source (sources/kafka.py) on
        a real deployment — the matcher is source-agnostic.

The matcher is `operators/stateful.py:cep_followed_by_stream` (GroupState
= NFA frontier, vectorized micro-batches); its batch twin is the
DuckDB-oracled `queries/cep.py:cep_followed_by`.
"""

from __future__ import annotations

import argparse


def main() -> None:
    p = argparse.ArgumentParser(description="Streaming CEP followed-by monitor")
    p.add_argument("--demo", action="store_true", help="broker-less synthetic run")
    p.add_argument("--demo-seconds", type=int, default=10)
    p.add_argument("--source-dir", help="JSONL directory to stream")
    p.add_argument("--out-dir", help="match output directory (JSON)")
    p.add_argument("--checkpoint", default="/tmp/ckpt/cep")
    p.add_argument("--within-ms", type=int, default=600_000)
    p.add_argument(
        "--pattern",
        choices=["followed_by", "burst"],
        default="followed_by",
        help="followed_by: view->purchase within window; "
        "burst: 3+ consecutive errors (times(3).consecutive())",
    )
    args = p.parse_args()

    from pyspark.sql import functions as F

    from hw_kafka_flink_health_spark.operators.stateful import (
        cep_error_burst_stream,
        cep_followed_by_stream,
    )
    from hw_kafka_flink_health_spark.session import get_spark

    def matcher(events):
        if args.pattern == "burst":
            return cep_error_burst_stream(events)
        return cep_followed_by_stream(events, within_ms=args.within_ms)

    spark = get_spark(app_name="CepJob")

    if args.demo:
        # rate source -> deterministic synthetic clickstream: every third
        # event a view, every fifth a purchase (so matches occur), user
        # from a small id ring
        rate = spark.readStream.format("rate").option("rowsPerSecond", "50").load()
        events = rate.select(
            (F.col("value") % 7).alias("user_id"),
            F.col("value").alias("event_id"),
            F.unix_millis("timestamp").alias("ts_ms"),
            F.when(F.col("value") % 3 == 0, "view")
            .when(F.col("value") % 5 == 0, "purchase")
            .when(F.col("value") % 7 < 4, "error")  # gives the burst pattern runs to find
            .otherwise("click")
            .alias("event_type"),
        )
        q = (
            matcher(events)
            .writeStream.outputMode("append")
            .format("console")
            .option("truncate", "false")
            .start()
        )
        import time

        time.sleep(args.demo_seconds)
        q.stop()
        return

    if not args.source_dir:
        raise SystemExit("--source-dir required unless --demo")
    reader = spark.readStream.schema(
        "user_id long, event_id long, ts_ms long, event_type string"
    ).json(args.source_dir)
    matches = matcher(reader)
    sink = (
        matches.writeStream.outputMode("append")
        .format("json")
        .option("path", args.out_dir or "/tmp/cep_matches")
        .option("checkpointLocation", args.checkpoint)
        .start()
    )
    sink.awaitTermination()


if __name__ == "__main__":
    main()
