"""Streaming sink utilities beyond the built-in formats.

`foreach_batch_parquet` is the exactly-once file-sink pattern: the
checkpoint gives at-least-once batch replay, and writing each micro-batch
to a deterministic batchId-derived directory makes the replay idempotent
(re-running batch N overwrites batch N's own output, never duplicates).

Sink extension: keyed-upsert materialization beyond the reference's append-only Kafka/file sinks (SURVEY §2.A S3-S5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def foreach_batch_parquet(df: DataFrame, out_dir: str, checkpoint_dir: str):
    """Start a foreachBatch query writing each micro-batch to
    out_dir/batch_id=N (idempotent under replay; read back with
    spark.read.parquet(out_dir))."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(f"{out_dir}/batch_id={batch_id}")

    return (
        df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )


def enrich_with_static(stream_df: DataFrame, dim_df: DataFrame, on: str, how: str = "left") -> DataFrame:
    """Stream-static join: enrich a stream with a (batch) dimension table.

    Catalyst plans the static side as a regular (usually broadcast) join
    per micro-batch — no state store involved; the dim can be swapped by
    re-reading it in foreachBatch for slowly-changing dims.
    """
    return stream_df.join(dim_df, on, how)


def foreach_batch_upsert(
    df: DataFrame, table_dir: str, checkpoint_dir: str, key_cols: list[str]
):
    """Keyed-upsert sink: each micro-batch MERGEs into a parquet table
    (updates win on key, untouched rows carry over) — the materialized-
    view pattern for update-mode aggregations (e.g. latest per-patient
    vitals), built on operators.relational.merge_upsert.

    Replay-safe: merging the same batch twice is a no-op (same keys get
    the same rows). The swap is write-staging-then-rename — atomic on a
    local/HDFS-style fs; on a real deployment back this with a table
    format's transactional commit instead. At scale the base table would
    be bucketed by the key so the anti join inside merge never shuffles
    the big side (operators/storage.py).
    """
    import os
    import shutil

    from hw_kafka_flink_health_spark.operators.relational import merge_upsert

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_df = batch_df.dropDuplicates(key_cols)
        if os.path.isdir(table_dir):
            base = spark.read.parquet(table_dir)
            merged = merge_upsert(base, batch_df.select(*base.columns), key_cols)
        else:
            merged = batch_df
        staging = table_dir + ".staging"
        merged.write.mode("overwrite").parquet(staging)
        if os.path.isdir(table_dir):
            shutil.rmtree(table_dir)
        os.rename(staging, table_dir)

    return (
        df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .start()
    )
