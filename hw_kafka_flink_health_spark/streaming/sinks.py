"""Streaming sink utilities beyond the built-in formats.

`foreach_batch_parquet` is the exactly-once file-sink pattern: the
checkpoint gives at-least-once batch replay, and writing each micro-batch
to a deterministic batchId-derived directory makes the replay idempotent
(re-running batch N overwrites batch N's own output, never duplicates).
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
