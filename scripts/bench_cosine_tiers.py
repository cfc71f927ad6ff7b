"""Crossover bench: expression-HOF cosine_topk vs Arrow/BLAS cosine_topk_arrow.

Sweeps embedding dimensionality at fixed corpus/query size and times both
tiers on identical materialized parquet inputs, answering the tier-choice
question PLANS.md records: per-pair work is O(d) in both tiers, but the
expression tier pays Catalyst's per-element lambda interpretation while the
arrow tier pays Arrow serialization + Python worker startup — so the
expression tier wins at small d and the BLAS matmul wins once d is large.

Run: python scripts/bench_cosine_tiers.py  (local, ~2-4 min)
Output: one JSON line per (dims, tier) with wall seconds.
"""
from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from hw_kafka_flink_health_spark.operators.similarity import (  # noqa: E402
    cosine_topk,
    cosine_topk_arrow,
)
from hw_kafka_flink_health_spark.session import get_spark  # noqa: E402

N_CORPUS = 20_000
N_QUERIES = 16
DIMS = [64, 512, 2048]
K = 5


def synth(spark, n: int, d: int, path: str):
    """Deterministic synthetic embeddings, generated JVM-side and
    materialized so both tiers read identical parquet."""
    vec = F.transform(
        F.sequence(F.lit(1), F.lit(d)),
        lambda i: F.sin(F.col("id").cast("double") * i.cast("double") * 0.7),
    )
    (
        spark.range(1, n + 1)  # id 0 would be the all-zero (undefined-cosine) vector
        .select(F.col("id").alias("vec_id"), vec.alias("embedding"))
        .write.mode("overwrite")
        .parquet(path)
    )
    return spark.read.parquet(path)


def main():
    # Wide array columns break the default reader sizing: 4096-row column
    # batches x 2048 float64s x 32 tasks = ~2 GB of reader buffers. Cap the
    # batch row count so a batch stays ~MBs — the knob PLANS.md records for
    # any high-dim embedding scan — and give the single local JVM headroom.
    spark = get_spark(
        app_name="bench_cosine_tiers",
        extra_conf={
            "spark.driver.memory": "8g",
            "spark.sql.parquet.columnarReaderBatchSize": "512",
        },
    )
    tmp = tempfile.mkdtemp(prefix="cosine_tiers_")
    results = []
    try:
        for d in DIMS:
            corpus = synth(spark, N_CORPUS, d, f"{tmp}/corpus_{d}")
            queries = corpus.limit(N_QUERIES)
            for tier, fn in (("expr", cosine_topk), ("arrow", cosine_topk_arrow)):
                # warmup once (JIT/codegen/python-worker pool), then time
                fn(corpus, queries, k=K).count()
                t0 = time.monotonic()
                n = fn(corpus, queries, k=K).count()
                dt = time.monotonic() - t0
                assert n == N_QUERIES * K, n
                row = {"dims": d, "tier": tier, "sec": round(dt, 3),
                       "corpus": N_CORPUS, "queries": N_QUERIES}
                results.append(row)
                print(json.dumps(row), flush=True)
        print(json.dumps({"summary": results}))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
