"""ANN tier bench: recall@k and wall time for IVF / projection-LSH / PQ
against exact brute-force cosine, on the sf0.1 embeddings table.

Answers the index-choice question for the similarity pack the way the
cosine-tier bench answers the execution-tier one: all approximate tiers
trade recall for scan reduction, but their costs land differently — IVF
pays a k-means train + per-query probe routing, LSH pays hash banding
with recall set by band geometry, PQ pays a one-off codebook train and
then scores compressed codes (the only tier whose corpus memory
footprint also drops ~d*4/m bytes per vector).

Run: python scripts/bench_ann.py    (local, ~2-4 min at sf0.1)
Output: one JSON line per tier with wall seconds + recall vs exact;
the summary table lives in PLANS.md's epilogue.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from hw_kafka_flink_health_spark.operators.similarity import (  # noqa: E402
    cosine_topk,
    ivf_topk,
    lsh_ann_topk,
    pq_encode,
    pq_topk,
    pq_train,
)
from hw_kafka_flink_health_spark.session import get_spark  # noqa: E402
from hw_kafka_flink_health_spark.sources.files import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
K = 5
N_QUERIES = 16


def pairs(df) -> set[tuple]:
    return {
        (r["query_id"], r["neighbor_id"])
        for r in df.select("query_id", "neighbor_id").collect()
    }


def main() -> None:
    spark = get_spark(app_name="bench-ann", shuffle_partitions=32)
    corpus = load_table(spark, SF_DIR, "embeddings")
    queries = corpus.filter(F.col("vec_id") < N_QUERIES)
    corpus.count()  # warm the scan

    t = time.time()
    exact = pairs(cosine_topk(corpus, queries, k=K))
    t_exact = round(time.time() - t, 3)
    print(json.dumps({"tier": "exact", "sec": t_exact, "recall": 1.0}))

    t = time.time()
    got = pairs(ivf_topk(corpus, queries, k=K, n_clusters=16, n_probe=4))
    print(json.dumps({
        "tier": "ivf(16,probe4)", "sec": round(time.time() - t, 3),
        "recall": round(len(got & exact) / len(exact), 3),
    }))

    t = time.time()
    got = pairs(lsh_ann_topk(corpus, queries, k=K))
    print(json.dumps({
        "tier": "lsh", "sec": round(time.time() - t, 3),
        "recall": round(len(got & exact) / len(exact), 3),
    }))

    t = time.time()
    codebooks, _ = pq_train(corpus, m=8, codebook_size=256, sample_size=1000)
    codes = pq_encode(corpus, codebooks)
    got = pairs(pq_topk(codes, queries, codebooks, k=K))
    print(json.dumps({
        "tier": "pq(m8,k256)", "sec": round(time.time() - t, 3),
        "recall": round(len(got & exact) / len(exact), 3),
    }))

    spark.stop()


if __name__ == "__main__":
    main()
