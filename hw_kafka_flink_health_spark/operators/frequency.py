"""Frequency analysis at scale: exact heavy hitters via two-phase pruning.

Extension surface (SURVEY.md §2.C): the reference counts alert types in a
toy batch job (`/root/reference/src/spark_batch_analysis.py:14-28`, a plain
groupBy); the 100 TB version of "which keys are frequent" cannot afford to
shuffle ONE ROW PER DISTINCT KEY when the key space is huge (tokens,
URLs, user agents: billions of distinct, almost all singletons) and only
heavy keys are wanted.

Two-phase exact algorithm (the distributed Misra-Gries bound):

  phase 1 (candidates): count per (shuffle-partition, key) — map-side
      combined, so the shuffle carries partial counts, not rows — and
      keep keys whose LOCAL count >= threshold / P in any partition.
      Guarantee: a key with GLOBAL count >= threshold must average
      >= threshold/P over P partitions, hence exceed it in at least one
      — no false negatives, ever. Singletons (the overwhelming mass)
      die here without a global per-key aggregate surviving the shuffle.
  phase 2 (exact recount): semi-join the input on the (hash-bucketed,
      typically tiny) candidate set, groupBy ONLY candidate keys, keep
      count >= threshold. Exact counts, exact membership.

Cost: two scans; the first shuffles O(P x candidates+noise) partial rows,
the second shuffles only rows whose key is a candidate. A single-phase
groupBy shuffles O(distinct keys) rows — at token scale, thousands of
times more. Oracle-checked (plain HAVING count >= t) in the registry.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def heavy_hitters(
    df: DataFrame,
    key: str | Column,
    *,
    threshold: int,
    partitions: int | None = None,
) -> DataFrame:
    """Exactly the keys occurring >= `threshold` times, with exact counts.

    The P in the threshold/P candidate bound is the input's ACTUAL
    partition count — the bound is only sound when P >= the number of
    partitions the key can be spread across (a key with global count t
    over P partitions need only show t/P locally). `partitions` can
    RAISE the divisor (looser bound, more candidates, e.g. to keep the
    bound valid across a planned repartition); values below the actual
    count are ignored rather than allowed to break the guarantee.

    Returns (key, cnt) with cnt exact, descending by cnt then key.
    """
    kcol = F.col(key) if isinstance(key, str) else key
    keyed = df.select(kcol.alias("key")).filter(F.col("key").isNotNull())
    p = max(keyed.rdd.getNumPartitions(), partitions or 0)
    local_bound = max(1, threshold // p)
    # phase 1: per-(partition, key) counts; spark_partition_id() pins the
    # pre-shuffle locality so the groupBy's map-side combine produces at
    # most one partial row per (partition, key)
    candidates = (
        keyed.withColumn("__pid", F.spark_partition_id())
        .groupBy("__pid", "key")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= local_bound)
        .select("key")
        .distinct()
    )
    # phase 2: exact recount over candidate keys only
    return (
        keyed.join(F.broadcast(candidates), "key", "left_semi")
        .groupBy("key")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .filter(F.col("cnt") >= threshold)
        .orderBy(F.col("cnt").desc(), F.col("key").asc())
    )
