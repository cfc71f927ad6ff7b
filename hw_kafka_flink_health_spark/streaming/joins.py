"""Stream-stream (and batch) interval joins.

The reference has no joins of any kind (SURVEY §2.B); this is the
extension-surface operator for correlating two event streams in time —
e.g. attributing each reading to the medication dose that preceded it,
or each purchase to the click that led to it.

Semantics: inner-join rows where keys match and
``left_ts ∈ [right_ts + lower, right_ts + upper]``.

Scale/streaming posture:
* Both sides get a watermark; Spark derives the state-retention bound
  from the watermark + the interval condition, so join state is evicted
  instead of growing forever (the failure mode of unbounded
  stream-stream joins).
* The same function works on batch DataFrames (watermarks are skipped) —
  the batch twin is what the DuckDB oracle checks; Catalyst plans it as
  an equi join on the key with the time bounds as post-join predicates,
  NOT a nested-loop: the equi key keeps it hash-partitionable at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str,
    right_ts: str,
    lower: str = "0 seconds",
    upper: str = "10 minutes",
    watermark: str = "30 seconds",
) -> DataFrame:
    """Inner interval join; columns from both sides survive (key once).

    `lower`/`upper` are INTERVAL strings relative to the right side's
    timestamp. Streaming inputs are watermarked on their own timestamp;
    batch inputs pass through unchanged.
    """
    lw = left.withWatermark(left_ts, watermark) if left.isStreaming else left
    rw = right.withWatermark(right_ts, watermark) if right.isStreaming else right
    lkey = lw[on]
    cond = (
        (lkey == rw[on])
        & (lw[left_ts] >= rw[right_ts] + F.expr(f"INTERVAL {lower}"))
        & (lw[left_ts] <= rw[right_ts] + F.expr(f"INTERVAL {upper}"))
    )
    return lw.join(rw, cond, "inner").drop(rw[on])
