"""Exact distributed quantiles by histogram refinement — no global sort.

Extension surface (SURVEY.md §2.C): the reference has no quantile support
at all; Spark ships `approx_percentile` (bounded error) and `percentile`
(exact, but a full sort-based aggregate). At 100 TB neither is the right
default for a handful of exact ranks: this is classic two-pass rank
selection —

  pass 1: one scan -> fixed-width bucket histogram on (min, max).
          Map-side combined; the shuffle is <= n_buckets rows TOTAL,
          independent of input size. The cumulative histogram (a few kB)
          comes back to the driver — bounded metadata, not data.
  pass 2: locate each target rank's bucket, then one more scan sorts
          ONLY rows falling in those buckets (~1/n_buckets of the data)
          and picks the exact ranked element per quantile.

Two scans and a sliver-sort replace a full-table sort; ranks are exact,
semantics are SQL-standard discrete quantiles (PERCENTILE_DISC /
DuckDB `quantile_disc`): the smallest element whose cumulative
distribution reaches q, i.e. zero-based position ceil(q * n) - 1 in
ascending order. (floor((n-1) * q) — "lower interpolation" — coincides
with this on most (n, q) but diverges when q*n and q*(n-1) straddle an
integer, e.g. n=3, q=0.99: caught by the single-row/tiny-table fuzz
sweep.)

Degenerate case (massively duplicated values): a bucket can hold far more
than n/n_buckets rows, but pass 2 still only sorts that bucket's rows,
and equal values make ANY element of the run a correct answer.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def exact_quantiles(
    df: DataFrame,
    col: str,
    qs: list[float],
    *,
    n_buckets: int = 4096,
) -> DataFrame:
    """Exact discrete quantiles of `df[col]` (nulls excluded).

    Returns a DataFrame (q double, val <col type>) with one row per
    requested quantile, computed in two scans as described in the module
    docstring. Driver-side state is the cumulative histogram
    (`n_buckets` longs) and the final len(qs) answers — both bounded.
    """
    x = F.col(col)
    base = df.select(x.alias("__x")).filter(F.col("__x").isNotNull())

    stats = base.select(
        F.min("__x").alias("mn"),
        F.max("__x").alias("mx"),
        F.count(F.lit(1)).alias("n"),
    ).first()
    mn, mx, n = stats.mn, stats.mx, stats.n
    if n == 0:
        raise ValueError(f"exact_quantiles: no non-null rows in {col}")
    # zero-based ceiling ranks (SQL PERCENTILE_DISC: smallest value with
    # cume_dist >= q); clamped for q=0 and float-overshoot at q=1
    ranks = {
        q: 0 if q <= 0 else min(n - 1, math.ceil(q * n) - 1) for q in qs
    }

    if mn == mx:
        return base.sparkSession.createDataFrame(
            [(float(q), mn) for q in qs], schema=["q", "val"]
        )

    span = float(mx) - float(mn)
    bucket = F.least(
        F.lit(n_buckets - 1),
        F.floor((F.col("__x").cast("double") - F.lit(float(mn))) / F.lit(span) * n_buckets),
    ).cast("int")
    hist = (
        base.groupBy(bucket.alias("b"))
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy("b")
        .collect()  # bounded: <= n_buckets (count, id) pairs of metadata
    )

    # cumulative walk: bucket holding each rank + rows strictly below it
    targets: dict[int, list[tuple[float, int]]] = {}
    below = 0
    it = iter(hist)
    cur = next(it)
    cum = cur.c
    for q in sorted(qs, key=lambda q: ranks[q]):
        r = ranks[q]
        while cum <= r:
            below = cum
            cur = next(it)
            cum += cur.c
        targets.setdefault(cur.b, []).append((q, r - below))

    # pass 2: rank within ONLY the target buckets (a ~len(targets)/n_buckets
    # sliver of the data); row_number per bucket over value order
    wanted = list(targets.keys())
    w = Window.partitionBy("__b").orderBy(F.col("__x").asc())
    sliver = (
        base.withColumn("__b", bucket)
        .filter(F.col("__b").isin(wanted))
        .withColumn("__r", F.row_number().over(w) - 1)
    )
    # (bucket, within-rank) -> q lookup, broadcast as a literal filter
    conds = None
    rows = []
    for b, pairs in targets.items():
        for q, within in pairs:
            c = (F.col("__b") == b) & (F.col("__r") == within)
            conds = c if conds is None else (conds | c)
            rows.append((b, within, float(q)))
    lookup = base.sparkSession.createDataFrame(
        rows, schema=["__b", "__r", "q"]
    )
    return (
        sliver.filter(conds)
        .join(F.broadcast(lookup), ["__b", "__r"])
        .select("q", F.col("__x").alias("val"))
        .orderBy("q")
    )
