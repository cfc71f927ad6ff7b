"""Relational operators beyond plain DataFrame calls.

The reference has no joins at all (SURVEY §2.B); these are the
driver-mandated extension operators (SURVEY §2.C), written so Catalyst
keeps full control of the physical strategy.

As-of join design (Spark has no native ASOF): the naive formulation —
theta-join on ``right.ts <= left.ts`` then argmax — explodes to a
nested-loop join at scale. The scalable formulation used here is
union-then-window: tag both inputs, sort once per key by time, and carry
the most recent right-side value forward with ``last(..., ignorenulls)``
over an unbounded-preceding frame. One shuffle on the key, one sort —
exactly what a hand-written merge-asof would do, but expressed
declaratively so it parallelizes per key group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str,
    value_cols: list[str],
    *,
    right_ts_alias: str = "asof_ts",
    direction: str = "backward",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """For each left row, attach the nearest right row in time.

    ``direction`` matches pandas ``merge_asof``: "backward" takes the
    latest right row with ts <= left.ts, "forward" the earliest with
    ts >= left.ts, "nearest" whichever of the two is closer in absolute
    time (ties -> the earlier/backward row, pandas' rule). Ties at equal
    timestamps match in every direction. Left rows keep all their
    columns; right values arrive as `value_cols` plus `right_ts_alias`
    (null when no qualifying right row exists).

    ``tolerance_seconds`` matches pandas ``merge_asof(tolerance=...)``:
    a candidate farther than the tolerance does not match (its values
    come back null; the left row itself always survives). For "nearest"
    the tolerance filters each side BEFORE the nearest pick, pandas'
    rule — a stale backward row within tolerance still loses to a
    closer forward row, and an out-of-tolerance side loses outright.
    Requires a timestamp-castable ``ts_col`` (same precondition the
    "nearest" distance math already has); the comparison is exact in
    microseconds. Same plan either way: the mask is a column expression
    over the one sorted exchange — no extra shuffle.

    All three directions are the SAME plan shape: one union, one shuffle
    on the key, one sort — "nearest" just reads two running fills off the
    one sorted exchange instead of one (no second shuffle, no self-join;
    the naive nearest-via-range-join is a quadratic blowup at 100 TB).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown asof direction {direction!r}")
    # Tag and union; right rows sort before left rows at equal timestamps
    # so an exactly-simultaneous right row is visible to the left row (<=).
    right_types = dict(right.dtypes)
    l_tagged = left.select(
        F.lit(1).alias("__is_left"),
        F.col(ts_col).alias("__ts"),
        *[F.col(c) for c in left.columns],
        *[F.lit(None).cast(right_types[c]).alias(f"__r_{c}") for c in value_cols],
        F.lit(None).cast(right_types[ts_col]).alias("__r_ts"),
    )
    r_tagged = right.select(
        F.lit(0).alias("__is_left"),
        F.col(ts_col).alias("__ts"),
        *[
            (F.col(on) if c == on else F.lit(None).cast(t)).alias(c)
            for c, t in left.dtypes
        ],
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
        F.col(ts_col).alias("__r_ts"),
    )
    unioned = l_tagged.select(r_tagged.columns).unionByName(r_tagged)

    # Backward fill: right rows sort BEFORE left at equal ts so <= is
    # inclusive. Forward fill: right rows sort AFTER left at equal ts so
    # >= is inclusive (frame starts at the current row).
    wb = (
        Window.partitionBy(on)
        .orderBy(F.col("__ts").asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy(on)
        .orderBy(F.col("__ts").asc(), F.col("__is_left").desc())
        .rowsBetween(0, Window.unboundedFollowing)
    )
    cols = ["*"]
    if direction in ("backward", "nearest"):
        cols += [
            F.last(f"__r_{c}", ignorenulls=True).over(wb).alias(f"__b_{c}")
            for c in value_cols
        ] + [F.last("__r_ts", ignorenulls=True).over(wb).alias("__b_ts")]
    if direction in ("forward", "nearest"):
        cols += [
            F.first(f"__r_{c}", ignorenulls=True).over(wf).alias(f"__fw_{c}")
            for c in value_cols
        ] + [F.first("__r_ts", ignorenulls=True).over(wf).alias("__fw_ts")]
    filled = unioned.select(*cols)

    # micros via an explicit TIMESTAMP cast: unix_micros rejects
    # TIMESTAMP_NTZ, and ANSI mode rejects timestamp->long casts; the
    # session TZ is pinned UTC so the NTZ->TZ cast is stable.
    def _us(c: str):
        return F.unix_micros(F.col(c).cast("timestamp"))

    if tolerance_seconds is not None:
        tol_us = int(round(tolerance_seconds * 1_000_000))
        ok_b = (_us("__ts") - _us("__b_ts")) <= tol_us
        ok_f = (_us("__fw_ts") - _us("__ts")) <= tol_us
        # Mask ONLY the columns this function constructed (exact names
        # derived from value_cols plus the two fill timestamps) — a
        # caller column that happens to start with '__b_'/'__fw_' must
        # pass through untouched (ADVICE r10).
        b_mask = {f"__b_{c}" for c in value_cols} | {"__b_ts"}
        f_mask = {f"__fw_{c}" for c in value_cols} | {"__fw_ts"}
        masked = []
        for c in filled.columns:
            if c in b_mask:
                masked.append(F.when(ok_b, F.col(c)).alias(c))
            elif c in f_mask:
                masked.append(F.when(ok_f, F.col(c)).alias(c))
            else:
                masked.append(F.col(c))
        filled = filled.select(*masked)
    if direction == "backward":
        pick = {c: F.col(f"__b_{c}") for c in value_cols} | {"ts": F.col("__b_ts")}
    elif direction == "forward":
        pick = {c: F.col(f"__fw_{c}") for c in value_cols} | {"ts": F.col("__fw_ts")}
    else:
        # nearest: backward wins ties (pandas merge_asof nearest keeps the
        # earlier row on equal distance); a missing side loses outright.
        back_wins = F.when(F.col("__fw_ts").isNull(), F.lit(True)).otherwise(
            F.col("__b_ts").isNotNull()
            & ((_us("__ts") - _us("__b_ts")) <= (_us("__fw_ts") - _us("__ts")))
        )
        pick = {
            c: F.when(back_wins, F.col(f"__b_{c}")).otherwise(F.col(f"__fw_{c}"))
            for c in value_cols
        } | {"ts": F.when(back_wins, F.col("__b_ts")).otherwise(F.col("__fw_ts"))}
    return filled.filter(F.col("__is_left") == 1).select(
        *[F.col(c) for c in left.columns],
        *[pick[c].alias(c) for c in value_cols],
        pick["ts"].alias(right_ts_alias),
    )


def top_k_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list,
    k: int,
    rank_alias: str = "rank",
) -> DataFrame:
    """Top-k rows per group via row_number (deterministic iff order_cols
    form a total order within each group — pass a unique tiebreaker).

    Scale note: Spark plans this as a shuffle on group_cols + per-partition
    sort; with AQE, skewed groups split. No driver-side work.
    """
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn(rank_alias, F.row_number().over(w).cast("long"))
        .filter(F.col(rank_alias) <= k)
    )


def merge_upsert(
    base: DataFrame, updates: DataFrame, key_cols: list[str]
) -> DataFrame:
    """Batch MERGE INTO semantics: rows from `updates` win on key match,
    unmatched base rows pass through (whole-row upsert; deletes are a
    pre-filter on `updates`'s side).

    Shape: one left-anti join (base minus updated keys) + union — the
    anti join shuffles only the key columns of the probe side and
    broadcasts when `updates` is small. This is the foreachBatch sink's
    batch twin, and the layout-preserving path at 100 TB: with both
    sides bucketed by the key (operators/storage.py) the anti join is
    exchange-free, which is how an incremental corpus refresh avoids
    rewriting unrelated partitions.
    """
    if base.columns != updates.columns:
        raise ValueError("merge_upsert requires identical schemas")
    keep = base.join(updates.select(*key_cols), key_cols, "left_anti")
    return keep.unionByName(updates)


def winsorize(
    df: DataFrame,
    group_col: str,
    value_col: str,
    *,
    lo: float = 0.01,
    hi: float = 0.99,
) -> DataFrame:
    """Clip `value_col` to per-group exact [lo, hi] percentiles — the
    outlier-trim pass before aggregate features feed a model (sensor
    glitches in a health stream, crawler junk in a corpus).

    Exact `percentile` (not approx) so results are engine-checkable; the
    per-group percentiles are one aggregation (sort-based, spillable),
    broadcast back onto the rows. At 100 TB swap in percentile_approx
    and the plan shape is unchanged while the percentile pass becomes a
    streaming sketch merge.
    """
    pcts = df.groupBy(group_col).agg(
        F.percentile(value_col, F.lit(lo)).alias("_p_lo"),
        F.percentile(value_col, F.lit(hi)).alias("_p_hi"),
    )
    return (
        df.join(F.broadcast(pcts), group_col)
        .withColumn(
            f"{value_col}_clipped",
            F.least(F.greatest(F.col(value_col), F.col("_p_lo")), F.col("_p_hi")),
        )
        .withColumn(
            "was_clipped",
            (F.col(value_col) != F.col(f"{value_col}_clipped")).cast("int"),
        )
    )


def binned_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point_col: str,
    start_col: str,
    end_col: str,
    bin_width: int,
) -> DataFrame:
    """Interval-containment join (start <= point <= end) WITHOUT an equi key,
    kept hash-partitionable by binning — the range-join trick Spark's planner
    does not do for you (a bare theta join plans as BroadcastNestedLoopJoin,
    which is quadratic work at scale).

    Each interval is exploded to every fixed-width bin it overlaps
    (``sequence(floor(start/w), floor(end/w))`` — at most
    ``len/w + 2`` rows per interval); each point maps to exactly ONE bin,
    so after the equi join on the bin plus the exact containment filter,
    every qualifying (point, interval) pair appears exactly once — no
    dedup pass needed. Pick ``bin_width`` near the typical interval length:
    replication factor stays ~2 while the join is an ordinary shuffled hash
    join that AQE can size and skew-split. Columns must be numeric
    (cast dates to day numbers first)."""
    w = F.lit(bin_width)
    iv = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / w), F.floor(F.col(end_col) / w)
            )
        ),
    )
    pt = points.withColumn("__bin", F.floor(F.col(point_col) / w))
    return (
        pt.join(iv, "__bin")
        .filter(
            (F.col(point_col) >= F.col(start_col))
            & (F.col(point_col) <= F.col(end_col))
        )
        .drop("__bin")
    )


def global_prefix_sum(
    df: DataFrame,
    value_col: str,
    order_cols: list,
    *,
    out_col: str = "running_total",
    n_partitions: int | None = None,
) -> DataFrame:
    """Scalable GLOBAL running sum (cumulative sum over a total order
    spanning the whole table) — without the single-task global window
    `Window.orderBy(...)` would plan.

    Two-pass distributed prefix sum, the textbook scan algorithm mapped
    onto Spark:

    1. `repartitionByRange(order_cols)` range-partitions the rows so
       partition i holds a contiguous slice of the total order, then a
       partition-local window computes the within-partition cumsum (each
       task sorts only its slice).
    2. Per-partition totals (ONE row per partition — bounded, collected
       to the driver) become exclusive partition offsets, broadcast back
       and added to the local cumsum.

    The result is independent of where the sampled range boundaries land
    (prefix sums don't care how the order is cut), so the output is
    deterministic even though RangePartitioner's sampling isn't. At
    100 TB this is one range shuffle + one tiny broadcast — vs the
    global-window plan that funnels every row through one task.
    """
    return global_prefix_sums(
        df,
        [value_col],
        order_cols,
        out_cols=[out_col],
        n_partitions=n_partitions,
    )


def global_prefix_sums(
    df: DataFrame,
    value_cols: list,
    order_cols: list,
    *,
    out_cols: list | None = None,
    n_partitions: int | None = None,
) -> DataFrame:
    """Multi-column :func:`global_prefix_sum`: ONE range shuffle + ONE
    bounded offsets collect computes the inclusive running total of EACH
    value column over the same total order. Callers that need several
    cumulative series on one ordered table (two-sample ECDFs, paired
    debit/credit ledgers) would otherwise pay the shuffle per column.

    The partition-local window is shared, so Catalyst evaluates all the
    cumsums in a single Window operator over one sort; the offsets pass
    collects one row per partition carrying every column's partition
    total (bounded: ``n_partitions`` rows).
    """
    if out_cols is None:
        out_cols = [f"{c}_running" for c in value_cols]
    if len(out_cols) != len(value_cols):
        raise ValueError(
            f"out_cols ({len(out_cols)}) must pair 1:1 with "
            f"value_cols ({len(value_cols)})"
        )
    staging = {"_pid", *(f"_ls_{i}" for i in range(len(value_cols)))}
    clash = staging & set(df.columns)
    if clash:
        raise ValueError(
            f"global_prefix_sums reserves column names {sorted(clash)}; "
            "rename them on the input frame first"
        )
    n = n_partitions or df.sparkSession.sparkContext.defaultParallelism
    ordered = df.repartitionByRange(n, *order_cols)
    wloc = (
        Window.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = ordered.withColumn("_pid", F.spark_partition_id())
    for i, vc in enumerate(value_cols):
        local = local.withColumn(f"_ls_{i}", F.sum(vc).over(wloc))
    # RangePartitioner SAMPLES its boundaries, so two executions of the
    # same plan can cut the order differently; the offsets job and the
    # final job must see ONE materialization — pin it (same lineage-
    # truncation pattern as the connected-components loop).
    local = local.localCheckpoint()
    # Partition total = SUM of values (== the partition's LAST running
    # value). max(_local_sum) would only coincide for non-negative
    # inputs and silently inflates offsets for signed values (sweep-line
    # +1/-1 deltas) — caught by max_concurrent_sessions' oracle.
    totals = local.groupBy("_pid").agg(
        *[F.sum(vc).alias(f"_pt_{i}") for i, vc in enumerate(value_cols)]
    ).collect()
    accs = [0] * len(value_cols)
    offsets: dict[int, list] = {}
    for r in sorted(totals, key=lambda r: r["_pid"]):
        offsets[r["_pid"]] = list(accs)
        for i in range(len(value_cols)):
            accs[i] += r[f"_pt_{i}"] or 0
    out = local
    for i, oc in enumerate(out_cols):
        if offsets:
            off_expr = F.element_at(
                F.create_map(
                    *[
                        F.lit(x)
                        for pid, offs in offsets.items()
                        for x in (pid, offs[i])
                    ]
                ),
                F.col("_pid"),
            )
        else:  # empty input: no partitions produced rows
            off_expr = F.lit(0)
        out = out.withColumn(oc, F.col(f"_ls_{i}") + off_expr)
    return out.drop("_pid", *(f"_ls_{i}" for i in range(len(value_cols))))


def _range_local_row_number(
    df: DataFrame, order_cols: list, n_partitions: int | None
) -> DataFrame:
    """Pass 1 of the distributed rank: range-partition on the total
    order, then a PARTITION-LOCAL row_number (the window hash-partitions
    on `_pid`, so no single-partition exchange exists anywhere in the
    plan — pinned by tests/test_plans.py). Factored out un-checkpointed
    so the plan tests can inspect the shape the checkpoint later hides.
    """
    n = n_partitions or df.sparkSession.sparkContext.defaultParallelism
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    ordered = df.repartitionByRange(n, *cols)
    return ordered.withColumn("_pid", F.spark_partition_id()).withColumn(
        "_local_rn",
        F.row_number().over(Window.partitionBy("_pid").orderBy(*cols)),
    )


def distributed_row_number(
    df: DataFrame,
    order_cols: list,
    *,
    out_col: str = "rn",
    n_partitions: int | None = None,
    total_col: str | None = None,
) -> DataFrame:
    """Scalable GLOBAL ``row_number`` over a total order — the rank/ntile
    sibling of :func:`global_prefix_sum`, replacing the plan shape
    ``Window.orderBy(...)`` produces (an ``Exchange SinglePartition``
    that funnels EVERY row through one task — the one shape that dies at
    100 TB fact cardinality).

    Same two-pass scan algorithm:

    1. ``repartitionByRange(order_cols)`` range-partitions the rows so
       partition i holds a contiguous slice of the total order; a
       partition-local window computes the within-partition row_number
       (each task sorts only its own slice).
    2. Per-partition ROW COUNTS (one row per partition — bounded,
       collected to the driver) become exclusive offsets, broadcast back
       and added to the local row_number.

    ``order_cols`` must be a TOTAL order (include a tie-break column):
    with distinct sort keys the global row_number is independent of
    where RangePartitioner's sampled boundaries land, so the output is
    deterministic even though the sampling isn't. The checkpoint pins
    ONE materialization so the offsets job and the final job agree.

    ``total_col``, when set, also attaches the global row count as a
    literal column — callers that would otherwise compute N via
    ``count().over(Window.partitionBy())`` (another single-partition
    exchange) get it for free from the offsets pass.
    """
    # Loud guard, not silent clobber: withColumn REPLACES an existing
    # column, so a caller frame already carrying an internal staging
    # name would lose that column with no error (the asof_join
    # __b_/__fw_ hazard class, ADVICE r10 / review r11).
    clash = {"_pid", "_local_rn"} & set(df.columns)
    if clash:
        raise ValueError(
            f"distributed_row_number reserves column names {sorted(clash)}; "
            "rename them on the input frame first"
        )
    # Pin one materialization: RangePartitioner samples its boundaries,
    # so the counts job and the final job must see the SAME cut.
    local = _range_local_row_number(df, order_cols, n_partitions).localCheckpoint()
    counts = local.groupBy("_pid").agg(F.count(F.lit(1)).alias("_pcount")).collect()
    offsets = {}
    acc = 0
    for r in sorted(counts, key=lambda r: r["_pid"]):
        offsets[r["_pid"]] = acc
        acc += r["_pcount"]
    if offsets:
        off_expr = F.element_at(
            F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv]),
            F.col("_pid"),
        )
    else:  # empty input: no partitions produced rows
        off_expr = F.lit(0)
    out = local.withColumn(
        out_col, (F.col("_local_rn") + off_expr).cast("long")
    ).drop("_pid", "_local_rn")
    if total_col is not None:
        out = out.withColumn(total_col, F.lit(acc).cast("long"))
    return out


def distributed_ntile(
    df: DataFrame,
    n_tiles: int,
    order_cols: list,
    *,
    out_col: str = "tile",
    n_partitions: int | None = None,
) -> DataFrame:
    """Scalable GLOBAL ``ntile(k)`` — SQL-standard semantics (bucket
    sizes differ by at most one, larger buckets first) derived from
    :func:`distributed_row_number` plus pure arithmetic, instead of the
    single-partition window ``F.ntile(k).over(Window.orderBy(...))``
    plans.

    With N total rows (known exactly from the offsets pass), q = N // k
    and rem = N % k: the first ``rem`` buckets hold q+1 rows, the rest q
    — exactly how Spark and DuckDB place NTILE boundaries, so results
    hash-match the builtin bit-for-bit while the plan stays one range
    shuffle + one tiny broadcast. ``order_cols`` must be a total order
    (tie-break included), same contract as the builtin call sites had.
    """
    clash = {"_grn", "_gn", "_big", "_rem"} & set(df.columns)
    if clash:
        raise ValueError(
            f"distributed_ntile reserves column names {sorted(clash)}; "
            "rename them on the input frame first"
        )
    ranked = distributed_row_number(
        df, order_cols, out_col="_grn", n_partitions=n_partitions, total_col="_gn"
    )
    rn = F.col("_grn")
    # N is already on every row as a literal; read it back driver-side
    # free of charge from the lineage (it was a Python int in the
    # offsets pass) — but deriving q/rem as COLUMN arithmetic keeps the
    # operator a pure function of the frame, so do that instead.
    # All tile arithmetic is integral (`DIV`, not float divide-then-
    # floor): long/long `/` yields DOUBLE in Spark, which silently
    # loses exactness past 2^53 — and this operator is pitched at
    # unbounded row counts (ADVICE r10).
    q = F.expr(f"_gn DIV {int(n_tiles)}")
    rem = F.col("_gn") % n_tiles
    big = q + 1
    staged = ranked.withColumn("_big", big).withColumn("_rem", rem)
    tile = F.when(
        rn <= F.col("_rem") * F.col("_big"),
        F.expr("(_grn - 1) DIV _big") + 1,
    ).otherwise(
        # greatest(q,1): when N < k the first branch covers every row
        # (rem == N, big == 1); the guard only keeps the unevaluated
        # branch well-formed under ANSI division semantics.
        F.col("_rem")
        + F.expr("(_grn - _rem * _big - 1) DIV greatest(_big - 1, CAST(1 AS BIGINT))")
        + 1
    )
    return staged.withColumn(out_col, tile.cast("long")).drop(
        "_grn", "_gn", "_big", "_rem"
    )
