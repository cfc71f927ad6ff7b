"""Skew-mitigation: salted two-phase aggregation.

AQE handles skewed JOINS automatically (skew-join splitting, on in
session.py); skewed AGGREGATION keys are the operator-level counterpart.
A hot key that receives 10^9 rows serializes one reducer; salting splits
it across `n_salts` reducers and recombines — two small shuffles instead
of one stuck one.

Only algebraic aggregates decompose this way (sum/count/min/max/avg via
sum+count); the API takes an explicit spec to keep that constraint
visible.

Extension surface (SURVEY §2.C): 100 TB skew posture; the reference runs at parallelism=1 (src/flink_job.py:56) and never shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# aggregate name -> (phase1 partial, phase2 recombine)
_ALGEBRAIC = {
    "sum": (F.sum, F.sum),
    "count": (lambda c: F.count(c), F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    group_cols: list[str],
    aggs: dict[str, tuple[str, str]],
    *,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation with key salting.

    `aggs` maps output column -> (agg_name, input_col), agg_name in
    {sum, count, min, max, avg}. avg decomposes to sum+count internally.

    Phase 1 groups by (key, salt) — the hot key's rows spread over
    n_salts partial groups; phase 2 groups by key and recombines. Result
    is EXACTLY the unsalted groupBy (verified in tests), at the cost of
    one extra (tiny: one row per key per salt) shuffle.
    """
    internal: dict[str, tuple[str, str]] = {}
    finals: dict[str, Column] = {}
    for out, (name, col) in aggs.items():
        if name == "avg":
            internal[f"__{out}_sum"] = ("sum", col)
            internal[f"__{out}_cnt"] = ("count", col)
            finals[out] = F.col(f"__{out}_sum") / F.col(f"__{out}_cnt")
        elif name in _ALGEBRAIC:
            internal[out] = (name, col)
            finals[out] = F.col(out)
        else:
            raise ValueError(f"{name!r} is not algebraic; salting would be wrong")

    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    )
    phase1 = salted.groupBy(*group_cols, "__salt").agg(
        *[
            _ALGEBRAIC[name][0](col).alias(out)
            for out, (name, col) in internal.items()
        ]
    )
    phase2 = phase1.groupBy(*group_cols).agg(
        *[
            _ALGEBRAIC[internal[out][0]][1](out).alias(out)
            for out in internal
        ]
    )
    return phase2.select(*group_cols, *[expr.alias(out) for out, expr in finals.items()])


def salted_join(
    big: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    *,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Salted equi join for a skewed big side.

    AQE's skew-join splitting covers most batch cases; this is the
    explicit form for when it can't run — streaming micro-batch joins,
    or a key whose skew is known a priori. The big side gets a
    deterministic salt in [0, n_salts); the dim side is replicated
    n_salts times (explode over a literal range), so every (key, salt)
    bucket finds its match and the hot key's rows spread over n_salts
    reducers. Replication costs n_salts x |dim| shuffle rows — use for a
    dim too big to broadcast but far smaller than the fact. Result is
    EXACTLY the plain join (verified in tests) — but only for join types
    where the replicated dim side never surfaces unmatched: a right/full
    outer would emit each unmatched dim row n_salts times, so those are
    rejected (mirrors interval_join's whitelist).
    """
    allowed = {"inner", "left", "leftouter", "left_outer", "semi",
               "leftsemi", "left_semi", "anti", "leftanti", "left_anti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports only big-side-preserving join types "
            f"{sorted(allowed)}; got {how!r} (the replicated dim side would "
            f"duplicate unmatched rows)"
        )
    keys = [on] if isinstance(on, str) else list(on)
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts))
    b = big.withColumn("__salt", salt.cast("int"))
    d = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<int>"))
    )
    return b.join(d, [*keys, "__salt"], how).drop("__salt")
