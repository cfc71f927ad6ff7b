"""Query registry: name -> (spark, sf_dir) -> DataFrame, plus DuckDB oracle.

Every operator the engine claims (SURVEY.md §2) registers here; the driver
(and tests/test_oracle.py) runs each Spark query against its ANSI-SQL twin
on the same parquet tables. Queries without an oracle (LSH, streaming-only)
get a rows-only check — keep that set small and justified.

Conventions that make the value-hash comparison meaningful:
* Alias every computed column identically in Spark and SQL.
* Round floating aggregates (round(x, 2..4)) in BOTH engines — double
  summation order differs legitimately; rounding absorbs the jitter.
* Cast integer-ish results so types line up (DuckDB SUM(int)->HUGEINT needs
  ::BIGINT; Spark length()/year()/rank() int -> cast to long).
* Timestamps: emit epoch millis (unix_millis vs epoch_ms) or TIMESTAMP_NTZ.
* NEVER let a nullable expression reach a window ORDER BY: DuckDB's
  parallel window places a NULL sort key NONDETERMINISTICALLY (observed:
  three different outputs on identical data, explicit NULLS FIRST does
  not pin it), so the oracle itself flakes run-to-run. Filter the NULLs
  or coalesce the key to a sentinel — identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        assert name not in QUERIES, f"duplicate query name {name}"
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
