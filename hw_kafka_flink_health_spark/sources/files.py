"""Batch file sources/sinks (reference operators S5-S7).

The reference's batch half reads JSON alert files and writes parquet/csv
(``src/spark_batch_analysis.py:22-26``). Here the same surface is generic:
parquet-first loaders for the synthetic star schema plus JSON/CSV helpers.

Scale notes:
* Parquet scans go through Spark's vectorized reader; filters/projections
  prune at the file/row-group level (check ``PushedFilters`` in explain).
* ``events.ts`` is stored as parquet TIMESTAMP(NANOS); Spark 4 reads it
  (with ``spark.sql.legacy.parquet.nanosAsLong``) as a long, so the loader
  converts to a microsecond TIMESTAMP_NTZ here, once, at the source —
  downstream operators always see a real timestamp column.
"""

from __future__ import annotations

import os
from collections import OrderedDict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hw_kafka_flink_health_spark.schemas import STAR_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one synthetic table; normalizes `events.ts` nanos -> timestamp.

    `ts DIV 1000` is integer division on the JVM side — a float division
    would lose precision above 2^53 ns (~1970+104 days), so epoch-nanos
    MUST stay integral until the final cast.
    """
    # Defend against caller sessions (e.g. the driver's) missing the
    # engine's correctness confs — both are runtime-settable:
    # * nanosAsLong: events.parquet stores TIMESTAMP(NANOS), which Spark 4
    #   otherwise rejects at scan time;
    # * UTC session TZ: epoch-millis math (unix_millis over NTZ casts)
    #   must agree with UTC-naive oracle engines.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts DIV 1000")).cast("timestamp_ntz")
        )
    return df


# Scan-partitioning probe cache for rebalance_if_narrow, keyed by the
# scan's file list PLUS the session split settings: df.rdd.
# getNumPartitions() compiles a fresh RDD lineage for the whole plan on
# EVERY call (~0.3s of per-query planning overhead measured at round 7),
# while the answer only depends on the source files and the session's
# split confs (maxPartitionBytes / openCostInBytes / defaultParallelism
# — all in the key, so a session that retunes them mid-flight, like the
# repartition-invariance fuzz sweep, never reads a stale probe). Narrow
# transforms (select/filter) never change scan partitioning, so one
# probe per distinct (files, confs) is exact for this helper's contract
# (below). OrderedDict + LRU cap keeps a long-lived session bounded:
# every versioned-table write changes the file set, so an uncapped dict
# grows forever (round-7 verdict #6).
_NARROW_PROBE_CACHE: "OrderedDict[tuple, int]" = OrderedDict()
_NARROW_PROBE_CACHE_MAX = 256


def rebalance_if_narrow(df: DataFrame) -> DataFrame:
    """Round-robin repartition ONLY when the plan is under-partitioned.

    Generator-heavy stages (explode over replicate ids / shingles) multiply
    each input row tens-to-hundreds of times; a small parquet scans as 1-2
    partitions and would pin that whole expansion to 1-2 cores. When the
    scan already has >= defaultParallelism partitions (any real-scale
    table), this returns the input UNCHANGED — no shuffle is ever added to
    a well-partitioned plan, which matters because the rebalanced
    projection may carry heavy columns (document text) that must not be
    re-shuffled wholesale at 100 TB.

    Contract: pass a SCAN-ROOTED NARROW plan (projections/filters over one
    file source, no joins/aggregates upstream) — every in-repo caller does.
    The partition probe is cached per file set (see _NARROW_PROBE_CACHE);
    a plan with no file source falls back to an uncached probe."""
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    try:
        files = tuple(sorted(df.inputFiles()))
    except Exception:
        files = ()
    key = None
    if files:
        # conf.get(key, default) VALIDATES the default against the conf
        # type in Spark 4 — an unset conf must be probed with try, not a
        # sentinel default
        def _conf(k: str) -> str:
            try:
                return spark.conf.get(k)
            except Exception:
                return "<default>"

        key = (
            files,
            _conf("spark.sql.files.maxPartitionBytes"),
            _conf("spark.sql.files.openCostInBytes"),
            target,
        )
    n = _NARROW_PROBE_CACHE.get(key) if key else None
    if n is None:
        n = df.rdd.getNumPartitions()
        if key:
            _NARROW_PROBE_CACHE[key] = n
            if len(_NARROW_PROBE_CACHE) > _NARROW_PROBE_CACHE_MAX:
                _NARROW_PROBE_CACHE.popitem(last=False)
    else:
        _NARROW_PROBE_CACHE.move_to_end(key)
    if n >= target:
        return df
    return df.repartition(target)


def file_stats_signature(files: tuple) -> tuple:
    """(size, mtime_ns) per input file, for session-cache keys (ADVICE
    r12): part names are unique per Spark/parquet WRITER, but this
    repo's fixtures are single fixed-name files, so an in-session
    overwrite at the same path must change the key. Non-local URIs
    (no os.stat) contribute None — the cache then degrades to
    name-keyed, its pre-r13 behavior."""
    import os
    from urllib.parse import unquote, urlparse

    out = []
    for f in files:
        p = f
        if p.startswith("file:"):
            p = unquote(urlparse(p).path)
        try:
            st = os.stat(p)
            out.append((st.st_size, st.st_mtime_ns))
        except OSError:
            out.append(None)
    return tuple(out)


def checkpoint_partitioned(df: DataFrame, *cols: str) -> DataFrame:
    """localCheckpoint `df` hash-partitioned on `cols`, with
    the partitioning PRESERVED in the checkpointed frame's plan — the
    in-session analog of writing a bucketed+sorted table (guide §2.4):
    every downstream join or aggregate keyed on `cols` reuses the layout
    instead of re-shuffling the table, which is the whole per-round edge
    shuffle of an iterative graph query.

    Two Spark mechanics make the function non-obvious:

    * `Dataset.localCheckpoint` only carries `outputPartitioning` /
      `outputOrdering` into the resulting `LogicalRDD` when the physical
      plan's partitioning maps onto plain output attributes. Under AQE
      the executed plan is an `AdaptiveSparkPlan` whose final partitioning
      is not exposed that way, so the checkpoint comes back
      `UnknownPartitioning` (measured: the r13 LPA join re-shuffled 1.17M
      cached edge rows per round, then AQE broadcast the 15 MB edge side
      and coalesced the node-sized probe to ONE task). AQE is therefore
      disabled around this one action and restored after.
    * The partition count is pinned to `spark.sql.shuffle.partitions` so
      EnsureRequirements recognizes the table as co-partitioned with any
      join side it plans at the session default — a mismatched count
      would re-shuffle the pre-partitioned side.

    Scale note: this writes no constant anywhere — the layout follows the
    session's shuffle parallelism, exactly like the ingest-time bucketing
    a 100 TB graph pipeline runs once before its iterative phase.
    """
    spark = df.sparkSession
    n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # no sortWithinPartitions: the ordering would only help a same-key
    # SMJ skip its sort, and these joins either broadcast the small side
    # (local scale) or sort node-sized tables, not this one; the sort
    # measured +0.3 s per build for no downstream change (r13)
    staged = df.repartition(n, *cols)
    old = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        return staged.localCheckpoint()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in STAR_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every synthetic table as a temp view for spark.sql()."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)


def read_json_dir(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """S6: batch-read a directory of JSON records (alert files).

    Always pass a schema in production — schema inference is a full extra
    pass over 100 TB of input.
    """
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite", partition_by: list[str] | None = None) -> None:
    """S7: parquet sink, overwrite mode like the reference batch job."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S7 (csv variant)."""
    df.write.mode(mode).option("header", "true").csv(path)


def read_parquet_evolved(spark: SparkSession, path: str) -> DataFrame:
    """Read a parquet directory whose files were written under EVOLVING
    schemas (columns added over time, the normal life of a long-lived
    ingest dir). mergeSchema unions the per-file schemas; rows from files
    predating a column read as null there. Off by default in Spark
    because it footer-scans every file — at 100 TB turn it on only for
    evolving landing zones, then compact to the current schema."""
    return spark.read.option("mergeSchema", "true").parquet(path)


def read_csv_robust(
    spark: SparkSession,
    path: str,
    schema,
    *,
    mode: str = "PERMISSIVE",
    corrupt_col: str = "_corrupt_record",
) -> DataFrame:
    """CSV read with the reference's parse-don't-crash contract
    (`parse_event` -> None, SURVEY §2.A P1) applied to files: malformed
    rows land in `corrupt_col` (PERMISSIVE) or are dropped
    (DROPMALFORMED) instead of failing the 100 TB job at hour nine.
    Always takes an explicit schema — inference is a full extra pass."""
    reader = (
        spark.read.schema(schema)
        .option("header", "true")
        .option("mode", mode)
    )
    if mode == "PERMISSIVE":
        reader = reader.option("columnNameOfCorruptRecord", corrupt_col)
    return reader.csv(path)
