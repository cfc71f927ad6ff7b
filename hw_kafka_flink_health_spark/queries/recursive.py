"""Recursive CTE queries (Spark 4 `WITH RECURSIVE`): calendar-spine
gap-fill and hierarchy rollup.

Extension surface (SURVEY.md §2.C, SQL-surface family): the reference has
no SQL interface at all; these pin the two canonical recursive-SQL shapes
a warehouse user expects — generate-a-spine and walk-a-hierarchy — on
Spark 4's native recursive CTE execution (iterative union with a loop
limit, default 100 levels). Both recursions are DEPTH-bounded by data
properties (months in the date range ≈ 80; log₂(max partkey) ≈ 15), not
row counts, so they hold at 100 TB: each iteration is a small
narrow-dependency step and the expensive tables join AFTER the recursion
produces a tiny spine/closure.

Both queries run verbatim in DuckDB (same ANSI recursive syntax), so they
carry full value oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hw_kafka_flink_health_spark.queries._registry import register
from hw_kafka_flink_health_spark.sources.files import load_table

# The spine carries the max bound as a column through the recursion
# (anchor computes both endpoints) because neither engine allows a scalar
# subquery in the recursive term. Monthly grain keeps the recursion depth
# at ~80 — under Spark's default 100-level recursion limit — regardless
# of row count; a daily spine would blow the level limit and should use
# sequence()/generate_series instead (see timeseries_gapfill).
_MONTH_SPINE_SQL = """
WITH RECURSIVE months(m, mx) AS (
  SELECT date_trunc('MONTH', min(o_orderdate)),
         date_trunc('MONTH', max(o_orderdate))
  FROM {orders}
  UNION ALL
  SELECT m + INTERVAL 1 MONTH, mx FROM months WHERE m < mx
)
SELECT months.m AS month_start,
       count(o.o_orderkey)::BIGINT AS n_orders,
       round(coalesce(sum(o.o_totalprice), 0.0), 2) AS revenue
FROM months
LEFT JOIN {orders} o ON date_trunc('MONTH', o.o_orderdate) = months.m
GROUP BY months.m
"""

_PART_HIERARCHY_SQL = """
WITH RECURSIVE anc(part_key, node) AS (
  SELECT p_partkey, p_partkey FROM {part}
  UNION ALL
  SELECT part_key, CAST(FLOOR(node / 2.0) AS BIGINT) FROM anc WHERE node >= 2
)
SELECT node AS ancestor,
       count(*)::BIGINT AS n_desc,
       round(sum(p.p_retailprice), 2) AS subtree_price,
       round(max(p.p_retailprice), 2) AS max_price
FROM anc JOIN {part} p ON anc.part_key = p.p_partkey
WHERE node BETWEEN 1 AND 15
GROUP BY node
"""


def _duck(sql: str) -> str:
    return sql.replace("{orders}", "orders").replace("{part}", "part")


def _spark_sql(
    spark: SparkSession, sf_dir: str, sql: str, tables: dict[str, str]
) -> DataFrame:
    # headroom over the 100-level default: the month spine is ~80 levels
    # on this corpus but a 2x-wider date range would hit the wall; the
    # row limit (default 1M) is the real runaway backstop, so raising the
    # level cap is safe. DuckDB's default max_recursive_cte_iterations is
    # unbounded, so only Spark needs the knob.
    spark.conf.set("spark.sql.cteRecursionLevelLimit", "400")
    binds = {}
    for ph, name in tables.items():
        view = f"__rec_{name}"
        load_table(spark, sf_dir, name).createOrReplaceTempView(view)
        binds[ph] = view
    # Spark's count(x)::BIGINT cast syntax differs; normalize the two
    # DuckDB-isms used above to portable forms for the Spark run.
    portable = sql.replace("::BIGINT", "")
    for ph, view in binds.items():
        portable = portable.replace("{" + ph + "}", view)
    return spark.sql(portable)


@register("recursive_month_spine_revenue", oracle=_duck(_MONTH_SPINE_SQL))
def recursive_month_spine_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-free monthly revenue via a WITH RECURSIVE month spine.

    The recursion generates the ~80-month calendar from the data's own
    min/max (anchor aggregates once; each step adds one month, carrying
    the max bound as a column). The spine is tiny, so the LEFT JOIN
    against orders broadcasts it and the fact table is touched exactly
    once — recursion cost is independent of table size. Months with no
    orders surface as (0, 0.00) rows, which the inner-join-shaped oracle
    would miss; the value hash pins that gap-fill semantic."""
    df = _spark_sql(spark, sf_dir, _MONTH_SPINE_SQL, {"orders": "orders"})
    # count(x) is BIGINT in Spark already; revenue rounding matches oracle.
    return df


@register("recursive_part_hierarchy_rollup", oracle=_duck(_PART_HIERARCHY_SQL))
def recursive_part_hierarchy_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtree rollup via WITH RECURSIVE ancestor closure.

    Parts form an implicit binary tree (parent = ⌊key/2⌋ — a synthetic
    but deterministic BOM stand-in, since TPC-H carries no part
    hierarchy). The recursion emits every (part, ancestor) pair in
    ⌈log₂ max_key⌉ ≈ 15 iterations; closure size is n·log n, NOT n², and
    each iteration is a narrow map over the frontier (no join inside the
    loop — the rollup joins part prices once, after). Restricting output
    to ancestors 1..15 reports the top four levels of the tree."""
    return _spark_sql(spark, sf_dir, _PART_HIERARCHY_SQL, {"part": "part"})


# Holt's linear-trend (double) exponential smoothing. EWMA has a closed
# form (events_ewma), but Holt's COUPLED level/trend recursion does not —
# it is the canonical "genuinely iterative numeric method" and exactly
# what WITH RECURSIVE's one-row-per-step mode is for. The recursion runs
# over the MONTH-grain aggregate (depth = months in the date range, ~84
# here), never over raw rows. Crucial scale detail: Spark does NOT
# materialize non-recursive CTEs referenced from a recursive term — an
# inline `idx` CTE would be re-aggregated from the fact table on EVERY
# iteration (~84 scans of orders). The Spark path therefore
# localCheckpoints the month series first and the recursion joins the
# materialized ~84-row table; DuckDB materializes CTEs, so the oracle
# keeps the whole thing as one statement. Money is summed in integer
# cents so the series entering the recursion is bitwise-identical in
# both engines, and the recursive step is the SAME literal arithmetic
# text in both — level and trend stay bitwise-equal through all
# iterations (rounding only at output).
_HOLT_STEP_SQL = """holt(i, m, y, lvl, trd) AS (
  SELECT i, m, y, y, CAST(0.0 AS DOUBLE) FROM {idx} WHERE i = 1
  UNION ALL
  SELECT x.i, x.m, x.y,
         CAST(0.4 AS DOUBLE) * x.y + CAST(0.6 AS DOUBLE) * (h.lvl + h.trd),
         CAST(0.3 AS DOUBLE)
           * ((CAST(0.4 AS DOUBLE) * x.y
               + CAST(0.6 AS DOUBLE) * (h.lvl + h.trd)) - h.lvl)
           + CAST(0.7 AS DOUBLE) * h.trd
  FROM holt h JOIN {idx} x ON x.i = h.i + 1
)
SELECT i AS step, round(y, 2) AS revenue, round(lvl, 2) AS level,
       round(trd, 2) AS trend, round(lvl + trd, 2) AS forecast_next
FROM holt"""

_HOLT_ORACLE = (
    """
WITH RECURSIVE months AS (
  SELECT date_trunc('MONTH', o_orderdate) AS m,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS c
  FROM orders GROUP BY date_trunc('MONTH', o_orderdate)
), idx AS (
  SELECT m, c / CAST(100.0 AS DOUBLE) AS y,
         CAST(row_number() OVER (ORDER BY m) AS BIGINT) AS i
  FROM months
), """
    + _HOLT_STEP_SQL.format(idx="idx")
)


@register("recursive_holt_linear_trend", oracle=_HOLT_ORACLE)
def recursive_holt_linear_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double exponential smoothing of monthly revenue via WITH
    RECURSIVE (alpha=0.4, beta=0.3): level_t = a*y_t + (1-a)*(level+trend),
    trend_t = b*(level_t - level) + (1-b)*trend, one recursion step per
    month. The heavy part — scan + month aggregate of the fact table —
    runs ONCE and is localCheckpointed; the recursion's per-step join
    touches only the materialized ~84-row series (see module note on why
    inlining the CTE would re-scan orders every iteration). Emits the
    full fitted series plus the one-step-ahead forecast; value-oracled
    exactly (integer-cent inputs, identical step-arithmetic text)."""
    from pyspark.sql import Window as W

    spark.conf.set("spark.sql.cteRecursionLevelLimit", "400")
    orders = load_table(spark, sf_dir, "orders")
    months = orders.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("m")
    ).agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("c"))
    idx = months.select(
        "m",
        (F.col("c") / F.lit(100.0).cast("double")).alias("y"),
        F.row_number().over(W.orderBy("m")).cast("bigint").alias("i"),
    ).localCheckpoint()
    idx.createOrReplaceTempView("__rec_holt_idx")
    return spark.sql(
        "WITH RECURSIVE " + _HOLT_STEP_SQL.format(idx="__rec_holt_idx")
    )
