"""Runtime-filtered joins: dynamic partition pruning + bloom runtime
filters — the two scan-reduction levers that only pay off at scale.

At 100 TB the difference between these plans and their naive twins is not
a constant factor, it's which fraction of the table gets READ:

* **DPP** (`dpp_partitioned_revenue`): the fact is laid down partitioned
  by the pruning key; at runtime the dim side's filter result becomes an
  IN-list over partition directories (`dynamicpruningexpression` in the
  scan's PartitionFilters), so a 3-month query over a 7-year fact opens
  3/84 of the directories. Static pruning can't do this — the month list
  is only known after filtering the dim.
* **Bloom runtime filter** (`bloom_filtered_join_revenue`): when the
  filtered dim is too big to broadcast (the normal case at cluster
  scale), `InjectRuntimeFilter` builds a bloom filter over the dim's join
  keys and applies it inside the fact scan's Filter
  (`might_contain(...)`), dropping non-joining fact rows BEFORE the
  shuffle. The shuffle — the 100 TB bottleneck — shrinks by the join
  selectivity instead of carrying every row to the join.

Neither exists in the reference (it has no joins at all — SURVEY §2.B);
this is the driver-mandated relational surface's scale path
(BASELINE.json north star: runtime-filtered scans).

Both queries are value-checked against DuckDB twins on the ORIGINAL
(unpartitioned) tables — the layout must never change the answer — and
their physical plans are pinned in tests/test_plans.py.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hw_kafka_flink_health_spark.operators.storage import (
    materialize_partitioned,
    runtime_bloom_session,
)
from hw_kafka_flink_health_spark.queries._registry import register
from hw_kafka_flink_health_spark.sources.files import load_table


def _dpp_cache_dir(sf_dir: str) -> str:
    tag = os.path.basename(sf_dir.rstrip("/")) or "sf"
    return os.path.join(
        tempfile.gettempdir(), "spark_graft_dpp", f"{tag}_lineitem_by_ship_month"
    )


def lineitem_by_ship_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-once /tmp materialization of lineitem partitioned by
    ship month ('yyyy-MM' string, ~84 directories over the 7-year
    TPC-H date range) — the layout DPP prunes against."""

    def build() -> DataFrame:
        return load_table(spark, sf_dir, "lineitem").withColumn(
            "ship_month", F.date_format("l_shipdate", "yyyy-MM")
        )

    return materialize_partitioned(
        spark, build, _dpp_cache_dir(sf_dir), partition_cols="ship_month"
    )


@register(
    "dpp_partitioned_revenue",
    oracle="""
    SELECT ship_month,
           sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT))
             / 100.0 AS revenue,
           count(*) AS n_items
    FROM (SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
                 l_extendedprice, l_discount
          FROM lineitem) l
    WHERE ship_month IN (
      SELECT DISTINCT strftime(o_orderdate, '%Y-%m')
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1995-01-01'
        AND o_orderdate <= TIMESTAMP '1995-03-31')
    GROUP BY ship_month
    """,
)
def dpp_partitioned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by ship month, months chosen by a runtime dim filter.

    The fact scan's partition filter is DYNAMIC: Catalyst wraps the
    broadcast of the filtered dim in a `dynamicpruningexpression`, so
    only the matching ship_month directories are listed and read
    (asserted in tests/test_plans.py::test_dpp_fact_scan_is_pruned).
    The dim (distinct order months of Q1 1995) is exactly the subquery
    a calendar/dimension table plays on a real cluster. Oracle runs on
    the unpartitioned table — layout must not change the answer.
    """
    fact = lineitem_by_ship_month(spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders")
    dim = (
        orders.filter(
            (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp_ntz"))
            & (F.col("o_orderdate") <= F.lit("1995-03-31").cast("timestamp_ntz"))
        )
        .select(F.date_format("o_orderdate", "yyyy-MM").alias("ship_month"))
        .distinct()
    )
    return (
        fact.join(dim, "ship_month")
        .groupBy("ship_month")
        .agg(
            (
                F.sum(
                    F.floor(
                        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                     + 0.5).cast("bigint")
                )
                / 100.0
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "bloom_filtered_join_revenue",
    oracle="""
    SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
           sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT))
             / 100.0 AS revenue,
           count(*) AS n_items
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderpriority = '1-URGENT'
    GROUP BY order_month
    """,
)
def bloom_filtered_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Urgent-order revenue by month through a bloom-runtime-filtered
    shuffle join: the selective orders side (~1/5 of orders) seeds a
    bloom filter that the lineitem scan applies before shuffling
    (`might_contain` in the fact side's Filter — asserted in
    tests/test_plans.py::test_bloom_runtime_filter_reaches_fact_scan).

    Runs on a conf-cloned session (see `runtime_bloom_session`) so the
    shuffle-join + threshold overrides that make the rule fire at demo
    scale never leak into other queries' plans; result values are
    conf-independent (same rows either way) and value-hashed against the
    DuckDB twin.
    """
    s = runtime_bloom_session(spark)
    li = load_table(s, sf_dir, "lineitem")
    orders = load_table(s, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("order_month"))
        .agg(
            (
                F.sum(
                    F.floor(
                        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                     + 0.5).cast("bigint")
                )
                / 100.0
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def _bucket_tag(sf_dir: str) -> str:
    tag = os.path.basename(sf_dir.rstrip("/")) or "sf"
    return tag.replace(".", "_").replace("-", "_")


def bucketed_orders_customer(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """Session-cached bucketed twins of orders and customer, both
    bucketed 8 ways on the customer key — the co-located layout
    join_bucketed_colocated demonstrates."""
    from hw_kafka_flink_health_spark.operators.storage import materialize_bucketed

    tag = _bucket_tag(sf_dir)
    orders = materialize_bucketed(
        spark,
        lambda: load_table(spark, sf_dir, "orders").select(
            "o_custkey", "o_totalprice"
        ),
        f"bkt_orders_{tag}",
        bucket_col="o_custkey",
    )
    cust = materialize_bucketed(
        spark,
        lambda: load_table(spark, sf_dir, "customer").select(
            F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
        ),
        f"bkt_customer_{tag}",
        bucket_col="o_custkey",
    )
    return orders, cust


@register(
    "join_bucketed_colocated",
    oracle="""
    SELECT c.c_mktsegment AS segment,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS revenue_cents
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by market segment through a BUCKETED co-located join:
    both sides are laid down bucketed 8 ways on the customer key
    (`materialize_bucketed`), so the join's hash-partitioning
    requirement is satisfied at rest and the plan carries ZERO exchanges
    on either join side (pinned by tests/test_plans.py::
    test_bucketed_join_has_no_exchange, with broadcast disabled so the
    assertion can't be satisfied trivially). This is the recurring-join
    answer at 100 TB: the shuffle — the stage that dominates every
    repeated fact⋈dim-on-highcard-key join — is paid ONCE at ingest
    instead of per query. The oracle runs on the ORIGINAL unbucketed
    tables: layout must never change the answer."""
    orders, cust = bucketed_orders_customer(spark, sf_dir)
    return (
        orders.join(cust, "o_custkey")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long"))
            .cast("long")
            .alias("revenue_cents"),
        )
    )
