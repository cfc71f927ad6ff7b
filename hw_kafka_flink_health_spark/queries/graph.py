"""Graph analytics: fixed-point PageRank over the customer->supplier
purchase graph.

Extension surface (SURVEY.md §2.C): the reference has no joins, let alone
iterative graph algorithms (SURVEY.md §2.B). Connected components already
exist (`operators/dedup.py:dedup_clusters`, min-label propagation); this
adds the other canonical propagation workload, with two scale-bearing
design choices:

* **Fixed-point integer arithmetic.** Ranks are carried in parts-per-
  billion BIGINTs and every operation is integer (`div` truncation,
  integer multiply): bit-identical under any partitioning, any merge
  order, and any engine — which is what makes a value-hash oracle
  possible for an iterative float-ish algorithm at all. (Float PageRank
  differs in the last bits per run; "close" is not checkable by hash.)
* **Unrolled, bounded iterations.** Each iteration is one join + one
  hash aggregate (contributions summed per destination); 3 iterations =
  a plan of 3 shuffle rounds, no driver loop state beyond plan building.
  At 100 TB the edges table partitions on src and the ranks side is the
  small one — broadcast here, shuffle-join at billions of nodes; AQE
  picks per iteration. Dangling nodes (suppliers, which have no
  out-edges) deterministically leak their mass, the standard simplified
  formulation; the teleport term keeps ranks positive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hw_kafka_flink_health_spark.queries._registry import register
from hw_kafka_flink_health_spark.sources.files import load_table

_SCALE = 1_000_000_000
_ITERS = 3


def _oracle() -> str:
    """Build the unrolled DuckDB twin: same integer ops, same order."""
    pre = f"""
    WITH edges AS (
      SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
                      's' || CAST(l_suppkey AS VARCHAR) AS dst
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    ),
    nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
    nn AS (SELECT count(*) AS n FROM nodes),
    outdeg AS (SELECT src, count(*) AS d FROM edges GROUP BY src),
    r0 AS (SELECT node, ({_SCALE} // n)::BIGINT AS rank FROM nodes CROSS JOIN nn)"""
    its = []
    for i in range(1, _ITERS + 1):
        its.append(f"""
    c{i} AS (
      SELECT e.dst AS node, sum(r.rank // o.d)::BIGINT AS s
      FROM edges e JOIN r{i - 1} r ON e.src = r.node
      JOIN outdeg o ON e.src = o.src
      GROUP BY e.dst
    ),
    r{i} AS (
      SELECT nodes.node,
             (({_SCALE * 15} // 100) // n + (85 * COALESCE(c{i}.s, 0)) // 100)::BIGINT AS rank
      FROM nodes CROSS JOIN nn LEFT JOIN c{i} ON nodes.node = c{i}.node
    )""")
    return pre + "," + ",".join(its) + f"\n    SELECT node, rank FROM r{_ITERS}"


@register("graph_pagerank_cust_supp", oracle=_oracle())
def graph_pagerank_cust_supp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-iteration fixed-point PageRank (damping 0.85, ranks in ppb) on
    the bipartite customer->supplier graph induced by orders+lineitem.
    Every arithmetic step is integer, so the result is bit-exact and
    hash-matches the unrolled DuckDB twin."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    edges = (
        orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .distinct()
    )
    nodes = edges.select(F.col("src").alias("node")).union(
        edges.select(F.col("dst").alias("node"))
    ).distinct()
    nn = nodes.agg(F.count(F.lit(1)).alias("n"))
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))

    ranks = nodes.crossJoin(F.broadcast(nn)).select(
        "node", F.expr(f"{_SCALE} div n").cast("long").alias("rank")
    )
    for _ in range(_ITERS):
        contrib = (
            edges.join(ranks.withColumnRenamed("node", "src"), "src")
            .join(outdeg, "src")
            .groupBy("dst")
            .agg(F.sum(F.expr("rank div d")).cast("long").alias("s"))
        )
        ranks = (
            nodes.crossJoin(F.broadcast(nn))
            .join(contrib.withColumnRenamed("dst", "node"), "node", "left")
            .select(
                "node",
                (
                    F.expr(f"({_SCALE * 15} div 100) div n")
                    + F.expr("(85 * coalesce(s, CAST(0 AS BIGINT))) div 100")
                )
                .cast("long")
                .alias("rank"),
            )
        )
    return ranks


@register(
    "graph_degree_histogram",
    oracle="""
    WITH edges AS (
      SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
                      's' || CAST(l_suppkey AS VARCHAR) AS dst
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    ), deg AS (
      SELECT src, CAST(count(*) AS BIGINT) AS out_deg FROM edges GROUP BY src
    )
    SELECT out_deg, CAST(count(*) AS BIGINT) AS n_nodes
    FROM deg GROUP BY out_deg
    """,
)
def graph_degree_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-degree distribution of the purchase graph (same edge
    derivation as PageRank): the first thing to compute before ANY graph
    workload at scale, because the histogram's tail dictates the
    partitioning strategy (a power-law hub means salting / AQE skew
    handling on the join key). Two hash aggs — degree, then histogram —
    each with map-side partials."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    # distinct over the NUMERIC pair — the 'c'/'s' labels of the PageRank
    # edge table are injective per side, so building 2x ~|edges| strings
    # before the distinct shuffle only widened the exchange (measured
    # ~25% of this query's time at sf0.1); label after aggregation if a
    # caller needs node ids
    edges = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select("o_custkey", "l_suppkey")
        .distinct()
    )
    deg = edges.groupBy("o_custkey").agg(F.count(F.lit(1)).cast("long").alias("out_deg"))
    return deg.groupBy("out_deg").agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes")
    )
