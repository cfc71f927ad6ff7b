"""Convergence self-verification for the bounded-round iterative
operators (round-7 verdict #3).

Every fixed-round loop in the catalog (k-core peel, DBSCAN cell-label
propagation, BFS expansion) trades an unbounded fixpoint iteration for a
round bound so the DuckDB twin can unroll the identical computation.
That trade is only sound if the bound actually REACHES the fixpoint on
the data at hand — a 100x-scale graph with a longer peel sequence or a
wider diameter could silently return a partial result that still
hash-matches its (equally partial) oracle. These tests pin the
"last-round delta == 0" property two independent ways:

* +1-round invariance: re-running the exact production code path with
  ROUNDS+1 must give a bit-identical result (monotone algorithms only
  shrink/relabel, so any non-converged state would change the output);
* where the output itself carries a fixpoint certificate (k-core: every
  surviving degree >= K iff no further peel is possible), assert the
  certificate directly — that check is scale-independent and is what a
  production run at 100 TB would assert.

`connected_components` needs no bound-vs-fixpoint test: its loop already
self-terminates on an explicit did-anything-change probe (the __changed
filter in operators/dedup.py) — here we pin that the early-exit result
equals a generously-bounded run on a worst-case path graph (diameter ==
node count, the slowest-converging topology for min-label propagation).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hw_kafka_flink_health_spark.operators.dedup import connected_components
from hw_kafka_flink_health_spark.queries import QUERIES
from hw_kafka_flink_health_spark.queries import geo as geo_mod
from hw_kafka_flink_health_spark.queries import graph as graph_mod

from tests.test_oracle import canon

SF_DIR = "/root/testdata/sf0.001"


def _run(name, spark):
    return canon(QUERIES[name](spark, SF_DIR).toPandas())


def test_kcore_bound_reaches_fixpoint(spark, monkeypatch):
    base = _run("graph_kcore", spark)
    monkeypatch.setattr(graph_mod, "_KCORE_ROUNDS", graph_mod._KCORE_ROUNDS + 1)
    assert _run("graph_kcore", spark) == base


def test_kcore_output_certifies_fixpoint(spark):
    """Scale-independent certificate: the peel is at a fixpoint iff every
    SURVIVING node's degree (already in the output!) is >= K — stopping
    early necessarily leaves some survivor under K. This is the check a
    100 TB run asserts without re-running anything."""
    out = QUERIES["graph_kcore"](spark, SF_DIR)
    under = out.filter(F.col("core_degree") < graph_mod._KCORE_K).limit(1).count()
    assert under == 0


def test_dbscan_bound_reaches_fixpoint(spark, monkeypatch):
    """Min-label propagation is monotone decreasing and cluster_id IS the
    label, so any label still in flight would move a cell between output
    groups — aggregate equality under +1 round iff converged."""
    base = _run("geo_dbscan_cells", spark)
    monkeypatch.setattr(geo_mod, "_DBSCAN_ROUNDS", geo_mod._DBSCAN_ROUNDS + 1)
    assert _run("geo_dbscan_cells", spark) == base


def test_bfs_bound_reaches_fixpoint(spark, monkeypatch):
    """An extra BFS round adds rows iff the last frontier was non-empty."""
    base = _run("graph_bfs_distance", spark)
    monkeypatch.setattr(graph_mod, "_BFS_ROUNDS", graph_mod._BFS_ROUNDS + 1)
    assert _run("graph_bfs_distance", spark) == base


def test_connected_components_early_exit_is_fixpoint(spark):
    """Worst-case diameter: a path graph 0-1-2-...-9 needs the most
    min-label rounds of any 10-node topology. The early-exit run must
    equal a generously-bounded one AND the known answer (all nodes
    labeled 0)."""
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], "doc1 long, doc2 long"
    )
    got = connected_components(pairs).toPandas()
    assert sorted(got["node"]) == list(range(10))
    assert set(got["cluster_id"]) == {0}
    generous = connected_components(pairs, max_iterations=50).toPandas()
    assert canon(got) == canon(generous)
