"""Assembled query catalog: importing the submodules populates the registry."""

from hw_kafka_flink_health_spark.queries import (  # noqa: F401
    analytics,
    cep,
    evalmetrics,
    experiment,
    geo,
    graph,
    incremental,
    inference,
    ledger,
    mlprep,
    recursive,
    reference,
    relational,
    resampling,
    retrieval,
    runtime_filters,
    stats,
    text,
    timeseries,
    tpch,
    tpch2,
    vectors,
)
from hw_kafka_flink_health_spark.queries._registry import ORACLES, QUERIES

__all__ = ["QUERIES", "ORACLES"]
