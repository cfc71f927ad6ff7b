"""Assembled query catalog: importing the submodules populates the registry."""

from hw_kafka_flink_health_spark.queries import reference, relational, text, vectors  # noqa: F401
from hw_kafka_flink_health_spark.queries._registry import ORACLES, QUERIES

__all__ = ["QUERIES", "ORACLES"]
