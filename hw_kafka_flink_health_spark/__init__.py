"""hw_kafka_flink_health_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference repo ``ilan-goodman/hw-kafka-flink-health`` (a Kafka+Flink
real-time health-monitoring pipeline), re-expressed Spark-first:

* the reference's streaming pipeline (Kafka JSON events -> parse/validate ->
  event-time windows per patient -> avg/min/max -> classify -> Kafka alerts)
  becomes one Structured Streaming DataFrame chain with zero per-record
  Python (reference: ``src/flink_job.py:62-145``);
* the reference's batch analysis job (``src/spark_batch_analysis.py:14-28``)
  is native DataFrame code;
* on top, a full relational surface (joins, aggregations, analytic windows,
  set ops, scalar functions) plus LLM-data-pipeline operators (dedup,
  similarity search, multimodal columns, text analysis), all designed for
  100 TB scale: declarative plans for Catalyst, broadcast hints for small
  dims, no collect() in any operator path, Arrow-batched pandas UDFs only
  where built-ins can't express the semantics.
"""

from hw_kafka_flink_health_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
