from hw_kafka_flink_health_spark.operators.relational import asof_join, top_k_per_group

__all__ = ["asof_join", "top_k_per_group"]
