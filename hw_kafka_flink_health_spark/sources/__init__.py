from hw_kafka_flink_health_spark.sources.files import load_table, load_tables, register_views

__all__ = ["load_table", "load_tables", "register_views"]
