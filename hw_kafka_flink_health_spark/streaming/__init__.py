from hw_kafka_flink_health_spark.streaming.health_pipeline import (
    windowed_vitals,
    heart_rate_alerts,
    build_streaming_job,
)

__all__ = ["windowed_vitals", "heart_rate_alerts", "build_streaming_job"]
