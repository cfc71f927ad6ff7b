from hw_kafka_flink_health_spark.functions.parsing import (
    parse_event,
    parse_events_df,
    annotate_df,
)
from hw_kafka_flink_health_spark.functions.classify import (
    classify_window,
    classify_expr,
    alert_json_expr,
)

__all__ = [
    "parse_event",
    "parse_events_df",
    "annotate_df",
    "classify_window",
    "classify_expr",
    "alert_json_expr",
]
