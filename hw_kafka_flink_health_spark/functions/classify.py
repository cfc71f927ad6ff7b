"""Window classification (C1) + alert serialization (C2).

Reference contract (``src/flink_job.py:35-46``, ``README`` thresholds,
``tests/test_flink_logic.py:26-35``): strict inequalities —
avg > 100 -> "tachycardia", avg < 50 -> "bradycardia", else "normal"
(100.0 and 50.0 are both "normal").
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TACHYCARDIA_THRESHOLD = 100.0
BRADYCARDIA_THRESHOLD = 50.0


def classify_window(avg_hr: float) -> str:
    """Pure-Python twin of the reference classify_window (src/flink_job.py:35-46)."""
    if avg_hr > TACHYCARDIA_THRESHOLD:
        return "tachycardia"
    if avg_hr < BRADYCARDIA_THRESHOLD:
        return "bradycardia"
    return "normal"


def classify_expr(avg_hr: Column | str) -> Column:
    """C1 as a Catalyst when-chain (codegen'd; no Python at runtime)."""
    c = F.col(avg_hr) if isinstance(avg_hr, str) else avg_hr
    return (
        F.when(c > TACHYCARDIA_THRESHOLD, F.lit("tachycardia"))
        .when(c < BRADYCARDIA_THRESHOLD, F.lit("bradycardia"))
        .otherwise(F.lit("normal"))
    )


def alert_json_expr() -> Column:
    """C2: alert record -> JSON string for the Kafka sink.

    Field shape matches the reference alert record
    (src/flink_job.py:113-122): patient_id, window_start, window_end
    (epoch millis), avg_hr, min_hr, max_hr, alert_type.
    """
    return F.to_json(
        F.struct(
            "patient_id",
            "window_start",
            "window_end",
            "avg_hr",
            "min_hr",
            "max_hr",
            "alert_type",
        )
    ).alias("value")
