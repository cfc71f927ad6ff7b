"""Plan-inspection helpers shared by the structural plan gates
(tests/test_window_sweep.py) and the scout script
(scripts/sweep_unpartitioned_windows.py)."""

from hw_kafka_flink_health_spark.plans.windows import (  # noqa: F401
    analyzed_str,
    capture_checkpoints,
    split_top_level,
    unpartitioned_specs,
)
