"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

The real catalog lives in ``hw_kafka_flink_health_spark.queries``;
this module is the thin driver-facing adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# The driver may import this module from any cwd; the engine package lives
# next to this file.
_HERE = os.path.dirname(os.path.abspath(__file__))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The reference's whole streaming pipeline as a deterministic batch twin:
    parse -> 1-minute event-time windows per patient -> avg/min/max ->
    classify (tachycardia/bradycardia/normal).
    """
    from hw_kafka_flink_health_spark.queries import QUERIES

    return QUERIES["hr_alerts_tumbling"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from hw_kafka_flink_health_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL twin for each oracle-checkable query.

    Keys absent here (LSH/SimHash/pandas-UDF paths) are approximate or
    engine-hash-dependent by design and get the driver's rows-only check.
    """
    from hw_kafka_flink_health_spark.queries import ORACLES

    return dict(ORACLES)
