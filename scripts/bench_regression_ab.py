"""Round-5 controlled re-measure of the r3->r4 'regression' set
(VERDICT r4 item 2): rollup_hour_day, dpp_partitioned_revenue,
dedup_clusters, privacy_k_anonymity — 5 repetitions, order-interleaved
(A/B style: every query measured once per round, so machine-load drift
hits all queries equally instead of whichever ran last), plus a stable
control query (q1_pricing_summary) to expose environment noise directly.
Prints one JSON line with per-query [reps], median, min; run at sf0.1:

    python scripts/bench_regression_ab.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SET = [
    "q1_pricing_summary",  # control
    "rollup_hour_day",
    "dpp_partitioned_revenue",
    "dedup_clusters",
    "privacy_k_anonymity",
]
REPS = 5


def main() -> None:
    from pyspark.sql import functions as F

    from hw_kafka_flink_health_spark.queries import QUERIES
    from hw_kafka_flink_health_spark.queries.runtime_filters import (
        lineitem_by_ship_month,
    )
    from hw_kafka_flink_health_spark.session import get_spark

    spark = get_spark(app_name="bench_ab", extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    # same warmup discipline as bench.py
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").agg(F.sum("l_quantity")).write.format(
        "noop"
    ).mode("overwrite").save()
    lineitem_by_ship_month(spark, SF_DIR)

    reps: dict[str, list[float]] = {n: [] for n in SET}
    for _ in range(REPS):
        for name in SET:
            t0 = time.perf_counter()
            QUERIES[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            reps[name].append(round(time.perf_counter() - t0, 3))
    out = {
        name: {
            "reps": rs,
            "median": sorted(rs)[len(rs) // 2],
            "min": min(rs),
        }
        for name, rs in reps.items()
    }
    print(json.dumps({"sf": SF_DIR, "queries": out}, separators=(",", ":")))
    spark.stop()


if __name__ == "__main__":
    main()
