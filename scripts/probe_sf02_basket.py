"""One-off probe (VERDICT r5 item 6): does basket_frequent_itemsets'
0.64 alpha over the 0.01->0.1 decade flatten or steepen past sf0.1?

/root/testdata has no sf0.2, so this builds one in /tmp FOR THIS PROBE
ONLY (never as query input): lineitem doubled with the order-key space
shifted past the existing max (twice the baskets, same item universe —
the axis FP-Growth actually scales in), part verbatim. Run from repo
root AFTER any other Spark work is quiet:

    python scripts/probe_sf02_basket.py
"""

from __future__ import annotations

import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from hw_kafka_flink_health_spark.queries import QUERIES  # noqa: E402
from hw_kafka_flink_health_spark.session import get_spark  # noqa: E402

SF01 = "/root/testdata/sf0.1"
SF02 = "/tmp/spark_graft_sf0.2_probe"
REPS = 3


def build_sf02(spark) -> None:
    shutil.rmtree(SF02, ignore_errors=True)
    os.makedirs(SF02)
    li = spark.read.parquet(f"{SF01}/lineitem.parquet")
    shift = li.agg(F.max("l_orderkey")).first()[0] + 1
    doubled = li.unionByName(
        li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(shift))
    )
    doubled.write.parquet(f"{SF02}/lineitem.parquet")
    spark.read.parquet(f"{SF01}/part.parquet").write.parquet(
        f"{SF02}/part.parquet"
    )


def timed(spark, sf_dir: str) -> float:
    best = math.inf
    for _ in range(REPS):
        t0 = time.perf_counter()
        QUERIES["basket_frequent_itemsets"](spark, sf_dir).write.format(
            "noop"
        ).mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    spark = get_spark(
        app_name="probe_sf02_basket",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    build_sf02(spark)
    # interleave so machine drift hits both sides equally
    t01a = timed(spark, SF01)
    t02a = timed(spark, SF02)
    t01 = min(t01a, timed(spark, SF01))
    t02 = min(t02a, timed(spark, SF02))
    alpha = math.log(t02 / t01) / math.log(2.0)
    print(
        f"basket_frequent_itemsets sf0.1={t01:.2f}s sf0.2(2x baskets)={t02:.2f}s"
        f" ratio={t02 / t01:.2f} alpha(0.1->0.2)={alpha:.2f}"
    )
    shutil.rmtree(SF02, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
