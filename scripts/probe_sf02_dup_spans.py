"""One-off probe (VERDICT r7 item 4): text_cross_doc_dup_spans carried
the catalog's highest SCALING alpha (0.70 over the 0.01->0.1 decade) —
does the curve flatten or steepen past sf0.1 after the round-8 reshape
(single map-side-combined gram aggregate, no postings join)?

/root/testdata has no sf0.2, so this builds one in /tmp FOR THIS PROBE
ONLY (never as query input): documents doubled with the doc_id space
shifted past the existing max — twice the postings, the axis the gram
aggregate actually scales in. (The copies share their originals' grams,
so every gram goes df>=2; that changes the OUTPUT, not the cost shape
being measured.) Run from repo root AFTER any other Spark work is quiet:

    python scripts/probe_sf02_dup_spans.py
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
SF02 = "/tmp/spark_graft_sf0.2_spans_probe"
REPS = 3


def build_sf02(spark) -> None:
    shutil.rmtree(SF02, ignore_errors=True)
    os.makedirs(SF02)
    docs = spark.read.parquet(f"{SF01}/documents.parquet")
    shift = docs.agg(F.max("doc_id")).first()[0] + 1
    doubled = docs.unionByName(
        docs.withColumn("doc_id", F.col("doc_id") + F.lit(shift))
    )
    doubled.write.parquet(f"{SF02}/documents.parquet")


def timed(spark, sf_dir: str) -> float:
    best = math.inf
    for _ in range(REPS):
        t0 = time.perf_counter()
        QUERIES["text_cross_doc_dup_spans"](spark, sf_dir).write.format(
            "noop"
        ).mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    spark = get_spark(
        app_name="probe_sf02_dup_spans",
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
        f"text_cross_doc_dup_spans sf0.1={t01:.2f}s sf0.2(2x docs)={t02:.2f}s"
        f" ratio={t02 / t01:.2f} alpha(0.1->0.2)={alpha:.2f}"
    )
    shutil.rmtree(SF02, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
