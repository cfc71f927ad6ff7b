"""Batch alert analysis — the reference's spark_batch_analysis.py surface.

Reference spec (``src/spark_batch_analysis.py:14-28`` + README Part 3):
read the alert JSON directory written by the streaming job (S6), group by
(patient_id, alert_type) and count (A2), write parquet/csv overwrite (S7).

Runnable: ``python -m hw_kafka_flink_health_spark.streaming.batch_analysis
--input_path output/alerts --output_path output/stats [--format csv]``
"""

from __future__ import annotations

import argparse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Alert files carry the C2 JSON shape (src/flink_job.py:113-122). Schema is
# declared, not inferred — inference is an extra full pass at scale.
ALERT_FILE_SCHEMA = T.StructType(
    [
        T.StructField("patient_id", T.StringType(), True),
        T.StructField("window_start", T.LongType(), True),
        T.StructField("window_end", T.LongType(), True),
        T.StructField("avg_hr", T.DoubleType(), True),
        T.StructField("min_hr", T.IntegerType(), True),
        T.StructField("max_hr", T.IntegerType(), True),
        T.StructField("alert_type", T.StringType(), True),
    ]
)


def alert_counts(alerts: DataFrame) -> DataFrame:
    """A2: alerts grouped by (patient, type) with counts + window stats."""
    return alerts.groupBy("patient_id", "alert_type").agg(
        F.count(F.lit(1)).alias("n_alerts"),
        F.round(F.avg("avg_hr"), 4).alias("mean_avg_hr"),
        F.min("min_hr").alias("min_hr"),
        F.max("max_hr").alias("max_hr"),
    )


def run(spark: SparkSession, input_path: str, output_path: str, fmt: str = "parquet") -> DataFrame:
    alerts = spark.read.schema(ALERT_FILE_SCHEMA).json(input_path)
    stats = alert_counts(alerts)
    writer = stats.write.mode("overwrite")
    if fmt == "csv":
        writer.option("header", "true").csv(output_path)
    else:
        writer.parquet(output_path)
    return stats


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input_path", required=True)
    p.add_argument("--output_path", required=True)
    p.add_argument("--format", default="parquet", choices=["parquet", "csv"])
    args = p.parse_args()

    from hw_kafka_flink_health_spark.session import get_spark

    spark = get_spark(app_name="HeartRateBatchAnalysis")
    try:
        run(spark, args.input_path, args.output_path, args.format)
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
