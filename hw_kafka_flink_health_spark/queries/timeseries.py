"""Time-series queries over `events`: gap-filled resampling and snapshot
diffing. Extends the reference's windowed-monitoring surface
(`/root/reference/src/flink_job.py:104-128`) with the batch time-series
ops a feature pipeline needs."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hw_kafka_flink_health_spark.operators.timeseries import (
    resample_forward_fill,
    snapshot_diff,
)
from hw_kafka_flink_health_spark.queries._registry import register
from hw_kafka_flink_health_spark.sources.files import load_table


@register(
    "timeseries_gapfill",
    oracle="""
    WITH bucketed AS (
      SELECT user_id, date_trunc('day', ts) AS bucket_ts, avg(value) AS bucket_avg
      FROM events GROUP BY 1, 2
    ),
    spine AS (
      SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS bucket_ts
      FROM (SELECT user_id, min(bucket_ts) AS lo, max(bucket_ts) AS hi
            FROM bucketed GROUP BY 1)
    ),
    j AS (
      SELECT s.user_id, s.bucket_ts, b.bucket_avg
      FROM spine s LEFT JOIN bucketed b USING (user_id, bucket_ts)
    )
    SELECT user_id,
           epoch_ms(bucket_ts) AS bucket_ms,
           round(bucket_avg, 4) AS bucket_avg,
           round(ff, 4) AS value_ffill,
           CAST(CASE WHEN bucket_avg IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_gap
    FROM (
      SELECT user_id, bucket_ts, bucket_avg,
             last_value(bucket_avg IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY bucket_ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ff
      FROM j
    )
    """,
)
def timeseries_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense per-user daily grid with forward fill — the resample step
    between raw events and an ML feature matrix (which can't have holes).
    Value-hash-checked against DuckDB generate_series + IGNORE NULLS
    last_value."""
    events = load_table(spark, sf_dir, "events")
    ff = resample_forward_fill(events, "user_id", "ts", "value", bucket="1 day")
    return ff.select(
        "user_id",
        F.unix_millis(F.col("bucket_ts").cast("timestamp")).alias("bucket_ms"),
        F.round("bucket_avg", 4).alias("bucket_avg"),
        F.round("value_ffill", 4).alias("value_ffill"),
        F.col("is_gap").cast("bigint").alias("is_gap"),
    )


@register(
    "snapshot_diff_orders",
    oracle="""
    WITH old_s AS (
      SELECT * FROM orders WHERE o_orderkey % 97 <> 0
    ),
    new_s AS (
      SELECT o_orderkey, o_custkey, o_orderstatus,
             CASE WHEN o_orderkey % 50 = 0
                  THEN round(o_totalprice * 1.1, 2)
                  ELSE o_totalprice END AS o_totalprice,
             o_orderdate, o_orderpriority
      FROM orders WHERE o_orderkey % 89 <> 0
    )
    SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
           CASE WHEN o.o_orderkey IS NULL THEN 'added'
                WHEN n.o_orderkey IS NULL THEN 'removed'
                WHEN o.o_totalprice <> n.o_totalprice THEN 'changed'
           END AS status
    FROM old_s o FULL OUTER JOIN new_s n ON o.o_orderkey = n.o_orderkey
    WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL
       OR o.o_totalprice <> n.o_totalprice
    """,
)
def snapshot_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC between two simulated snapshots of `orders`: rows only in the
    new snapshot are 'added', rows only in the old are 'removed', rows
    whose payload hash differs are 'changed' (a deterministic 10% price
    restatement). The diff joins on (key, md5-of-payload) so no payload
    column crosses the shuffle."""
    orders = load_table(spark, sf_dir, "orders")
    old = orders.filter(F.col("o_orderkey") % 97 != 0)
    new = orders.filter(F.col("o_orderkey") % 89 != 0).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 50 == 0,
            F.round(F.col("o_totalprice") * 1.1, 2),
        ).otherwise(F.col("o_totalprice")),
    )
    return snapshot_diff(old, new, ["o_orderkey"])
