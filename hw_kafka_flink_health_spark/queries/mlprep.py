"""Training-data prep queries over `documents` (SURVEY §2.C extensions)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hw_kafka_flink_health_spark.operators.mlprep import (
    normalize_text_expr,
    stratified_sample,
    train_valid_test_split,
)
from hw_kafka_flink_health_spark.queries._registry import register
from hw_kafka_flink_health_spark.sources.files import load_table


@register(
    "mlprep_hash_split",
    oracle="""
    SELECT doc_id,
           CASE WHEN b < 8 THEN 'train' WHEN b < 9 THEN 'valid' ELSE 'test' END AS split
    FROM (
      SELECT doc_id,
             CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10 AS b
      FROM documents
    ) t
    """,
)
def mlprep_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 split — per-document assignment checked
    value-by-value against the engine-portable md5-bucket expression."""
    docs = load_table(spark, sf_dir, "documents")
    return train_valid_test_split(docs, "doc_id").select("doc_id", "split")


@register(
    "mlprep_split_sizes",
    oracle="""
    SELECT split, count(*) AS n, count(DISTINCT lang) AS langs
    FROM (
      SELECT lang,
             CASE WHEN b < 8 THEN 'train' WHEN b < 9 THEN 'valid' ELSE 'test' END AS split
      FROM (
        SELECT lang,
               CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10 AS b
        FROM documents
      ) t
    ) s
    GROUP BY split ORDER BY split
    """,
)
def mlprep_split_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-size audit: every split must see every language (leakage /
    starvation check an ML pipeline runs before training)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        train_valid_test_split(docs, "doc_id")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("lang").cast("bigint").alias("langs"),
        )
        .orderBy("split")
    )


@register(
    "text_normalized",
    oracle="""
    SELECT doc_id,
           trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                ' +', ' ', 'g')) AS norm_text
    FROM documents
    """,
)
def text_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical normalization (lower/strip/collapse) — the preprocessing
    stage every dedup and fingerprint operator assumes; value-hashed
    against the SQL twin so the two regex dialects provably agree."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", normalize_text_expr("text").alias("norm_text"))


@register("mlprep_stratified_sample")  # seeded engine RNG: rows-only
def mlprep_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-rebalancing sample: downsample the dominant language,
    keep the rest. Statistical contract asserted in tests/test_mlprep.py."""
    docs = load_table(spark, sf_dir, "documents")
    langs = [r["lang"] for r in docs.select("lang").distinct().collect()]
    fractions = {lng: (0.25 if lng == "en" else 0.9) for lng in langs}
    return stratified_sample(docs, "lang", fractions, seed=42).select(
        "doc_id", "lang", "source"
    )
