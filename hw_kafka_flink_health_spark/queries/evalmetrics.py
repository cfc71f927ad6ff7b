"""Classifier-evaluation metrics over `documents`: exact AUC-ROC,
thresholded confusion/precision/recall/F1, the full PR curve, and
calibration bins.

Extension surface (SURVEY.md §2.C, LLM-pipeline family): a training-data
pipeline evaluates quality/toxicity/language classifiers on every refresh
— these are the metrics jobs it runs. The worked example scores each
document with its true (synthetic) positive-probability — a clamped
linear ramp in document length, with the label drawn deterministically
under that probability via the md5-unit idiom — so AUC has real signal,
the calibration diagram is near-diagonal by construction, both engines
derive identical (score, label) pairs, and every metric is exactly
value-oracled; swapping in a model-score column changes nothing
structural.

Scale shapes:
* AUC is computed by the rank identity AUC = (R⁺ − n⁺(n⁺+1)/2)/(n⁺n⁻) —
  the Mann-Whitney statistic — over the DISTINCT-SCORE reduction
  (`queries/inference.py` pattern): one hash aggregate to score groups,
  then an ordered pass over |distinct scores| rows, never a global sort
  of documents.
* The PR curve needs cumulative TP/FP at every threshold — the same
  reduction gives the whole exact curve in one window pass.
* Confusion-at-threshold and calibration are single conditional hash
  aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hw_kafka_flink_health_spark.operators.mlprep import hash_unit
from hw_kafka_flink_health_spark.queries._registry import register
from hw_kafka_flink_health_spark.sources.files import load_table

# The worked example needs a (score, label) pair with REAL signal (the
# synthetic corpus's `lang` column is a label with no textual signal —
# every language shares one vocabulary). So the ground truth is built
# the way calibration textbooks do: the true positive-probability is a
# clamped linear ramp in document length — pure +,-,*,/ arithmetic, NO
# libm (exp/log can differ in the last ulp across engines, and score is
# a GROUP KEY) — and the label is a deterministic md5-unit draw under
# that probability (the geo/mlprep hash idiom, replayable in DuckDB).
# The classifier's score IS the true probability, so AUC is genuinely
# informative and the calibration diagram is near-diagonal by
# construction; swapping in a model-score column changes nothing
# structural.
_SCORED_SQL = """
      SELECT CAST(CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR),
                    'lbl')), 1, 8)) AS BIGINT) / 4294967296.0
                  < least(greatest((n_chars - 100) / 500.0, 0.05), 0.95)
                  AS INTEGER) AS label,
             least(greatest((n_chars - 100) / 500.0, 0.05), 0.95) AS score
      FROM documents
      WHERE n_chars IS NOT NULL
"""


def _scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    p = F.least(
        F.greatest((F.col("n_chars") - 100) / 500.0, F.lit(0.05)), F.lit(0.95)
    )
    u = hash_unit(F.col("doc_id"), "lbl")
    return docs.filter(F.col("n_chars").isNotNull()).select(
        (u < p).cast("int").alias("label"), p.alias("score")
    )


@register(
    "eval_auc_roc",
    oracle=f"""
    WITH scored AS ({_SCORED_SQL}),
    byval AS (
      SELECT score, sum(label)::BIGINT AS pos, count(*)::BIGINT AS c
      FROM scored GROUP BY 1
    ),
    ranked AS (
      SELECT pos, c,
             coalesce(sum(c) OVER (ORDER BY score
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + (c + 1) / 2.0 AS avgrank
      FROM byval
    ),
    agg AS (
      SELECT sum(pos)::BIGINT AS n_pos,
             sum(c - pos)::BIGINT AS n_neg,
             sum(pos * avgrank) AS r_pos
      FROM ranked
    )
    SELECT n_pos, n_neg,
           round((r_pos - n_pos * (n_pos + 1) / 2.0)
                 / nullif(CAST(n_pos AS DOUBLE) * n_neg, 0), 6) AS auc
    FROM agg
    """,
)
def eval_auc_roc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact AUC-ROC via the rank identity (probability a random positive
    outscores a random negative, ties at half credit) — no curve
    integration, no sampling. Average ranks come from the distinct-score
    reduction, so the ordered pass touches score groups, not documents;
    tied scores are handled exactly (AUC's ½-credit convention IS the
    average-rank convention)."""
    byval = (
        _scored(spark, sf_dir)
        .filter(F.col("score").isNotNull())
        .groupBy("score")
        .agg(
            F.sum("label").cast("long").alias("pos"),
            F.count(F.lit(1)).cast("long").alias("c"),
        )
    )
    wcum = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, -1)
    ranked = byval.withColumn(
        "avgrank",
        F.coalesce(F.sum("c").over(wcum), F.lit(0)) + (F.col("c") + 1) / 2.0,
    )
    agg = ranked.agg(
        F.sum("pos").cast("long").alias("n_pos"),
        F.sum(F.col("c") - F.col("pos")).cast("long").alias("n_neg"),
        F.sum(F.col("pos") * F.col("avgrank")).alias("r_pos"),
    )
    n_pos = F.col("n_pos")
    return agg.select(
        "n_pos",
        "n_neg",
        F.round(
            F.try_divide(
                F.col("r_pos") - n_pos * (n_pos + 1) / 2.0,
                n_pos.cast("double") * F.col("n_neg"),
            ),
            6,
        ).alias("auc"),
    )


@register(
    "eval_confusion_thresholds",
    oracle=f"""
    WITH scored AS ({_SCORED_SQL})
    SELECT th,
           count(*) FILTER (score >= th AND label = 1)::BIGINT AS tp,
           count(*) FILTER (score >= th AND label = 0)::BIGINT AS fp,
           count(*) FILTER (score < th AND label = 1)::BIGINT AS fn,
           count(*) FILTER (score < th AND label = 0)::BIGINT AS tn,
           round(count(*) FILTER (score >= th AND label = 1)
                 / nullif(CAST(count(*) FILTER (score >= th) AS DOUBLE), 0),
                 6) AS precision,
           round(count(*) FILTER (score >= th AND label = 1)
                 / nullif(CAST(count(*) FILTER (label = 1) AS DOUBLE), 0),
                 6) AS recall
    FROM scored CROSS JOIN (VALUES (0.3), (0.5), (0.7)) t(th)
    WHERE score IS NOT NULL
    GROUP BY th
    """,
)
def eval_confusion_thresholds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix + precision/recall at three operating thresholds
    in ONE pass: each document is replicated against the 3-row literal
    threshold table (explode of a literal array — a width-3 flatMap in
    the scan stage, no join, no second read), then a single conditional
    hash aggregate per threshold. F1 is derivable; precision/recall are
    emitted with NULL-safe division for the empty-prediction edge."""
    scored = _scored(spark, sf_dir).filter(F.col("score").isNotNull())
    th = F.explode(F.array(F.lit(0.3), F.lit(0.5), F.lit(0.7))).alias("th")
    wide = scored.select("label", "score", th)
    pred = F.col("score") >= F.col("th")
    lab = F.col("label") == 1
    tp = F.count(F.when(pred & lab, 1))
    return wide.groupBy("th").agg(
        tp.cast("long").alias("tp"),
        F.count(F.when(pred & ~lab, 1)).cast("long").alias("fp"),
        F.count(F.when(~pred & lab, 1)).cast("long").alias("fn"),
        F.count(F.when(~pred & ~lab, 1)).cast("long").alias("tn"),
        F.round(F.try_divide(tp, F.count(F.when(pred, 1)).cast("double")), 6).alias(
            "precision"
        ),
        F.round(F.try_divide(tp, F.count(F.when(lab, 1)).cast("double")), 6).alias(
            "recall"
        ),
    )


@register(
    "eval_pr_curve",
    oracle=f"""
    WITH scored AS ({_SCORED_SQL}),
    byval AS (
      SELECT score, sum(label)::BIGINT AS pos, count(*)::BIGINT AS c
      FROM scored WHERE score IS NOT NULL GROUP BY 1
    ),
    cums AS (
      SELECT score,
             sum(pos) OVER (ORDER BY score DESC)::BIGINT AS tp,
             sum(c - pos) OVER (ORDER BY score DESC)::BIGINT AS fp,
             sum(pos) OVER ()::BIGINT AS n_pos
      FROM byval
    )
    SELECT score AS threshold, tp, fp,
           round(tp / nullif(CAST(tp + fp AS DOUBLE), 0), 6) AS precision,
           round(tp / nullif(CAST(n_pos AS DOUBLE), 0), 6) AS recall
    FROM cums
    """,
)
def eval_pr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The EXACT precision-recall curve: one point per distinct score,
    treating that score as the decision threshold (predict positive when
    score >= threshold). Cumulative TP/FP over descending distinct
    scores gives every point in a single window pass over the
    distinct-score table — the curve that sklearn computes by sorting
    all rows, here without ever sorting documents. Peers (tied scores)
    collapse into one curve point, which is the mathematically correct
    treatment (a threshold cannot separate tied scores)."""
    byval = (
        _scored(spark, sf_dir)
        .filter(F.col("score").isNotNull())
        .groupBy("score")
        .agg(
            F.sum("label").cast("long").alias("pos"),
            F.count(F.lit(1)).cast("long").alias("c"),
        )
    )
    wdesc = Window.orderBy(F.col("score").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    cums = byval.select(
        F.col("score").alias("threshold"),
        F.sum("pos").over(wdesc).cast("long").alias("tp"),
        F.sum(F.col("c") - F.col("pos")).over(wdesc).cast("long").alias("fp"),
        F.sum("pos").over(wall).cast("long").alias("n_pos"),
    )
    return cums.select(
        "threshold",
        "tp",
        "fp",
        F.round(
            F.try_divide(F.col("tp"), (F.col("tp") + F.col("fp")).cast("double")), 6
        ).alias("precision"),
        F.round(F.try_divide(F.col("tp"), F.col("n_pos").cast("double")), 6).alias(
            "recall"
        ),
    )


@register(
    "eval_calibration_bins",
    oracle=f"""
    WITH scored AS ({_SCORED_SQL})
    SELECT least(CAST(floor(score * 10) AS BIGINT), 9) AS bin,
           count(*)::BIGINT AS n,
           round(avg(score), 6) AS mean_score,
           round(avg(CAST(label AS DOUBLE)), 6) AS pos_rate
    FROM scored
    WHERE score IS NOT NULL
    GROUP BY 1
    """,
)
def eval_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram input: decile score bins vs observed positive
    rate (a calibrated classifier has mean_score ≈ pos_rate per bin).
    Single conditional hash aggregate; the bin rule is integer floor on
    the score so tied boundary values bin identically in both engines."""
    scored = _scored(spark, sf_dir).filter(F.col("score").isNotNull())
    return (
        scored.groupBy(
            F.least(F.floor(F.col("score") * 10).cast("long"), F.lit(9)).alias("bin")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.avg("score"), 6).alias("mean_score"),
            F.round(F.avg(F.col("label").cast("double")), 6).alias("pos_rate"),
        )
    )
