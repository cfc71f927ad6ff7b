"""Incremental-maintenance guarantees: merge algebra (associativity,
split-invariance) and exact-quantile rank selection vs known answers."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hw_kafka_flink_health_spark.operators.incremental import (
    daily_partials,
    finalize_rollup,
    merge_partials,
)
from hw_kafka_flink_health_spark.operators.quantiles import exact_quantiles
from hw_kafka_flink_health_spark.sources.files import load_table

from tests.conftest import SF_DIR


def _rollup_rows(df):
    return sorted(
        (r.day, r.key, r.cnt, r.sum_value, r.min_value, r.max_value, r.avg_value)
        for r in finalize_rollup(df).collect()
    )


def test_merge_is_associative_and_split_invariant(spark):
    """Any partition of the input folded through partials+merge equals the
    one-shot aggregate — and grouping of merges doesn't matter."""
    ev = load_table(spark, SF_DIR, "events")
    a = daily_partials(ev.filter(F.abs(F.hash("event_id")) % 3 == 0))
    b = daily_partials(ev.filter(F.abs(F.hash("event_id")) % 3 == 1))
    c = daily_partials(ev.filter(F.abs(F.hash("event_id")) % 3 == 2))

    full = _rollup_rows(daily_partials(ev))
    left = _rollup_rows(merge_partials(merge_partials(a, b), c))
    right = _rollup_rows(merge_partials(a, merge_partials(b, c)))
    flat = _rollup_rows(merge_partials(a, b, c))
    assert left == right == flat == full


def test_merge_handles_key_absent_from_one_slice(spark):
    """A key seen only in the delta (a NEW key-day) must appear in the
    merged rollup with the delta's values — the schema-stable upsert case."""
    hist = spark.createDataFrame(
        [("2024-01-01T00:00:00", "click", 2.0)], ["ts", "event_type", "value"]
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    delta = spark.createDataFrame(
        [("2024-01-01T01:00:00", "view", 5.0), ("2024-01-02T00:00:00", "click", 3.0)],
        ["ts", "event_type", "value"],
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    merged = finalize_rollup(
        merge_partials(daily_partials(hist), daily_partials(delta))
    ).collect()
    got = {(str(r.day), r.key): (r.cnt, r.sum_value) for r in merged}
    assert got[("2024-01-01", "click")] == (1, 2.0)
    assert got[("2024-01-01", "view")] == (1, 5.0)
    assert got[("2024-01-02", "click")] == (1, 3.0)


def test_exact_quantiles_match_sorted_truth(spark, duck):
    """Histogram-refinement quantiles == the rank-selected element of the
    fully sorted column (quantile_disc semantics), for a spread of q."""
    ev = load_table(spark, SF_DIR, "events")
    qs = [0.0, 0.01, 0.25, 0.5, 0.75, 0.99, 1.0]
    got = {r.q: r.val for r in exact_quantiles(ev, "value", qs).collect()}
    vals = [
        r[0]
        for r in duck.execute("SELECT value FROM events WHERE value IS NOT NULL ORDER BY value").fetchall()
    ]
    n = len(vals)
    for q in qs:
        expect = vals[int((n - 1) * q)]
        assert got[q] == pytest.approx(expect, abs=0.0), (q, got[q], expect)


def test_exact_quantiles_constant_column_and_duplicates(spark):
    df = spark.createDataFrame([(7.0,)] * 50, ["v"])
    got = {r.q: r.val for r in exact_quantiles(df, "v", [0.1, 0.9]).collect()}
    assert got == {0.1: 7.0, 0.9: 7.0}
    # heavy duplication: one value dominating a bucket must still rank right
    df2 = spark.createDataFrame([(1.0,)] * 90 + [(2.0,)] * 9 + [(100.0,)], ["v"])
    got2 = {r.q: r.val for r in exact_quantiles(df2, "v", [0.5, 0.95, 1.0]).collect()}
    assert got2[0.5] == 1.0 and got2[0.95] == 2.0 and got2[1.0] == 100.0


def test_exact_quantiles_rejects_all_null(spark):
    df = spark.createDataFrame([(None,), (None,)], "v double")
    with pytest.raises(ValueError):
        exact_quantiles(df, "v", [0.5])


@pytest.mark.slow  # ~10 s random property fuzz; full-suite tier
def test_exact_quantiles_property_random_distributions(spark):
    """Adversarial shapes a fixed-width histogram hates: heavy skew, point
    masses, negatives, tiny n, few buckets (forcing multi-rank buckets) —
    every quantile must equal the PERCENTILE_DISC element of the sorted
    list (ceiling rank: smallest element with cume_dist >= q, the
    quantile_disc semantics the oracle pins; the old floor((n-1)q) form
    diverges on small n, caught by the fuzz sweep)."""
    import math
    import random

    rng = random.Random(7)
    cases = [
        [rng.expovariate(0.01) for _ in range(997)],          # heavy right skew
        [rng.gauss(0, 1) for _ in range(500)] + [5.0] * 400,  # point mass
        [-1e9, 0.0, 1e9] * 7,                                 # extreme spread, ties
        [float(rng.randint(0, 3)) for _ in range(311)],       # few distinct
        [3.14],                                               # n == 1
    ]
    qs = [0.0, 0.1, 0.5, 0.9, 0.95, 1.0]
    for vals in cases:
        df = spark.createDataFrame([(v,) for v in vals], "v double").repartition(5)
        got = {r.q: r.val for r in exact_quantiles(df, "v", qs, n_buckets=8).collect()}
        svals = sorted(vals)
        n = len(vals)
        for q in qs:
            idx = 0 if q <= 0 else min(n - 1, math.ceil(q * n) - 1)
            expect = svals[idx]
            assert got[q] == expect, (q, got[q], expect, n)


def test_quantile_sketch_log_relative_error_bound(spark):
    """Log-histogram quantile estimates must land within the bin-width
    relative error (1% ln-bin -> ~0.5% value error, allow 1%) of exact
    quantiles, at every probed q."""
    from pyspark.sql import functions as F

    from hw_kafka_flink_health_spark.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    est = {
        r.q_frac: r.est_value
        for r in QUERIES["quantile_sketch_log"](spark, sf).collect()
    }
    orders = spark.read.parquet(f"{sf}/orders.parquet").filter(
        F.col("o_totalprice") > 0
    )
    exact = orders.agg(
        F.expr("percentile(o_totalprice, array(0.5, 0.9, 0.99))").alias("p")
    ).collect()[0]["p"]
    for q, ex in zip((0.5, 0.9, 0.99), exact):
        rel = abs(est[q] - ex) / ex
        assert rel <= 0.01, (q, est[q], ex, rel)
