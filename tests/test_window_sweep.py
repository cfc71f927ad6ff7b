"""Catalog-wide structural gate: NO unpartitioned window over unbounded
input, anywhere — including subtrees a localCheckpoint later hides.

VERDICT r10 #3: the round-10 per-query plan gate inspected EXECUTED plans,
which a checkpoint truncates — text_heaps_vocab_growth's doc-cardinality
``row_number().over(Window.orderBy(...))`` was invisible to it because the
localCheckpoint two lines later cut the window out of the inspected tree.
This sweep wraps ``DataFrame.localCheckpoint`` to capture the ANALYZED plan
of its input *before* materialization, builds every registered query, and
parses every ``windowspecdefinition`` for an empty partition spec. Any
query with such a window must be in the audited whitelist below, with the
boundedness argument written next to its name; a whitelist entry whose
window disappears must be pruned (both directions asserted), so the list
can only ever shrink toward the truth.

An unpartitioned window plans as ``Exchange SinglePartition`` + one task
sorting the entire input — the one plan shape that cannot survive 100 TB
fact cardinality. Bounded grains that CAN survive it (and are allowed
here): post-``limit`` frames, decile/bucket rollups (<=10 rows by
construction), calendar-day grain (grows with wall-clock time, not data
volume), distinct-value grain for rank statistics (the algorithm's own
output cardinality), and vocabulary grain (Heaps-sublinear).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from hw_kafka_flink_health_spark.plans import unpartitioned_specs

from hw_kafka_flink_health_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"

#: query name -> why its unpartitioned window(s) survive 100x scale.
AUDITED_BOUNDED = {
    # -- calendar-day grain: rows ∝ elapsed days, not data volume --
    "cumulative_distinct_users": "day grain (running distinct over days)",
    "events_slo_error_budget": "day grain (budget burn per day)",
    "experiment_srm_check": "day grain (daily arm ratios)",
    "orders_drawdown_daily": "day grain (running peak over days)",
    "rolling_median_revenue": "day grain (rolling window over days)",
    "spc_imr_revenue": "day grain (I-MR control chart over days)",
    "stats_runs_test": "day grain (sign runs over days)",
    "timeseries_ma_decomposition": "day grain (centered MA over days)",
    # -- decile / fixed-bucket rollups: <= 10s of rows by construction --
    "eval_decile_lift": "10-row decile cumulation (post-aggregate)",
    "eval_qini_uplift": "10-row decile cumulation (post-aggregate)",
    "lorenz_revenue_deciles": "10-row decile cumulation (post-aggregate)",
    "text_heaps_vocab_growth": "10-row decile cumulation (post-aggregate; "
    "the doc-cardinality rank is distributed_row_number since r11)",
    "drift_psi_events": "fixed PSI bucket grain (whole-frame share)",
    "orders_benford_digits": "9 leading-digit rows",
    "quantile_sketch_log": "log-histogram bucket grain (~1.5k buckets for "
    "any double range at 1% bin width)",
    # -- distinct-value grain: the rank statistic's own output cardinality --
    "eval_auc_roc": "distinct-score grain (exact ROC needs one cum point "
    "per distinct threshold)",
    "eval_cost_optimal_threshold": "distinct-score grain",
    "eval_pr_curve": "distinct-score grain (exact PR curve)",
    "mlprep_quantile_normalize": "distinct-length grain (pooled ECDF table)",
    "stats_cliffs_delta": "distinct-value grain (midrank table)",
    "stats_kaplan_meier_reorder": "distinct-event-time grain (risk table)",
    "stats_ks_two_sample": "distinct-value grain (ECDF support)",
    "stats_logrank_test": "distinct-event-time grain (risk table)",
    "stats_mannwhitney_u": "distinct-value grain (midrank table)",
    "stats_nelson_aalen": "distinct-event-time grain (hazard table)",
    "skyline_suppliers_2d": "distinct (x,y) point grain (skyline sweep is "
    "defined on the distinct-point set)",
    # -- vocabulary grain: Heaps-sublinear in corpus size --
    "text_phrase_proximity": "vocab grain (word-frequency ranking)",
    "text_zipf_slope": "vocab grain (rank-frequency regression input)",
    # -- post-limit / k-row frames --
    "embedding_kmeans_step": "row_number over an 8-row limit (seed pick)",
    "hybrid_rrf_retrieval": "two top-50 arms fused; both post-limit",
    "stats_hill_tail_index": "k=50 upper order statistics (post-limit)",
    # -- tiny categorical grains --
    "experiment_bh_fdr": "|event_types| x B replicate p-value table "
    "(~200 rows; B fixed at 40)",
    "mlprep_domain_mix": "source grain (handful of corpus sources)",
    "mlprep_split_drift": "source x split grain",
    "mlprep_token_apportionment": "source grain (largest-remainder seats)",
    "pipeline_pretrain_corpus": "source grain (per-source budget table)",
    "stats_chi_square_independence": "contingency-cell grain",
    "stats_mutual_information": "contingency-cell grain",
}


def test_unpartitioned_spec_parser_self_check(spark):
    """The parser must see through both forms before the sweep trusts it."""
    from pyspark.sql import Window, functions as F

    df = spark.range(10).withColumn("g", F.col("id") % 2)
    bad = df.withColumn("rn", F.row_number().over(Window.orderBy("id")))
    good = df.withColumn(
        "rn", F.row_number().over(Window.partitionBy("g").orderBy("id"))
    )
    whole = df.withColumn("s", F.sum("id").over(Window.partitionBy()))
    assert unpartitioned_specs(str(bad._jdf.queryExecution().analyzed()))
    assert not unpartitioned_specs(str(good._jdf.queryExecution().analyzed()))
    assert unpartitioned_specs(str(whole._jdf.queryExecution().analyzed()))


def test_no_unaudited_unpartitioned_window_anywhere(spark):
    """Build EVERY registered query, capturing pre-checkpoint subtrees,
    and fail on any unpartitioned window outside the audited whitelist —
    in either direction (a stale whitelist entry also fails, so the list
    tracks reality)."""
    captured: list[str] = []
    orig = DataFrame.localCheckpoint

    def capturing(self, eager=True):
        captured.append(str(self._jdf.queryExecution().analyzed()))
        return orig(self, eager=eager)

    violators: dict[str, list[str]] = {}
    build_errors: dict[str, str] = {}
    DataFrame.localCheckpoint = capturing
    try:
        for name in sorted(QUERIES):
            captured.clear()
            try:
                df = QUERIES[name](spark, SF)
            except Exception as e:  # noqa: BLE001
                build_errors[name] = repr(e)[:200]
                continue
            plans = [str(df._jdf.queryExecution().analyzed())] + list(captured)
            hits = sorted({h for p in plans for h in unpartitioned_specs(p)})
            if hits:
                violators[name] = hits
    finally:
        DataFrame.localCheckpoint = orig

    assert not build_errors, f"queries failed to build: {build_errors}"
    unaudited = {n: v for n, v in violators.items() if n not in AUDITED_BOUNDED}
    assert not unaudited, (
        "unpartitioned window over input not audited as bounded — either fix "
        "the plan (distributed_row_number / global_prefix_sum) or audit and "
        f"whitelist it with a boundedness argument: {unaudited}"
    )
    stale = sorted(set(AUDITED_BOUNDED) - set(violators))
    assert not stale, (
        f"whitelist entries with no unpartitioned window left (prune them): {stale}"
    )
