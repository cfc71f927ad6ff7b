"""Complex Event Processing (CEP) — Flink's flagship pattern-matching
surface (FlinkCEP / SQL MATCH_RECOGNIZE), re-expressed Spark-first.

The reference engine's stack (PyFlink, `/root/reference/README.md`) ships
CEP as a core library; Spark has no MATCH_RECOGNIZE, so these queries show
the two idiomatic translations:

* regex-over-sequence: fold each key's ordered event-type codes into ONE
  string per key (single shuffle, per-key state bounded by that key's
  events) and run the pattern as a regular expression — the direct analog
  of an NFA-based CEP engine, with the NFA compiled by the regex engine.
* window-carried state: "A followed by B within T, no C between" becomes
  running `max(CASE...) OVER (ORDER BY ts)` columns — no collect at all,
  one exchange, streaming-translatable (see
  `operators/stateful.py:cep_followed_by_stream` for the live twin).

Scale notes: both shapes shuffle events exactly once on the key. The
regex fold holds one key's sequence in memory (same bound as any per-key
sessionization); the window form is pure streaming window state. Neither
materializes cross-key data, so 1000 executors partition cleanly by
user_id at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hw_kafka_flink_health_spark.queries._registry import register
from hw_kafka_flink_health_spark.sources.files import load_table

# view → (anything but purchase)* → purchase. With single-char codes the
# first letters are distinct (click/error/purchase/signup/view), and the
# greedy [^p]* cannot cross a 'p', so the leftmost-nonoverlapping match
# count is identical under Java regex (Spark) and RE2 (DuckDB).
JOURNEY_PATTERN = "v[^p]*p"


@register(
    "cep_journey_counts",
    oracle="""
    WITH seq AS (
      -- coalesce: string_agg over only-NULL codes yields NULL, but the
      -- engine's array_join skips NULL elements -> empty journey string
      SELECT user_id,
             coalesce(string_agg(substr(event_type, 1, 1), ''
                                 ORDER BY ts, event_id), '') AS seq
      FROM events GROUP BY user_id
    )
    SELECT user_id,
           CAST(length(seq) AS BIGINT) AS seq_len,
           CAST(length(regexp_extract_all(seq, 'v[^p]*p')) AS BIGINT) AS n_journeys
    FROM seq
    """,
)
def cep_journey_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CEP via regex-over-sequence: per user, fold the time-ordered
    event-type codes (first letters are distinct across the five types)
    into one string and count non-overlapping view→…→purchase journeys
    with no intervening purchase. One shuffle on user_id; the fold is
    `array_sort(collect_list(struct))` so ordering happens inside the
    aggregate (no window pass), and the regex NFA runs once per key."""
    ev = load_table(spark, sf_dir, "events")
    seq = (
        ev.select(
            "user_id",
            F.struct(
                F.col("ts"), F.col("event_id"), F.substring("event_type", 1, 1).alias("c")
            ).alias("s"),
        )
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(F.array_sort(F.collect_list("s")), lambda s: s["c"]), ""
            ).alias("seq")
        )
    )
    return seq.select(
        "user_id",
        F.length("seq").cast("bigint").alias("seq_len"),
        F.regexp_count(F.col("seq"), F.lit(JOURNEY_PATTERN))
        .cast("bigint")
        .alias("n_journeys"),
    )


@register(
    "cep_followed_by",
    oracle="""
    WITH t AS (
      SELECT user_id, event_id, event_type,
             epoch_ms(ts) AS ts_ms,
             max(CASE WHEN event_type = 'view' THEN epoch_ms(ts) END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS last_view_ms,
             max(CASE WHEN event_type = 'purchase' THEN epoch_ms(ts) END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS last_purchase_ms
      FROM events
    )
    SELECT user_id, event_id AS purchase_event_id,
           last_view_ms AS view_ms, ts_ms AS purchase_ms,
           CAST(floor((ts_ms - last_view_ms) / 1000.0) AS BIGINT) AS gap_s
    FROM t
    WHERE event_type = 'purchase'
      AND last_view_ms IS NOT NULL
      AND (last_purchase_ms IS NULL OR last_view_ms > last_purchase_ms)
      AND ts_ms - last_view_ms <= 600000
    """,
)
def cep_followed_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CEP "A followed-by B within T, no B between" as window-carried
    state: each purchase matches iff the most recent prior view is newer
    than the most recent prior purchase (strict-order NFA: the view is
    not yet consumed) and arrived within 10 minutes. No collect_list —
    two running-max columns over ONE window spec (one exchange + one
    sort), which is exactly the state a streaming NFA would carry; the
    live twin is `operators/stateful.py:cep_followed_by_stream`."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ts_ms = F.unix_millis(F.col("ts").cast("timestamp"))
    t = ev.select(
        "user_id",
        "event_id",
        "event_type",
        ts_ms.alias("ts_ms"),
        F.max(F.when(F.col("event_type") == "view", ts_ms)).over(w).alias("last_view_ms"),
        F.max(F.when(F.col("event_type") == "purchase", ts_ms))
        .over(w)
        .alias("last_purchase_ms"),
    )
    return (
        t.filter(
            (F.col("event_type") == "purchase")
            & F.col("last_view_ms").isNotNull()
            & (
                F.col("last_purchase_ms").isNull()
                | (F.col("last_view_ms") > F.col("last_purchase_ms"))
            )
            & (F.col("ts_ms") - F.col("last_view_ms") <= 600000)
        )
        .select(
            "user_id",
            F.col("event_id").alias("purchase_event_id"),
            F.col("last_view_ms").alias("view_ms"),
            F.col("ts_ms").alias("purchase_ms"),
            F.floor((F.col("ts_ms") - F.col("last_view_ms")) / 1000.0)
            .cast("bigint")
            .alias("gap_s"),
        )
    )


@register(
    "cep_absence_timeout",
    oracle="""
    WITH t AS (
      SELECT user_id, event_id, event_type, epoch_ms(ts) AS ts_ms,
             first_value(CASE WHEN event_type IN ('click','purchase')
                              THEN epoch_ms(ts) END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
               AS follow_ms
      FROM events
    )
    SELECT user_id, event_id AS view_event_id, ts_ms AS view_ms
    FROM t
    WHERE event_type = 'view'
      AND (follow_ms IS NULL OR follow_ms - ts_ms > 600000)
    """,
)
def cep_absence_timeout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CEP negative pattern (absence within timeout): emit views that were
    NOT followed by any click/purchase within 10 minutes — FlinkCEP's
    `notFollowedBy().within()`, the abandoned-session detector. One
    `first(... ignorenulls) OVER (1 FOLLOWING..)` carries the next
    engagement's timestamp; no self-join of events against events (which
    would shuffle the fact table twice and explode on hot users)."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    ts_ms = F.unix_millis(F.col("ts").cast("timestamp"))
    engaged = F.col("event_type").isin("click", "purchase")
    t = ev.select(
        "user_id",
        "event_id",
        "event_type",
        ts_ms.alias("ts_ms"),
        F.first(F.when(engaged, ts_ms), ignorenulls=True).over(w).alias("follow_ms"),
    )
    return t.filter(
        (F.col("event_type") == "view")
        & (F.col("follow_ms").isNull() | (F.col("follow_ms") - F.col("ts_ms") > 600000))
    ).select(
        "user_id",
        F.col("event_id").alias("view_event_id"),
        F.col("ts_ms").alias("view_ms"),
    )


@register(
    "cep_error_burst",
    oracle="""
    WITH t AS (
      SELECT user_id, event_id, event_type, epoch_ms(ts) AS ts_ms,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS rn_t
      FROM events
    ), runs AS (
      SELECT user_id, rn - rn_t AS grp,
             count(*)::BIGINT AS run_len,
             min(ts_ms) AS start_ms, max(ts_ms) AS end_ms
      FROM t WHERE event_type = 'error'
      GROUP BY 1, 2
    )
    SELECT user_id, run_len, start_ms, end_ms
    FROM runs WHERE run_len >= 3
    """,
)
def cep_error_burst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CEP iterative quantifier (FlinkCEP `times(3, ...)` / A{3,}): runs
    of >= 3 CONSECUTIVE error events per user — the three-strikes
    monitoring pattern. Consecutive-run detection is the gaps-and-islands
    rn-difference trick: two row_numbers over the SAME user_id exchange
    (global position minus per-type position is constant exactly within
    a consecutive run), then one aggregate per island. No self-joins, no
    sequence materialization — at 100 TB the events table shuffles once
    on user_id and everything else rides that partitioning."""
    ev = load_table(spark, sf_dir, "events")
    ts_ms = F.unix_millis(F.col("ts").cast("timestamp"))
    w_all = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_typ = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    t = ev.select(
        "user_id",
        "event_type",
        ts_ms.alias("ts_ms"),
        F.row_number().over(w_all).alias("rn"),
        F.row_number().over(w_typ).alias("rn_t"),
    )
    runs = (
        t.filter(F.col("event_type") == "error")
        .groupBy("user_id", (F.col("rn") - F.col("rn_t")).alias("grp"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("run_len"),
            F.min("ts_ms").alias("start_ms"),
            F.max("ts_ms").alias("end_ms"),
        )
    )
    return runs.filter(F.col("run_len") >= 3).select(
        "user_id", "run_len", "start_ms", "end_ms"
    )


@register(
    "events_process_conformance",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
      FROM events
      WHERE user_id IS NOT NULL AND ts IS NOT NULL AND event_type IS NOT NULL
    ), allowed(f, t) AS (
      VALUES ('signup', 'view'), ('signup', 'click'),
             ('view', 'click'), ('view', 'view'), ('view', 'error'),
             ('click', 'purchase'), ('click', 'view'), ('click', 'click'),
             ('purchase', 'view'), ('error', 'view')
    ), marked AS (
      SELECT user_id, prev, event_type,
             CASE WHEN a.f IS NULL THEN 1 ELSE 0 END AS violation
      FROM seq LEFT JOIN allowed a ON seq.prev = a.f AND seq.event_type = a.t
      WHERE prev IS NOT NULL
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_transitions,
           CAST(sum(violation) AS BIGINT) AS n_violations,
           CAST(sum(violation) AS DOUBLE) / count(*) AS violation_rate
    FROM marked GROUP BY user_id
    """,
)
def events_process_conformance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Process-mining conformance check: each user's event stream is
    replayed against a declared transition whitelist (the reference
    process model), and every observed consecutive transition outside the
    model counts as a violation — the token-replay fitness readout of
    conformance checking, reduced to one lag window plus a broadcast
    anti-lookup against the tiny model table. Counts are exact BIGINTs,
    the rate one division. Shape: one user-keyed window pass, one
    broadcast join; per-user sequences replay independently at any
    scale."""
    allowed = spark.createDataFrame(
        [
            ("signup", "view"), ("signup", "click"),
            ("view", "click"), ("view", "view"), ("view", "error"),
            ("click", "purchase"), ("click", "view"), ("click", "click"),
            ("purchase", "view"), ("error", "view"),
        ],
        ["f", "t"],
    )
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
        & F.col("ts").isNotNull()
        & F.col("event_type").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id", "event_type", F.lag("event_type").over(w).alias("prev")
    ).filter(F.col("prev").isNotNull())
    marked = seq.join(
        F.broadcast(allowed),
        (seq["prev"] == allowed["f"]) & (seq["event_type"] == allowed["t"]),
        "left",
    ).select(
        "user_id", F.when(F.col("f").isNull(), 1).otherwise(0).alias("violation")
    )
    return marked.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_transitions"),
        F.sum("violation").cast("long").alias("n_violations"),
        (F.sum("violation").cast("double") / F.count(F.lit(1))).alias(
            "violation_rate"
        ),
    )
