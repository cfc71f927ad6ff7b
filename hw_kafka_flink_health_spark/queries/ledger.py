"""Operational-ledger analytics over `orders`/`lineitem`: FIFO lot
matching and business-day SLA latency.

Extension surface (SURVEY.md §2.C, relational/analytic family): the
classic finance-ops SQL shapes a warehouse team runs daily, each chosen
because its exact arithmetic survives a cross-engine value hash.

Scale shapes:
* FIFO matching uses the cumulative-interval trick: each supply lot and
  each demand occupy a half-open interval on the per-part cumulative
  quantity axis, and a lot feeds a demand iff their intervals overlap.
  That turns the sequential "walk the queue" algorithm into two window
  passes plus ONE range join keyed on `l_partkey` — per-part output is
  O(supplies + demands), never the quadratic all-pairs, because each
  demand overlaps a contiguous run of lots. At 100 TB the join is an
  equi-join on partkey with a residual range predicate: it shuffles
  both sides once on the same key and needs no driver state.
* Business-day latency is a closed-form weekday count (no calendar
  table, no per-day explode): weekdays-before-epoch-day arithmetic on
  `datediff`, so the whole query is one join + one hash aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hw_kafka_flink_health_spark.queries._registry import register
from hw_kafka_flink_health_spark.sources.files import load_table

# Weekdays in [0, d) for an epoch-day count d (1970-01-01 = Thursday):
# 5 per full week plus a 7-way lookup for the remainder starting Thursday.
_WEEKDAYS_REM_SQL = (
    "CASE {d} % 7 WHEN 0 THEN 0 WHEN 1 THEN 1 WHEN 2 THEN 2 WHEN 3 THEN 2 "
    "WHEN 4 THEN 2 WHEN 5 THEN 3 ELSE 4 END"
)


def _weekdays_before_sql(d: str) -> str:
    return f"(5 * (({d}) // 7) + {_WEEKDAYS_REM_SQL.format(d=f'({d})')})"


def _weekdays_before_spark(d):
    rem = d % 7
    lookup = (
        F.when(rem == 0, 0)
        .when(rem == 1, 1)
        .when(rem == 2, 2)
        .when(rem == 3, 2)
        .when(rem == 4, 2)
        .when(rem == 5, 3)
        .otherwise(4)
    )
    return 5 * F.floor(d / 7).cast("bigint") + lookup


@register(
    "orders_business_day_latency",
    oracle=f"""
    WITH first_ship AS (
      SELECT l_orderkey, min(l_shipdate) AS ship_ts
      FROM lineitem WHERE l_shipdate IS NOT NULL GROUP BY l_orderkey
    ), lat AS (
      SELECT o.o_orderpriority,
             {_weekdays_before_sql("datediff('day', DATE '1970-01-01', CAST(s.ship_ts AS DATE)) + 1")}
             - {_weekdays_before_sql("datediff('day', DATE '1970-01-01', CAST(o.o_orderdate AS DATE)) + 1")}
               AS biz_days
      FROM orders o JOIN first_ship s ON s.l_orderkey = o.o_orderkey
      WHERE o.o_orderdate IS NOT NULL
    )
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(min(biz_days) AS BIGINT) AS min_biz_days,
           CAST(max(biz_days) AS BIGINT) AS max_biz_days,
           round(CAST(sum(biz_days) AS BIGINT)
                 / CAST(count(*) AS DOUBLE), 4) AS avg_biz_days,
           CAST(count(*) FILTER (WHERE biz_days <= 5) AS BIGINT) AS within_5,
           CAST(count(*) FILTER (WHERE biz_days > 20) AS BIGINT) AS over_20
    FROM lat GROUP BY o_orderpriority
    """,
)
def orders_business_day_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-first-shipment latency in BUSINESS days (weekends
    excluded) per priority class — the SLA metric ops teams actually
    report, and a date-math shape calendars usually force into a
    calendar-table join.

    Closed form instead: weekdays in (order_day, ship_day] equals
    f(ship+1) - f(order+1) where f(d) counts weekdays before epoch-day
    d — five per full week plus a 7-way remainder lookup anchored on
    1970-01-01 being a Thursday. Pure integer arithmetic end to end
    (the only double is the final average), no calendar explode, so the
    query is one min-aggregate over lineitem, one equi-join, one hash
    aggregate — every step shuffles on a key with full partial
    aggregation."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    first_ship = (
        lineitem.filter(F.col("l_shipdate").isNotNull())
        .groupBy("l_orderkey")
        .agg(F.min("l_shipdate").alias("ship_ts"))
    )
    epoch = F.lit("1970-01-01").cast("date")
    d_ship = F.datediff(F.col("ship_ts").cast("date"), epoch) + 1
    d_ord = F.datediff(F.col("o_orderdate").cast("date"), epoch) + 1
    lat = (
        orders.filter(F.col("o_orderdate").isNotNull())
        .join(first_ship, orders.o_orderkey == first_ship.l_orderkey)
        .select(
            "o_orderpriority",
            (_weekdays_before_spark(d_ship) - _weekdays_before_spark(d_ord)).alias(
                "biz_days"
            ),
        )
    )
    return lat.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.min("biz_days").cast("bigint").alias("min_biz_days"),
        F.max("biz_days").cast("bigint").alias("max_biz_days"),
        F.round(
            F.sum("biz_days").cast("bigint") / F.count(F.lit(1)).cast("double"), 4
        ).alias("avg_biz_days"),
        F.sum(F.when(F.col("biz_days") <= 5, 1).otherwise(0))
        .cast("bigint")
        .alias("within_5"),
        F.sum(F.when(F.col("biz_days") > 20, 1).otherwise(0))
        .cast("bigint")
        .alias("over_20"),
    )


@register(
    "inventory_fifo_cogs",
    oracle="""
    WITH supply AS (
      SELECT l_partkey, l_orderkey, l_linenumber,
             CAST(l_quantity AS BIGINT) AS qty, l_extendedprice,
             sum(CAST(l_quantity AS BIGINT)) OVER (
               PARTITION BY l_partkey
               ORDER BY l_shipdate, l_orderkey, l_linenumber
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hi
      FROM lineitem
      WHERE l_returnflag <> 'R'
        AND l_shipdate IS NOT NULL AND l_quantity IS NOT NULL
    ), demand AS (
      SELECT l_partkey, l_orderkey, l_linenumber,
             CAST(l_quantity AS BIGINT) AS qty,
             sum(CAST(l_quantity AS BIGINT)) OVER (
               PARTITION BY l_partkey
               ORDER BY l_shipdate, l_orderkey, l_linenumber
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hi
      FROM lineitem
      WHERE l_returnflag = 'R'
        AND l_shipdate IS NOT NULL AND l_quantity IS NOT NULL
    )
    SELECT s.l_partkey,
           s.l_orderkey AS supply_orderkey, s.l_linenumber AS supply_line,
           d.l_orderkey AS demand_orderkey, d.l_linenumber AS demand_line,
           CAST(least(s.hi, d.hi) - greatest(s.hi - s.qty, d.hi - d.qty)
                AS BIGINT) AS matched_qty,
           CAST(least(s.hi, d.hi) - greatest(s.hi - s.qty, d.hi - d.qty)
                AS DOUBLE)
             * s.l_extendedprice / CAST(s.qty AS DOUBLE) AS cogs
    FROM supply s JOIN demand d
      ON s.l_partkey = d.l_partkey
     AND s.hi - s.qty < d.hi AND d.hi - d.qty < s.hi
    """,
)
def inventory_fifo_cogs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIFO lot matching: consume supply lots (non-returned line items,
    oldest shipment first) against returns in arrival order, emitting
    per-(lot, demand) matched quantity and its cost-of-goods at the
    lot's unit price — the allocation every inventory/cost ledger runs.

    The sequential queue walk becomes set algebra via cumulative
    intervals: lot i covers [hi-qty, hi) on the part's cumulative supply
    axis, demand j covers the same on the demand axis, and FIFO matches
    exactly the overlapping pairs with matched = min(hi_s, hi_d) -
    max(lo_s, lo_d). Two window passes (one per side, each a single
    partkey shuffle) and one partkey equi-join with a residual range
    predicate; each demand overlaps a contiguous lot run, so output and
    join work are O(lots + demands) per part. Quantities are exact
    BIGINTs; the only floating math is matched x unit-price, one
    multiply + divide per output row, identical in both engines."""
    lineitem = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").isNotNull() & F.col("l_quantity").isNotNull()
    )
    w = (
        Window.partitionBy("l_partkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    qty = F.col("l_quantity").cast("bigint")

    def side(df):
        return df.select(
            "l_partkey",
            "l_orderkey",
            "l_linenumber",
            qty.alias("qty"),
            "l_extendedprice",
            F.sum(qty).over(w).alias("hi"),
        )

    supply = side(lineitem.filter(F.col("l_returnflag") != "R")).alias("s")
    demand = side(lineitem.filter(F.col("l_returnflag") == "R")).alias("d")

    def s(c):
        return F.col(f"s.{c}")

    def d(c):
        return F.col(f"d.{c}")

    matched = F.least(s("hi"), d("hi")) - F.greatest(
        s("hi") - s("qty"), d("hi") - d("qty")
    )
    return (
        supply.join(
            demand,
            (s("l_partkey") == d("l_partkey"))
            & (s("hi") - s("qty") < d("hi"))
            & (d("hi") - d("qty") < s("hi")),
        )
        .select(
            s("l_partkey").alias("l_partkey"),
            s("l_orderkey").alias("supply_orderkey"),
            s("l_linenumber").alias("supply_line"),
            d("l_orderkey").alias("demand_orderkey"),
            d("l_linenumber").alias("demand_line"),
            matched.alias("matched_qty"),
            (
                matched.cast("double") * s("l_extendedprice") / s("qty").cast("double")
            ).alias("cogs"),
        )
    )


@register(
    "orders_bullwhip_ratio",
    oracle="""
    WITH om AS (
      SELECT date_trunc('month', CAST(o_orderdate AS DATE)) AS m,
             CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               // 100000 AS x
      FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1
    ), sm AS (
      SELECT date_trunc('month', CAST(l_shipdate AS DATE)) AS m,
             CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               // 100000 AS x
      FROM lineitem WHERE l_shipdate IS NOT NULL GROUP BY 1
    ), mo AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS s1, CAST(sum(x * x) AS BIGINT) AS s2
      FROM om
    ), ms AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS s1, CAST(sum(x * x) AS BIGINT) AS s2
      FROM sm
    )
    SELECT mo.n AS n_order_months, ms.n AS n_ship_months,
           CASE WHEN mo.n > 0 THEN
             (CAST(mo.n AS DOUBLE) * mo.s2 - CAST(mo.s1 AS DOUBLE) * mo.s1)
               / (CAST(mo.n AS DOUBLE) * mo.n) END AS var_orders,
           CASE WHEN ms.n > 0 THEN
             (CAST(ms.n AS DOUBLE) * ms.s2 - CAST(ms.s1 AS DOUBLE) * ms.s1)
               / (CAST(ms.n AS DOUBLE) * ms.n) END AS var_shipments,
           CASE WHEN ms.n > 0 AND mo.n > 0
                 AND (CAST(ms.n AS DOUBLE) * ms.s2 - CAST(ms.s1 AS DOUBLE) * ms.s1)
                     / (CAST(ms.n AS DOUBLE) * ms.n) > 0
                THEN ((CAST(mo.n AS DOUBLE) * mo.s2 - CAST(mo.s1 AS DOUBLE) * mo.s1)
                        / (CAST(mo.n AS DOUBLE) * mo.n))
                     / ((CAST(ms.n AS DOUBLE) * ms.s2 - CAST(ms.s1 AS DOUBLE) * ms.s1)
                        / (CAST(ms.n AS DOUBLE) * ms.n))
                END AS bullwhip
    FROM mo, ms
    """,
)
def orders_bullwhip_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bullwhip-effect ratio: variance of monthly ORDER value over
    variance of monthly SHIPPED value — the supply-chain amplification
    diagnostic (ratio > 1 means demand signals amplify upstream).
    Monthly series are exact integer thousand-dollar units (cents sum
    then integer DIV 100000 — a unit choice, documented, that keeps
    x^2 moments far inside int64 at any SF); population variances are
    fixed IEEE chains on exact moments, NULL-guarded for empty/zero-
    variance sides. Shape: two month-grain aggregates, two 1-row moment
    rollups, one scalar join."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")

    def monthly(df, datecol, amtcol):
        return (
            df.filter(F.col(datecol).isNotNull())
            .groupBy(F.date_trunc("month", F.to_date(datecol)).alias("m"))
            .agg(
                F.expr(
                    f"CAST(sum(CAST(floor({amtcol} * 100) AS BIGINT)) AS BIGINT)"
                    " DIV 100000"
                ).alias("x")
            )
        )

    def moments(df):
        return df.agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("x").cast("long").alias("s1"),
            F.sum(F.col("x") * F.col("x")).cast("long").alias("s2"),
        )

    mo = moments(monthly(orders, "o_orderdate", "o_totalprice")).select(
        F.col("n").alias("no"), F.col("s1").alias("so1"), F.col("s2").alias("so2")
    )
    ms = moments(monthly(li, "l_shipdate", "l_extendedprice")).select(
        F.col("n").alias("ns"), F.col("s1").alias("ss1"), F.col("s2").alias("ss2")
    )
    j = mo.crossJoin(F.broadcast(ms))
    var_o = (
        F.col("no").cast("double") * F.col("so2")
        - F.col("so1").cast("double") * F.col("so1")
    ) / (F.col("no").cast("double") * F.col("no"))
    var_s = (
        F.col("ns").cast("double") * F.col("ss2")
        - F.col("ss1").cast("double") * F.col("ss1")
    ) / (F.col("ns").cast("double") * F.col("ns"))
    return j.select(
        F.col("no").alias("n_order_months"),
        F.col("ns").alias("n_ship_months"),
        F.when(F.col("no") > 0, var_o).alias("var_orders"),
        F.when(F.col("ns") > 0, var_s).alias("var_shipments"),
        F.when((F.col("ns") > 0) & (F.col("no") > 0) & (var_s > 0), var_o / var_s).alias(
            "bullwhip"
        ),
    )


@register(
    "revenue_pvm_waterfall",
    oracle="""
    WITH b AS (
      SELECT p.p_type AS seg, year(l.l_shipdate) AS y,
             CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)
               AS cents,
             CAST(floor(l.l_quantity) AS BIGINT) AS q
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      WHERE year(l.l_shipdate) IN (1996, 1997)
        AND l.l_extendedprice IS NOT NULL AND l.l_discount IS NOT NULL
        AND l.l_quantity IS NOT NULL
    ),
    s AS (
      SELECT seg,
             CAST(sum(CASE WHEN y = 1996 THEN cents ELSE 0 END) AS BIGINT) AS rev1,
             CAST(sum(CASE WHEN y = 1996 THEN q ELSE 0 END) AS BIGINT) AS q1,
             CAST(sum(CASE WHEN y = 1997 THEN cents ELSE 0 END) AS BIGINT) AS rev2,
             CAST(sum(CASE WHEN y = 1997 THEN q ELSE 0 END) AS BIGINT) AS q2
      FROM b GROUP BY seg
    ),
    t AS (
      SELECT CAST(sum(q1) AS BIGINT) AS tq1, CAST(sum(q2) AS BIGINT) AS tq2
      FROM s
    )
    SELECT seg,
           round(rev1 / 1e2, 2) AS rev_base,
           round(rev2 / 1e2, 2) AS rev_curr,
           round((CAST(rev2 AS DOUBLE) / nullif(q2, 0)
                  - CAST(rev1 AS DOUBLE) / nullif(q1, 0)) * q2 / 1e2, 2)
             AS price_eff,
           round(CAST(rev1 AS DOUBLE) / nullif(q1, 0) * q1
                 * (CAST(tq2 AS DOUBLE) / nullif(tq1, 0) - 1) / 1e2, 2)
             AS volume_eff,
           round(CAST(rev1 AS DOUBLE) / nullif(q1, 0)
                 * (q2 - q1 * CAST(tq2 AS DOUBLE) / nullif(tq1, 0)) / 1e2, 2)
             AS mix_eff
    FROM s, t
    """,
)
def revenue_pvm_waterfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price-volume-mix waterfall: decompose each product segment's
    revenue change between 1996 and 1997 into price effect
    ((p2−p1)·q2), total-volume effect (p1·q1·(Q2/Q1 − 1)) and mix effect
    (p1·(q2 − q1·Q2/Q1)) — the FP&A bridge chart's exact algebra; the
    three effects sum to rev2 − rev1 per segment by construction.

    Shape: one broadcast dimension join (part is the small side), then a
    SINGLE year-pivoted hash aggregate per segment (conditional sums —
    no second scan, no self-join between the years) and a 6-row totals
    reduction. All sums are exact integer cents/units, so the derived
    prices and effects are deterministic doubles; every division guards
    a segment absent from a year (try_divide / nullif → NULL effects,
    the honest answer when there is no base price)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    b = (
        li.filter(
            F.year("l_shipdate").isin(1996, 1997)
            & F.col("l_extendedprice").isNotNull()
            & F.col("l_discount").isNotNull()
            & F.col("l_quantity").isNotNull()
        )
        .join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .select(
            F.col("p_type").alias("seg"),
            F.year("l_shipdate").alias("y"),
            F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
            .cast("long")
            .alias("cents"),
            F.floor("l_quantity").cast("long").alias("q"),
        )
    )
    s = b.groupBy("seg").agg(
        F.sum(F.when(F.col("y") == 1996, F.col("cents")).otherwise(0))
        .cast("long")
        .alias("rev1"),
        F.sum(F.when(F.col("y") == 1996, F.col("q")).otherwise(0))
        .cast("long")
        .alias("q1"),
        F.sum(F.when(F.col("y") == 1997, F.col("cents")).otherwise(0))
        .cast("long")
        .alias("rev2"),
        F.sum(F.when(F.col("y") == 1997, F.col("q")).otherwise(0))
        .cast("long")
        .alias("q2"),
    )
    t = s.agg(
        F.sum("q1").cast("long").alias("tq1"), F.sum("q2").cast("long").alias("tq2")
    )
    p1 = F.try_divide(F.col("rev1").cast("double"), F.col("q1"))
    p2 = F.try_divide(F.col("rev2").cast("double"), F.col("q2"))
    g = F.try_divide(F.col("tq2").cast("double"), F.col("tq1"))
    return s.crossJoin(F.broadcast(t)).select(
        "seg",
        F.round(F.col("rev1") / F.lit(1e2), 2).alias("rev_base"),
        F.round(F.col("rev2") / F.lit(1e2), 2).alias("rev_curr"),
        F.round((p2 - p1) * F.col("q2") / F.lit(1e2), 2).alias("price_eff"),
        F.round(p1 * F.col("q1") * (g - 1) / F.lit(1e2), 2).alias("volume_eff"),
        F.round(p1 * (F.col("q2") - F.col("q1") * g) / F.lit(1e2), 2).alias("mix_eff"),
    )
