"""Pin the money idiom for SIGNED amounts (VERDICT r11 #3).

The catalog's exact-cents idiom ``floor(x * 100 + 0.5)`` is round-half-UP
(floor(-1.235*100 + 0.5) = -123), not half-away-from-zero (-124). Every
column it touches today is non-negative, and both engines replay the
SAME expression, so no oracle diverges — but the idiom travels under the
name "money" at ~180 paired sites, so the contract must be pinned before
someone reuses it on a refunds/adjustments column:

1. PARITY on signed inputs: Spark and DuckDB agree on the raw idiom for
   ANY sign — the oracle gate stays green even if a signed value slips
   in (property test, adversarial cent boundaries included).
2. The half-away-from-zero form a signed column SHOULD use exists as a
   shared Spark/SQL pair (``money_cents`` / ``money_cents_sql`` in
   queries/_shared.py) and the two engines agree on it too.
3. The divergence between the two forms is exactly the documented one:
   negative exact-half cents.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from hw_kafka_flink_health_spark.queries._shared import (
    money_cents,
    money_cents_sql,
)

# Signed doubles around cent boundaries: exact halves, near-halves, and
# arbitrary magnitudes up to the catalog's realistic money range.
_signed_money = st.one_of(
    st.decimals(
        min_value="-99999.999", max_value="99999.999", places=3
    ).map(float),
    st.sampled_from(
        [-1.235, -1.225, -0.005, -0.004999, 0.005, 1.235, 2.675, -2.675]
    ),
    st.floats(min_value=-1e7, max_value=1e7, allow_nan=False, width=64),
)


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(_signed_money, min_size=1, max_size=40))
def test_raw_idiom_engine_parity_on_signed_inputs(spark, values):
    """floor(x*100 + 0.5): Spark and DuckDB must agree for ANY sign —
    the oracle gate's safety net if the raw idiom ever meets a signed
    column."""
    df = spark.createDataFrame([(v,) for v in values], "x double")
    got = [
        r["c"]
        for r in df.select(
            F.floor(F.col("x") * 100 + 0.5).cast("bigint").alias("c")
        ).collect()
    ]
    con = duckdb.connect()
    want = [
        con.execute(
            "SELECT CAST(floor(? * 100 + 0.5) AS BIGINT)", [v]
        ).fetchone()[0]
        for v in values
    ]
    assert got == want


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(_signed_money, min_size=1, max_size=40))
def test_money_cents_engine_parity_and_symmetry(spark, values):
    """The half-away form: Spark/DuckDB parity plus the sign-symmetry
    property money semantics require (cents(-x) == -cents(x))."""
    df = spark.createDataFrame([(v,) for v in values], "x double")
    rows = df.select(
        money_cents(F.col("x")).alias("c"),
        money_cents(-F.col("x")).alias("neg_c"),
    ).collect()
    got = [r["c"] for r in rows]
    assert all(r["neg_c"] == -r["c"] for r in rows)
    con = duckdb.connect()
    sql = money_cents_sql("?")  # the expr appears 3x in the CASE form
    n_params = sql.count("?")
    want = [
        con.execute(f"SELECT {sql}", [v] * n_params).fetchone()[0]
        for v in values
    ]
    assert got == want


def test_raw_idiom_is_half_up_not_half_away(spark):
    """The documented divergence, demonstrated on EXACT binary halves
    (x*scale landing on .5 exactly — decimal cases like -1.235 sit off
    the boundary after float rounding, so the demonstration uses
    scale=10 with quarter values, which doubles represent exactly): a
    negative exact-half rounds UP (toward zero) under the raw idiom and
    AWAY under money_cents. Anyone tempted to reuse the raw idiom on a
    signed column hits this test in review."""
    df = spark.createDataFrame([(-1.25,), (1.25,), (-3.75,)], "x double")
    rows = (
        df.select(
            "x",
            F.floor(F.col("x") * 10 + 0.5).cast("bigint").alias("raw"),
            money_cents(F.col("x"), scale=10).alias("away"),
        )
        .orderBy("x")
        .collect()
    )
    by_x = {r["x"]: (r["raw"], r["away"]) for r in rows}
    assert by_x[-1.25] == (-12, -13)
    assert by_x[-3.75] == (-37, -38)
    assert by_x[1.25] == (13, 13)  # positive domain: identical


def test_money_cents_null_passthrough(spark):
    df = spark.createDataFrame([(None,), (2.0,)], "x double")
    rows = df.select(money_cents(F.col("x")).alias("c")).orderBy(
        F.col("c").asc_nulls_first()
    ).collect()
    assert rows[0]["c"] is None and rows[1]["c"] == 200
