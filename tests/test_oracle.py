"""Mirror of the driver's correctness gate: every oracle-checkable query
runs on Spark AND DuckDB at sf0.001; row counts, column names, and
order-insensitive canonicalized values must match exactly."""

from __future__ import annotations

import math

import pandas as pd
import pytest

from hw_kafka_flink_health_spark.queries import ORACLES, QUERIES

from tests.conftest import SF_DIR

# full-suite tier: the driver's own correctness gate (and run_simlog)
# re-checks every oracle each round; this mirror runs with
# SPARK_GRAFT_TESTS_FULL=1 (see conftest)
pytestmark = pytest.mark.slow


def assert_driver_scalar_schema(name: str, df) -> None:
    """Catalog-wide lint: the external driver canonicalizes query output via
    pandas sort_values/factorize, which cannot hash list/dict cells — every
    registered query must emit only atomic-typed columns (r03's one red row,
    basket_frequent_itemsets, was an array<string> output column)."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    bad = [
        f"{f.name}: {f.dataType.simpleString()}"
        for f in df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not bad, (
        f"{name}: non-scalar output columns (driver canonicalizer would crash): {bad}"
    )


def canon(df: pd.DataFrame) -> list[tuple]:
    """Order-insensitive canonical form: sorted columns, stringified cells,
    sorted rows."""
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False, name=None):
        cells = []
        for x in row:
            if x is None or (isinstance(x, float) and math.isnan(x)) or x is pd.NaT:
                cells.append("∅")
            elif isinstance(x, float):
                cells.append(repr(x))
            else:
                cells.append(str(x))
        out.append(tuple(cells))
    out.sort()
    return out


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_match(name, spark, duck):
    sdf_spark = QUERIES[name](spark, SF_DIR)
    assert_driver_scalar_schema(name, sdf_spark)
    sdf = sdf_spark.toPandas()
    odf = duck.execute(ORACLES[name]).df()
    assert sorted(map(str.lower, sdf.columns)) == sorted(map(str.lower, odf.columns)), (
        f"{name}: column mismatch {sorted(sdf.columns)} vs {sorted(odf.columns)}"
    )
    odf.columns = [c for c in odf.columns]
    # align case: rename oracle columns to spark's casing
    case_map = {c.lower(): c for c in sdf.columns}
    odf = odf.rename(columns={c: case_map[c.lower()] for c in odf.columns})
    assert len(sdf) == len(odf), f"{name}: row count {len(sdf)} vs {len(odf)}"
    s, o = canon(sdf), canon(odf)
    if s != o:
        diff_s = [r for r in s if r not in set(o)][:5]
        diff_o = [r for r in o if r not in set(s)][:5]
        raise AssertionError(
            f"{name}: value mismatch\n spark-only: {diff_s}\n oracle-only: {diff_o}"
        )


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(name, spark):
    df = QUERIES[name](spark, SF_DIR)
    assert_driver_scalar_schema(name, df)
    assert df.count() >= 0
    assert len(df.columns) > 0
