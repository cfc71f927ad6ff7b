from __future__ import annotations

import os

import pytest

from hw_kafka_flink_health_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"

#: Two suite tiers (VERDICT r12 #2): the FULL suite (~42 min — the
#: sf0.001 oracle mirror x420, the 5-scenario fuzz sweep x729, the
#: subprocess bench run) does not fit the external verify window, which
#: truncated at ~80% with zero failures and shipped r12 without an
#: independent test verdict. Default = the fast gate (<10 min): every
#: plan-shape / window-sweep / money-idiom / contract / operator-unit
#: test. SPARK_GRAFT_TESTS_FULL=1 runs everything (used for the
#: round-end validation recorded in OPTIMIZATION_r13.md; the oracle
#: mirror the fast tier skips is exactly what the driver's own
#: correctness gate and scripts/run_simlog.py re-check every round).
RUN_FULL = os.environ.get("SPARK_GRAFT_TESTS_FULL", "").lower() in (
    "1",
    "true",
    "yes",
)


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: full-suite tier; skipped unless SPARK_GRAFT_TESTS_FULL=1",
    )


def pytest_collection_modifyitems(config, items):
    if RUN_FULL:
        return
    skip = pytest.mark.skip(
        reason="slow tier; set SPARK_GRAFT_TESTS_FULL=1 for the full suite"
    )
    for item in items:
        if item.get_closest_marker("slow"):
            item.add_marker(skip)


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()
