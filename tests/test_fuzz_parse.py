"""Hypothesis fuzz: the vectorized Catalyst parse pipeline must agree with
the pure-Python reference twin on arbitrary inputs — valid events,
corrupted JSON, missing/null fields, weird-but-legal timestamps."""

from __future__ import annotations

import json

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hw_kafka_flink_health_spark.functions.parsing import parse_event, parse_events_df

iso_ts = st.datetimes(
    min_value=__import__("datetime").datetime(1971, 1, 1),
    max_value=__import__("datetime").datetime(2100, 1, 1),
).map(lambda d: d.isoformat() + "+00:00")

valid_events = st.fixed_dictionaries(
    {
        "patient_id": st.text(
            alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd")),
            min_size=1,
            max_size=8,
        ),
        "timestamp": iso_ts,
        "heart_rate_bpm": st.integers(min_value=0, max_value=500),
    }
).map(json.dumps)

broken_inputs = st.one_of(
    st.text(max_size=30),  # arbitrary garbage
    st.fixed_dictionaries({"patient_id": st.text(max_size=5)}).map(json.dumps),
    st.fixed_dictionaries(
        {
            "patient_id": st.none(),
            "timestamp": iso_ts,
            "heart_rate_bpm": st.integers(0, 500),
        }
    ).map(json.dumps),
    st.fixed_dictionaries(
        {
            "patient_id": st.text(min_size=1, max_size=5),
            "timestamp": st.text(max_size=12),  # usually unparseable ts
            "heart_rate_bpm": st.integers(0, 500),
        }
    ).map(json.dumps),
)


@settings(
    max_examples=12,  # each example is a full Spark job; batch inputs instead
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(st.lists(st.one_of(valid_events, broken_inputs), min_size=1, max_size=40))
def test_engine_parse_agrees_with_python_twin(spark, raws):
    expected = [parse_event(r) for r in raws]
    expected_rows = sorted(
        (e["patient_id"], e["heart_rate_bpm"], e["event_time"])
        for e in expected
        if e is not None
    )
    df = spark.createDataFrame([(r,) for r in raws], ["raw"])
    got = sorted(
        (r.patient_id, r.heart_rate_bpm, r.event_time)
        for r in parse_events_df(df).collect()
    )
    assert got == expected_rows
