"""Un-gated Kafka round-trip over the emulated transport: the same
sources/kafka.py builders the broker path uses (S1-S4), with only the
wire swapped for `emulated://<dir>` base64-JSONL topics. This executes
the full value-bytes -> CAST(value AS STRING) -> parse -> window ->
classify -> to_json -> sink chain in CI; the real-broker twin stays in
test_kafka_smoke.py behind SPARK_GRAFT_KAFKA=1."""

from __future__ import annotations

import json


def _hr_event(pid: str, iso_ts: str, bpm: int) -> bytes:
    return json.dumps(
        {"patient_id": pid, "timestamp": iso_ts, "heart_rate_bpm": bpm}
    ).encode("utf-8")


def test_emulated_kafka_alert_roundtrip(spark, tmp_path):
    """events topic -> read_kafka_stream -> build_streaming_job ->
    write_kafka_stream -> alerts topic -> read_kafka_batch: the reference
    Part-2 dataflow end to end over the emulated wire, with deterministic
    events so the emitted alert windows are exactly checkable."""
    from hw_kafka_flink_health_spark.sources.kafka import (
        emulated_produce,
        read_kafka_batch,
        read_kafka_stream,
        write_kafka_stream,
    )
    from hw_kafka_flink_health_spark.streaming.health_pipeline import (
        build_streaming_job,
    )

    bootstrap = f"emulated://{tmp_path}/broker"
    # one closed 1-min window for p1 (avg 120 -> high alert) and p2 (avg 55)
    emulated_produce(
        bootstrap,
        "heart_rate_events",
        [
            _hr_event("p1", "2026-01-01T07:00:05+00:00", 110),
            _hr_event("p1", "2026-01-01T07:00:25+00:00", 130),
            _hr_event("p2", "2026-01-01T07:00:15+00:00", 55),
            b"{not json at all",  # must be dropped by the parse filter
        ],
    )
    alerts = build_streaming_job(
        read_kafka_stream(spark, bootstrap=bootstrap, starting_offsets="earliest")
    )
    q = write_kafka_stream(
        alerts,
        bootstrap=bootstrap,
        checkpoint_dir=str(tmp_path / "ck_alerts"),
        trigger_seconds=1,
    )
    q.processAllAvailable()
    # sentinel far ahead: advances the watermark so the 07:00 window closes
    emulated_produce(
        bootstrap,
        "heart_rate_events",
        [_hr_event("p9", "2026-01-01T09:00:00+00:00", 80)],
    )
    q.processAllAvailable()
    q.stop()

    rows = read_kafka_batch(spark, "heart_rate_alerts", bootstrap=bootstrap).collect()
    docs = {d["patient_id"]: d for d in (json.loads(r["raw"]) for r in rows)}
    assert docs["p1"]["avg_hr"] == 120.0
    assert docs["p1"]["alert_type"] == "tachycardia"
    assert docs["p2"]["avg_hr"] == 55.0
    assert docs["p2"]["alert_type"] == "normal"
    # the malformed message never produced an alert row
    assert all(pid in {"p1", "p2", "p9"} for pid in docs)


def test_emulated_kafka_hello_roundtrip(spark, tmp_path):
    """Reference README Part 1 flow over the emulated wire: hello producer
    payloads -> annotate -> sink -> consume, same library functions as the
    broker-gated twin."""
    from hw_kafka_flink_health_spark.functions.parsing import annotate_df
    from hw_kafka_flink_health_spark.sources.kafka import (
        emulated_produce,
        read_kafka_batch,
        read_kafka_stream,
        write_kafka_stream,
    )

    bootstrap = f"emulated://{tmp_path}/broker"
    emulated_produce(
        bootstrap,
        "hello_input",
        [
            json.dumps(
                {"id": i, "message": "hello flink", "timestamp": f"2026-01-01T00:00:0{i}"}
            )
            for i in range(3)
        ],
    )
    annotated = annotate_df(
        read_kafka_stream(
            spark,
            topic="hello_input",
            bootstrap=bootstrap,
            group_id="spark-hello-world",
        ),
        processed_by="hello_spark_job",
    )
    q = write_kafka_stream(
        annotated,
        topic="hello_output",
        bootstrap=bootstrap,
        checkpoint_dir=str(tmp_path / "ck_hello"),
        trigger_seconds=1,
    )
    q.processAllAvailable()
    q.stop()

    rows = read_kafka_batch(spark, "hello_output", bootstrap=bootstrap).collect()
    assert len(rows) == 3
    docs = sorted((json.loads(r["raw"]) for r in rows), key=lambda d: d["id"])
    assert [d["id"] for d in docs] == [0, 1, 2]
    assert all(d["processed_by"] == "hello_spark_job" for d in docs)
    assert all(d["message"] == "hello flink" for d in docs)


def test_emulated_sink_offsets_unique_and_batch_ordered(spark, tmp_path):
    """Regression (round-5 advice): the emulated sink derived offsets as
    batch_id*1e6 + monotonically_increasing_id(), but mono-id packs the
    partition id into its HIGH 33 bits, so any multi-partition batch
    produced offsets that could collide with much-later batches of
    partition 0. Offsets must be unique per topic and advance per batch;
    within (batch, partition) they order rows."""
    import glob

    from hw_kafka_flink_health_spark.sources.kafka import (
        emulated_produce,
        read_kafka_stream,
        write_kafka_stream,
    )

    bootstrap = f"emulated://{tmp_path}/broker"
    src = read_kafka_stream(
        spark, topic="offsets_in", bootstrap=bootstrap, starting_offsets="earliest"
    ).repartition(4)  # force a MULTI-partition micro-batch
    q = write_kafka_stream(
        src.selectExpr("raw AS value"),
        topic="offsets_out",
        bootstrap=bootstrap,
        checkpoint_dir=str(tmp_path / "ck_off"),
        trigger_seconds=1,
    )
    per_batch = []
    for batch in range(2):
        emulated_produce(
            bootstrap, "offsets_in", [f"m{batch}-{i}" for i in range(40)]
        )
        q.processAllAvailable()
        rows = []
        for path in glob.glob(f"{tmp_path}/broker/offsets_out/*.json"):
            with open(path) as f:
                rows.extend(json.loads(line) for line in f if line.strip())
        per_batch.append(rows)
    q.stop()

    offsets = [r["offset"] for r in per_batch[1]]
    assert len(offsets) == 80
    assert len(set(offsets)) == 80, "emulated offsets must be unique per topic"
    assert len({r["partition"] for r in per_batch[1]}) > 1, (
        "test must exercise a multi-partition batch"
    )
    batch0 = {r["offset"] for r in per_batch[0]}
    batch1 = {r["offset"] for r in per_batch[1]} - batch0
    assert min(batch1) > max(batch0), "offsets must advance per batch"
