"""Spark 4 Python DataSource: the reference's synthetic producer as a
first-class pluggable source (``spark.read.format("heart_rate_synthetic")``).

The reference generates heart-rate events with a standalone producer
process (``src/kafka_producer.py:10-51``: 5 patients, bpm =
baseline(65..80) + noise(-10..15), ~10 ev/s) that pipes through Kafka.
``sources/rate.py`` already re-expresses that distribution over the rate
source; THIS module packages the same contract behind Spark 4's Python
DataSource API so it composes like any built-in format — batch reads are
partition-parallel (each task generates a disjoint id stride), and the
same source doubles as a streaming source via the simple stream reader.

Determinism: md5-keyed draws on the event id (pure Python — this code
runs on executors inside the Python worker, where the JVM xxhash64
expressions of rate.py are not available), so any (rows, partitions)
read is byte-reproducible. The wire column ``raw`` carries the exact
producer JSON shape and feeds ``functions.parsing.parse_events_df``.
"""

from __future__ import annotations

import hashlib
import json
from datetime import datetime, timedelta, timezone

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

PATIENTS = [f"p{i:03d}" for i in range(1, 6)]
_SCHEMA = (
    "event_id bigint, patient_id string, timestamp string, "
    "heart_rate_bpm int, raw string"
)
_EPOCH = datetime(1970, 1, 1, tzinfo=timezone.utc)


def _draw(event_id: int, salt: int, mod: int) -> int:
    h = hashlib.md5(f"{event_id}:{salt}".encode()).hexdigest()[:8]
    return int(h, 16) % mod


def _event(event_id: int, start_ms: int) -> tuple:
    patient = PATIENTS[_draw(event_id, 1, len(PATIENTS))]
    baseline = 65 + _draw(event_id, 2, 16)  # randint(65, 80)
    noise = _draw(event_id, 3, 26) - 10  # randint(-10, 15)
    bpm = baseline + noise
    ts = _EPOCH + timedelta(milliseconds=start_ms + event_id * 100)
    iso = ts.strftime("%Y-%m-%dT%H:%M:%S.%f") + "+00:00"
    raw = json.dumps(
        {"patient_id": patient, "timestamp": iso, "heart_rate_bpm": bpm},
        separators=(",", ":"),
    )
    return (event_id, patient, iso, bpm, raw)


def _start_ms(options) -> int:
    start = options.get("startTs", "2025-11-19T07:00:00")
    dt = datetime.fromisoformat(start).replace(tzinfo=timezone.utc)
    return int((dt - _EPOCH).total_seconds() * 1000)


class _BatchReader(DataSourceReader):
    """Partition-parallel batch reads: partition i generates event ids
    ``i, i+P, i+2P, ...`` — disjoint, balanced, and independent of every
    other partition, exactly how a distributed generator must shard."""

    def __init__(self, options) -> None:
        self.rows = int(options.get("rows", "1000"))
        self.num_partitions = int(options.get("numPartitions", "4"))
        self.start_ms = _start_ms(options)

    def partitions(self):
        return [InputPartition(i) for i in range(self.num_partitions)]

    def read(self, partition):
        for eid in range(partition.value, self.rows, self.num_partitions):
            yield _event(eid, self.start_ms)


class _StreamReader(SimpleDataSourceStreamReader):
    """Streaming twin: each micro-batch emits the next ``rowsPerBatch``
    event ids; the offset is just the high-water event id, so restart
    resumes exactly (the source is deterministic in the id)."""

    def __init__(self, options) -> None:
        self.rows_per_batch = int(options.get("rowsPerBatch", "100"))
        self.start_ms = _start_ms(options)

    def initialOffset(self):
        return {"eid": 0}

    def read(self, start):
        s = int(start["eid"])
        end = s + self.rows_per_batch
        rows = [_event(e, self.start_ms) for e in range(s, end)]
        return (iter(rows), {"eid": end})

    def readBetweenOffsets(self, start, end):
        return iter(
            _event(e, self.start_ms)
            for e in range(int(start["eid"]), int(end["eid"]))
        )


class HeartRateDataSource(DataSource):
    """``spark.dataSource.register(HeartRateDataSource)`` then
    ``spark.read.format("heart_rate_synthetic").option("rows", N).load()``
    (batch) or ``spark.readStream.format("heart_rate_synthetic")``."""

    @classmethod
    def name(cls) -> str:
        return "heart_rate_synthetic"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return _BatchReader(self.options)

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return _StreamReader(self.options)
