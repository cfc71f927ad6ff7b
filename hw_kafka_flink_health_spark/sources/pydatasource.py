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
from dataclasses import dataclass
from datetime import datetime, timedelta, timezone

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
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


class _PushdownBatchReader(_BatchReader):
    """Batch reader WITH filter pushdown (Spark 4.1 ``pushFilters``):
    range/point predicates on ``event_id`` shrink the GENERATED id range
    — the source never materializes pruned rows, the Python-source analog
    of parquet predicate pushdown. Unsupported filters are returned to
    Spark, which applies them post-scan, so pushdown is only ever an
    optimization, never a correctness dependency. Requires
    ``spark.sql.python.filterPushdown.enabled=true`` (Spark refuses to
    silently ignore an implemented pushFilters otherwise)."""

    def __init__(self, options) -> None:
        super().__init__(options)
        self.lo = 0
        self.hi = self.rows  # exclusive

    def pushFilters(self, filters):
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            LessThan,
            LessThanOrEqual,
        )

        for f in filters:
            col = f.attribute[0] if getattr(f, "attribute", None) else None
            if col != "event_id":
                yield f  # not ours — Spark evaluates it post-scan
            elif isinstance(f, GreaterThanOrEqual):
                self.lo = max(self.lo, int(f.value))
            elif isinstance(f, GreaterThan):
                self.lo = max(self.lo, int(f.value) + 1)
            elif isinstance(f, LessThan):
                self.hi = min(self.hi, int(f.value))
            elif isinstance(f, LessThanOrEqual):
                self.hi = min(self.hi, int(f.value) + 1)
            elif isinstance(f, EqualTo):
                self.lo = max(self.lo, int(f.value))
                self.hi = min(self.hi, int(f.value) + 1)
            else:
                yield f

    def read(self, partition):
        base = max(self.lo, 0)
        for eid in range(base + partition.value, self.hi, self.num_partitions):
            yield _event(eid, self.start_ms)


class _DirWriter(DataSourceWriter):
    """Write side of the API: each task writes its partition to a private
    ``part-<uuid>`` file and reports it in a WriterCommitMessage; only
    ``commit`` (driver, after ALL tasks succeed) publishes a manifest
    naming the parts. Readers that honor the manifest see an atomic
    all-or-nothing dataset; ``abort`` removes the orphan parts. Same
    two-phase contract as Hadoop output committers."""

    def __init__(self, options) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("path option is required")

    def write(self, rows):
        import os
        import uuid

        os.makedirs(self.path, exist_ok=True)
        part = os.path.join(self.path, f"part-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(part, "w") as f:
            for row in rows:
                f.write(json.dumps(row.asDict()) + "\n")
                n += 1
        return SimpleCommitMessage(part=part, count=n)

    def commit(self, messages):
        import os

        manifest = {
            "parts": sorted(os.path.basename(m.part) for m in messages),
            "rows": sum(m.count for m in messages),
        }
        with open(os.path.join(self.path, "_MANIFEST.json"), "w") as f:
            json.dump(manifest, f)

    def abort(self, messages):
        import os

        for m in messages:
            if m is not None and os.path.exists(m.part):
                os.remove(m.part)


@dataclass
class SimpleCommitMessage(WriterCommitMessage):
    part: str
    count: int


class HeartRatePushdownDataSource(HeartRateDataSource):
    """Variant registered as ``heart_rate_pushdown``: same data, plus
    reader filter pushdown and a manifest-committing writer."""

    @classmethod
    def name(cls) -> str:
        return "heart_rate_pushdown"

    def reader(self, schema) -> DataSourceReader:
        return _PushdownBatchReader(self.options)

    def writer(self, schema, overwrite: bool) -> DataSourceWriter:
        return _DirWriter(self.options)


class _ManifestPartition(InputPartition):
    def __init__(self, path: str) -> None:
        self.path = path


class _ManifestReader(DataSourceReader):
    """Reads ONLY the part files named by ``_MANIFEST.json`` — the read
    side of `_DirWriter`'s two-phase commit. Orphan part files (from a
    crashed/aborted write that never published a manifest entry) are
    invisible, so readers always observe an atomic snapshot; one input
    partition per committed part keeps the read parallel."""

    def __init__(self, options, field_names: list[str]) -> None:
        import os

        self.path = options.get("path")
        if not self.path:
            raise ValueError("path option is required")
        self.field_names = field_names
        with open(os.path.join(self.path, "_MANIFEST.json")) as f:
            self.manifest = json.load(f)

    def partitions(self):
        import os

        return [
            _ManifestPartition(os.path.join(self.path, p))
            for p in self.manifest["parts"]
        ]

    def read(self, partition):
        # project by the USER-SUPPLIED schema's field names, not record
        # order — JSONL rows owe no column order to anyone
        with open(partition.path) as f:
            for line in f:
                rec = json.loads(line)
                yield tuple(rec.get(n) for n in self.field_names)


class ManifestJsonlDataSource(DataSource):
    """``manifest_jsonl``: atomic JSONL directory format. Writing goes
    through `_DirWriter` (parts + driver-committed manifest); reading
    trusts the manifest only. The user supplies the schema (JSONL is
    untyped): ``spark.read.format("manifest_jsonl").schema(...)``."""

    @classmethod
    def name(cls) -> str:
        return "manifest_jsonl"

    def reader(self, schema) -> DataSourceReader:
        return _ManifestReader(self.options, [f.name for f in schema.fields])

    def writer(self, schema, overwrite: bool) -> DataSourceWriter:
        return _DirWriter(self.options)
