"""Training-data prep contracts: split determinism + ratios, stratified
sample rates, normalization idempotence."""

from __future__ import annotations

from pyspark.sql import functions as F

from hw_kafka_flink_health_spark.operators.mlprep import (
    normalize_text_expr,
    train_valid_test_split,
)
from hw_kafka_flink_health_spark.queries import QUERIES
from hw_kafka_flink_health_spark.sources.files import load_table

from tests.conftest import SF_DIR


def test_split_ratios_and_determinism(spark):
    docs = load_table(spark, SF_DIR, "documents")
    tagged = train_valid_test_split(docs, "doc_id")
    counts = dict(
        tagged.groupBy("split").count().rdd.map(lambda r: (r["split"], r["count"])).collect()
    )
    total = sum(counts.values())
    assert counts["train"] / total > 0.7
    assert 0.03 < counts["valid"] / total < 0.2
    assert 0.03 < counts["test"] / total < 0.2
    # pure function of the id: two runs agree row-for-row
    a = {r["doc_id"]: r["split"] for r in tagged.select("doc_id", "split").collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in train_valid_test_split(docs, "doc_id").select("doc_id", "split").collect()
    }
    assert a == b


def test_split_salt_decorrelates(spark):
    docs = load_table(spark, SF_DIR, "documents")
    a = {r["doc_id"]: r["split"] for r in
         train_valid_test_split(docs, "doc_id").select("doc_id", "split").collect()}
    b = {r["doc_id"]: r["split"] for r in
         train_valid_test_split(docs, "doc_id", salt="exp2").select("doc_id", "split").collect()}
    assert a != b  # a different salt draws a different split


def test_stratified_sample_deterministic_and_salt_decorrelates(spark):
    """Hash-threshold sampling is a pure function of (id, salt): two runs
    keep exactly the same rows; a different salt draws a different set."""
    from hw_kafka_flink_health_spark.operators.mlprep import stratified_sample

    docs = load_table(spark, SF_DIR, "documents")
    kept = lambda salt: {  # noqa: E731
        r["doc_id"]
        for r in stratified_sample(
            docs, "lang", {"en": 0.25}, id_col="doc_id", default=0.9, salt=salt
        ).select("doc_id").collect()
    }
    a, b = kept("strat"), kept("strat")
    assert a == b
    assert a != kept("strat2")


def test_stratified_sample_rates(spark):
    sampled = QUERIES["mlprep_stratified_sample"](spark, SF_DIR)
    docs = load_table(spark, SF_DIR, "documents")
    base = dict(docs.groupBy("lang").count().rdd.map(lambda r: (r["lang"], r["count"])).collect())
    got = dict(sampled.groupBy("lang").count().rdd.map(lambda r: (r["lang"], r["count"])).collect())
    en_rate = got.get("en", 0) / base["en"]
    assert 0.1 < en_rate < 0.45  # target 0.25
    for lng, n in base.items():
        if lng != "en" and n >= 20:
            assert got.get(lng, 0) / n > 0.7  # target 0.9


def test_normalize_idempotent_and_clean(spark):
    docs = load_table(spark, SF_DIR, "documents")
    once = docs.select(
        "doc_id", normalize_text_expr("text").alias("norm")
    )
    twice = once.select("doc_id", normalize_text_expr("norm").alias("norm2"))
    bad = (
        once.join(twice, "doc_id")
        .filter(
            (F.col("norm") != F.col("norm2"))
            | F.col("norm").rlike("[^a-z0-9 ]")
            | F.col("norm").rlike("  ")
        )
        .count()
    )
    assert bad == 0


def test_shuffle_shards_partitions_the_permutation(spark):
    """shard = contiguous slice of the draw-order permutation; pos dense
    within shard; assignment is a pure function of the id (rerun-stable)."""
    from hw_kafka_flink_health_spark.operators.mlprep import shuffle_shards

    docs = load_table(spark, SF_DIR, "documents")
    a = shuffle_shards(docs, "doc_id", n_shards=8).select("doc_id", "draw", "shard", "pos")
    rows = a.collect()
    assert {r["shard"] for r in rows} <= set(range(8))
    for r in rows:  # fixed uniform cut points: shard is determined by draw alone
        assert r["shard"] == min(int(r["draw"] * 8), 7)
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append((r["pos"], r["draw"], r["doc_id"]))
    for shard, items in by_shard.items():
        items.sort()
        assert [p for p, _, _ in items] == list(range(len(items)))  # dense pos
        draws = [d for _, d, _ in items]
        assert draws == sorted(draws)  # pos follows the permutation order
    b = shuffle_shards(docs, "doc_id", n_shards=8).select("doc_id", "shard", "pos").collect()
    assert sorted(map(tuple, b)) == sorted((r["doc_id"], r["shard"], r["pos"]) for r in rows)


def test_write_shuffled_shards_files_hold_permutation_order(spark, tmp_path):
    """The physical export: each shard directory's rows, in FILE order,
    must equal the shard's permutation order (pos 0..n-1) — i.e. a trainer
    can stream the file without sorting. Verified via _metadata.file_path
    + monotonically increasing row order within each file."""
    from pyspark.sql import functions as F

    from hw_kafka_flink_health_spark.operators.mlprep import (
        shuffle_shards,
        write_shuffled_shards,
    )

    docs = load_table(spark, SF_DIR, "documents")
    out = str(tmp_path / "shards")
    write_shuffled_shards(docs, out, "doc_id", n_shards=4)

    back = spark.read.parquet(out)
    # directory layout: one dir per shard, one file per shard
    files = {
        (r["shard"], r["f"])
        for r in back.select("shard", F.col("_metadata.file_path").alias("f")).distinct().collect()
    }
    assert len({s for s, _ in files}) == 4
    assert len(files) == 4  # exactly one file per shard

    # the export persists neither pos nor draw: file order encodes position
    assert {"pos", "draw"}.isdisjoint(set(back.columns))

    # file order == permutation order: each shard file's doc_id sequence
    # (pyarrow preserves parquet row order) must equal the audit operator's
    # pos-sorted order for that shard
    audit = shuffle_shards(docs, "doc_id", n_shards=4).collect()
    expect_order: dict[int, list] = {}
    for r in sorted(audit, key=lambda r: (r["shard"], r["pos"])):
        expect_order.setdefault(r["shard"], []).append(r["doc_id"])

    import pyarrow.parquet as pq

    for shard, f in files:
        t = pq.read_table(f.replace("file://", "")).to_pandas()
        assert list(t["doc_id"]) == expect_order[shard], (
            f"shard {shard} file order != permutation order"
        )


def test_webdataset_shards_roundtrip_and_byte_determinism(spark, tmp_path):
    """Tar shard export: every row lands exactly once as a .txt/.json
    member pair; member order inside a shard follows the deterministic
    draw; two exports of the same data are byte-identical."""
    import hashlib
    import json as _json
    import tarfile

    from hw_kafka_flink_health_spark.operators.export import write_webdataset_shards

    rows = [(i, f"text number {i}", f"src{i % 3}") for i in range(200)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])

    def export(d):
        out = tmp_path / d
        write_webdataset_shards(
            df, str(out), meta_cols=("source",), n_shards=4
        )
        return out

    out1 = export("a")
    tars = sorted(p.name for p in out1.iterdir())
    assert tars == [f"shard-{i:05d}.tar" for i in range(4)]

    seen = {}
    for t in tars:
        with tarfile.open(out1 / t) as tf:
            names = tf.getnames()
            # strict pairing and order: 00000000.txt, 00000000.json, ...
            for i in range(0, len(names), 2):
                assert names[i] == f"{i // 2:08d}.txt"
                assert names[i + 1] == f"{i // 2:08d}.json"
                meta = _json.loads(tf.extractfile(names[i + 1]).read())
                text = tf.extractfile(names[i]).read().decode()
                assert meta["source"] == f"src{meta['doc_id'] % 3}"
                assert text == f"text number {meta['doc_id']}"
                seen[meta["doc_id"]] = True
    assert len(seen) == 200  # exactly once each

    out2 = export("b")
    for t in tars:
        h1 = hashlib.md5((out1 / t).read_bytes()).hexdigest()
        h2 = hashlib.md5((out2 / t).read_bytes()).hexdigest()
        assert h1 == h2, f"{t}: export not byte-deterministic"


def test_webdataset_read_back_round_trip(spark, tmp_path):
    """write -> read recovers every sample with its metadata and the
    in-shard permutation position."""
    import json as _json

    from hw_kafka_flink_health_spark.operators.export import (
        read_webdataset_shards,
        write_webdataset_shards,
    )

    rows = [(i, f"body {i}", f"s{i % 2}") for i in range(120)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    out = tmp_path / "wds"
    write_webdataset_shards(df, str(out), meta_cols=("source",), n_shards=3)

    back = read_webdataset_shards(spark, str(out)).collect()
    assert len(back) == 120
    seen = set()
    for r in back:
        meta = _json.loads(r.meta_json)
        assert r.text == f"body {meta['doc_id']}"
        assert meta["source"] == f"s{meta['doc_id'] % 2}"
        assert r.key == f"{r.pos:08d}"
        seen.add(meta["doc_id"])
    assert len(seen) == 120
