"""Multimodal plumbing: binary columns through Arrow-batched mapInPandas —
decode/feature-extract/resize/frame-sample, with the deterministic fake
codec (real image/audio libs are absent by design)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hw_kafka_flink_health_spark.operators.multimodal import (
    attach_payload_metadata,
    decode_image_batch,
    documents_as_assets,
    extract_features,
    resize_images,
    sample_frames,
)
from hw_kafka_flink_health_spark.sources.files import load_table

SF = "/root/testdata/sf0.001"


def _assets(spark):
    return documents_as_assets(load_table(spark, SF, "documents").limit(30))


def test_metadata_is_jvm_side(spark):
    out = attach_payload_metadata(_assets(spark))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan  # metadata never leaves the JVM
    rows = out.collect()
    assert all(r.byte_len > 0 and len(r.content_md5) == 32 for r in rows)


def test_extract_features_deterministic(spark):
    a = {r.asset_id: (r.feat_mean, r.feat_std, r.feat_dim) for r in extract_features(_assets(spark)).collect()}
    b = {r.asset_id: (r.feat_mean, r.feat_std, r.feat_dim) for r in extract_features(_assets(spark)).collect()}
    assert a == b
    assert all(dim == 16 for (_, _, dim) in a.values())


def test_resize_reduces_and_preserves_schema(spark):
    out = resize_images(_assets(spark), target_w=32, target_h=32)
    rows = out.collect()
    assert rows
    budget = 32 * 32 // 64
    for r in rows:
        assert len(r.payload) <= budget
        assert (r.width, r.height) == (32, 32)
    assert dict(out.dtypes)["payload"] == "binary"


def test_sample_frames_expands_video_rows(spark):
    assets = _assets(spark)
    n_videos = assets.filter(F.col("modality") == "video").count()
    frames = sample_frames(assets, n_frames=4).collect()
    assert len(frames) == 4 * n_videos
    assert {r.frame_idx for r in frames} == {0, 1, 2, 3}
    # frames partition the payload deterministically
    by_asset = {}
    for r in frames:
        by_asset.setdefault(r.asset_id, []).append(r)
    for rs in by_asset.values():
        assert len({r.frame_idx for r in rs}) == 4


def test_real_decoder_slot_is_explicitly_stubbed():
    import pandas as pd

    with pytest.raises(NotImplementedError):
        decode_image_batch(pd.Series([b"xx"]))
