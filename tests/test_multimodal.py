"""Multimodal binary-column plumbing (task brief): schema, Arrow batch
shape, stubbed codec, deterministic kernels."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from harvesting_validator_spark.multimodal import (
    FAKE_MIME,
    FRAME_SIZE,
    N_FEATURES,
    RESIZE_TO,
    assets_from_documents,
    decode_media,
    extract_features,
    resize_media,
    sample_frames,
)


@pytest.fixture(scope="module")
def assets(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return assets_from_documents(docs).persist()


def test_decode_stub_raises_for_real_codecs():
    with pytest.raises(NotImplementedError):
        decode_media(b"\x89PNG...", "image/png")
    with pytest.raises(NotImplementedError):
        decode_media(b"RIFF....", "audio/wav")
    out = decode_media(b"abc", FAKE_MIME)
    assert out.dtype == np.uint8 and out.tolist() == [97, 98, 99]


def test_asset_schema(assets):
    s = dict(assets.dtypes)
    assert s["media"] == "binary"
    assert s["meta"].startswith("struct<width:int,height:int")
    kinds = {r.kind for r in assets.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_features_shape_and_norm(assets):
    rows = extract_features(assets).collect()
    assert all(len(r.features) == N_FEATURES for r in rows)
    # L1 norm == 1 (up to rounding) for non-empty payloads
    assert all(abs(sum(r.features) - 1.0) < 1e-3 for r in rows)


def test_resize_deterministic_and_sized(assets):
    a = {r.asset_id: r.resized for r in resize_media(assets).collect()}
    b = {r.asset_id: r.resized for r in resize_media(assets).collect()}
    assert a == b
    assert all(len(v) == RESIZE_TO for v in a.values())


def test_frame_sampling_counts(assets, spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    expected = {
        r.doc_id: (r.n // FRAME_SIZE + 1) // 2  # every 2nd frame
        for r in docs.select("doc_id", F.length("text").alias("n")).collect()
    }
    got = {
        r.asset_id: r["count"]
        for r in sample_frames(assets).groupBy("asset_id").count().collect()
    }
    for k, n in expected.items():
        assert got.get(k, 0) == n
    # frames carry their in-asset index and fixed size
    fr = sample_frames(assets).filter(F.col("asset_id") == 0).collect()
    assert [r.frame_idx for r in sorted(fr, key=lambda r: r.frame_idx)] == list(
        range(0, 2 * len(fr), 2)
    )
    assert all(len(r.frame) == FRAME_SIZE for r in fr)
