"""Multimodal (binary) column plumbing for the training-data pipeline.

Image/audio/video payloads are opaque ``binary`` columns with a typed
metadata struct. Real codec decode is STUBBED (``decode_media`` raises
NotImplementedError for real mime types — no image/audio libraries ship in
this container), but everything Spark-side is real and tested: schema,
Arrow batch shape, ``mapInPandas`` kernels operating on raw bytes with
numpy, and 1->N frame explosion.

The deterministic fake codec treats the payload as a raw uint8 buffer
("grayscale pixels" / "PCM samples"), which is exactly the shape a real
decoded frame would have — swapping in PIL/ffmpeg later only changes
``decode_media``, not the Spark plumbing.

Scale notes: all kernels are narrow (no shuffle), Arrow-batched, and
columnar until the numpy boundary. Payload bytes never hit the driver;
``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds executor memory
per batch regardless of corpus size.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ASSET_SCHEMA = (
    "asset_id bigint, kind string, mime string, media binary, "
    "meta struct<width:int, height:int, sample_rate:int, duration_ms:int>"
)

FAKE_MIME = "application/x-fake-raw"

N_FEATURES = 16
RESIZE_TO = 32
FRAME_SIZE = 16


def decode_media(payload: bytes, mime: str) -> np.ndarray:
    """Decode a media payload to a uint8 sample/pixel buffer.

    Real codecs are not available in this environment; only the
    deterministic fake ("raw buffer") mime is implemented. The Spark
    kernels below call this per batch element, so swapping in a real
    decoder is a one-function change."""
    if mime == FAKE_MIME:
        return np.frombuffer(payload, dtype=np.uint8)
    raise NotImplementedError(
        f"codec for {mime!r} not available in this environment; "
        "only application/x-fake-raw is implemented (task-brief stub)"
    )


def assets_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic asset table: media = UTF-8 bytes of documents.text
    (real binary column; byte-level ground truth stays SQL-checkable)."""
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("kind"),
        F.lit(FAKE_MIME).alias("mime"),
        F.encode("text", "UTF-8").alias("media"),
        F.struct(
            F.length("text").cast("int").alias("width"),
            F.lit(1).cast("int").alias("height"),
            F.lit(16000).cast("int").alias("sample_rate"),
            (F.length("text") * 10).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )


def extract_features(assets: DataFrame, n_features: int = N_FEATURES) -> DataFrame:
    """Byte-histogram feature vector per asset (the deterministic stand-in
    for an embedding model): n_features buckets over byte value / 16,
    L1-normalized. Arrow-batched numpy; no per-row Python."""

    def kernel(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_feats = [], []
            for aid, mime, payload in zip(pdf["asset_id"], pdf["mime"], pdf["media"]):
                buf = decode_media(payload, mime)
                hist = np.bincount(buf // 16, minlength=n_features).astype("float64")
                total = max(1, len(buf))
                out_ids.append(aid)
                # half-up rounding (np.round is half-even; SQL ROUND is
                # half-up — exact .5 ties like 0.4765625 would mismatch)
                out_feats.append(
                    (np.floor(hist / total * 1e6 + 0.5) / 1e6).tolist()
                )
            yield pd.DataFrame({"asset_id": out_ids, "features": out_feats})

    return assets.mapInPandas(
        kernel, schema="asset_id bigint, features array<double>"
    )


def resize_media(assets: DataFrame, target: int = RESIZE_TO) -> DataFrame:
    """Nearest-neighbor 1-D resize of the decoded buffer to `target`
    samples — the real resample math a thumbnailer would run, on the fake
    codec's buffer. Returns the resized payload as binary."""

    def kernel(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs = [], []
            for aid, mime, payload in zip(pdf["asset_id"], pdf["mime"], pdf["media"]):
                buf = decode_media(payload, mime)
                n = len(buf)
                idx = (np.arange(target, dtype=np.int64) * n) // target
                ids.append(aid)
                blobs.append(bytes(buf[idx]) if n else b"")
            yield pd.DataFrame({"asset_id": ids, "resized": blobs})

    return assets.mapInPandas(kernel, schema="asset_id bigint, resized binary")


def sample_frames(
    assets: DataFrame, frame_size: int = FRAME_SIZE, every: int = 2
) -> DataFrame:
    """Frame sampling (1 -> N explosion inside the Arrow kernel): split the
    buffer into frame_size-byte frames, keep every `every`-th."""

    def kernel(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for aid, mime, payload in zip(pdf["asset_id"], pdf["mime"], pdf["media"]):
                buf = decode_media(payload, mime)
                n_frames = len(buf) // frame_size
                for fi in range(0, n_frames, every):
                    ids.append(aid)
                    idxs.append(fi)
                    frames.append(bytes(buf[fi * frame_size:(fi + 1) * frame_size]))
            yield pd.DataFrame(
                {"asset_id": ids, "frame_idx": idxs, "frame": frames}
            )

    return assets.mapInPandas(
        kernel, schema="asset_id bigint, frame_idx int, frame binary"
    )
