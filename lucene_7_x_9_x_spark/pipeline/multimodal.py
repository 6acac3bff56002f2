"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed through Arrow-batched mapInPandas.

The decode step is STUBBED (no image/audio libraries in this container): the
default codec is a deterministic fake that derives features from the bytes,
and a real decoder can be injected by passing `decode_fn`. The Spark-side
contract — schema, batch iteration, partition sizing — is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

MEDIA_SCHEMA = ("id long, media_type string, payload binary, "
                "width int, height int, sample_rate int")

FEATURE_SCHEMA = ("id long, media_type string, n_bytes long, "
                  "feat array<float>, sha256 string")


def fake_decode(payload: bytes, media_type: str, dim: int = 8) -> np.ndarray:
    """Deterministic stand-in for image/audio decode + feature extraction:
    features are byte-histogram moments. Replace with a real decoder
    (PIL/torchaudio/ffmpeg) via the decode_fn parameter of
    extract_features()."""
    if payload is None or len(payload) == 0:
        return np.zeros(dim, dtype=np.float32)
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr % dim, minlength=dim).astype(np.float32)
    return (hist / max(len(arr), 1)).astype(np.float32)


def extract_features(df: DataFrame,
                     decode_fn: Callable[[bytes, str], np.ndarray]
                     | None = None,
                     batch_feature_dim: int = 8) -> DataFrame:
    """mapInPandas feature extraction over binary media payloads.

    Arrow-batched: each pandas chunk is decoded as a vectorized batch; the
    per-item decode_fn call is the unavoidable Python step for codec work
    (the libraries are C under the hood), which is the accepted pattern for
    binary media at scale. NOTE: real decoders must be injected; the default
    is the deterministic fake above.
    """
    fn = decode_fn or (lambda p, m: fake_decode(p, m, batch_feature_dim))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [fn(p, m).astype(np.float32).tolist()
                     for p, m in zip(pdf["payload"], pdf["media_type"])]
            shas = [hashlib.sha256(p or b"").hexdigest()
                    for p in pdf["payload"]]
            yield pd.DataFrame({
                "id": pdf["id"].astype("int64"),
                "media_type": pdf["media_type"],
                "n_bytes": pdf["payload"].map(
                    lambda p: len(p) if p is not None else 0).astype("int64"),
                "feat": feats,
                "sha256": shas,
            })

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for an image resample: tiles/truncates the
    source bytes to exactly width*height bytes (np.resize semantics). Real
    plumbing — binary in, binary out, metadata rewritten — with the pixel
    math left to an injected PIL/opencv resize_fn in production."""
    n = max(int(width) * int(height), 0)
    if n == 0:
        return b""
    if not payload:
        return bytes(n)
    return np.resize(np.frombuffer(payload, np.uint8), n).tobytes()


def resize_images(df: DataFrame, width: int, height: int,
                  resize_fn: Callable[[bytes, int, int], bytes]
                  | None = None) -> DataFrame:
    """mapInPandas image resize over binary payloads: emits the same media
    schema with payload replaced and width/height metadata updated — the
    shape a 100 TB media-normalization pass has (one Arrow-batched narrow
    transform, no shuffle)."""
    fn = resize_fn or fake_resize

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out["payload"] = [fn(p, width, height) for p in pdf["payload"]]
            out["width"] = np.int32(width)
            out["height"] = np.int32(height)
            yield out

    return df.mapInPandas(run, schema=MEDIA_SCHEMA)


def frame_sample_plan(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling *plan*: emits (id, frame_idx) rows for frames to
    decode, so the expensive decode fans out across the cluster. Decode
    itself is stubbed (see module docstring)."""
    from pyspark.sql import functions as F
    n_frames = (F.col("n_bytes") / 1024).cast("int")  # fake: 1 frame/KiB
    return (df.withColumn("n_bytes", F.length("payload").cast("long"))
            .withColumn("frame_idx", F.explode(
                F.sequence(F.lit(0),
                           F.greatest(n_frames - 1, F.lit(0)),
                           F.lit(every_n))))
            .select("id", "frame_idx"))
