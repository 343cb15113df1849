"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are treated as `binary` columns with a metadata
struct. The Spark-side plumbing (schema, batching, mapInPandas signatures,
partition sizing) is real and tested; the actual decoders are STUBBED behind
`_decode_image` / `_decode_audio` because the sandbox has no imaging/audio
libraries — each stub is deterministic (derived from the payload bytes) so
tests are stable, and raises NotImplementedError when `strict=True`.

Scale notes: binary columns dominate row size, so `mapInPandas` with small
Arrow batches (set spark.sql.execution.arrow.maxRecordsPerBatch) keeps executor
memory bounded; decode stages should run after filter/prune stages so only
surviving rows pay decode cost.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["binary_metadata", "image_features", "frame_sample"]

IMAGE_META_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("n_bytes", T.LongType(), False),
    T.StructField("sha256", T.StringType(), False),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("feature", T.ArrayType(T.FloatType()), False),
])


def _decode_image(payload: bytes, strict: bool = False):
    """STUB image decode. A real deployment plugs PIL/turbojpeg here; the
    sandbox has neither, so dimensions are derived deterministically from the
    payload hash (keeps the pipeline shape + tests real)."""
    if strict:
        raise NotImplementedError("image decoding requires an imaging library")
    h = hashlib.sha256(payload).digest()
    return {
        "width": 64 + h[0] % 192,
        "height": 64 + h[1] % 192,
    }


def binary_metadata(docs: DataFrame, id_col: str = "doc_id",
                    bin_col: str = "payload", strict: bool = False) -> DataFrame:
    """Extract typed metadata from a binary column via mapInPandas (Arrow
    batches, no per-row Python round-trips through the JVM)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [_decode_image(bytes(b), strict) for b in pdf[bin_col]]
            yield pd.DataFrame({
                "doc_id": pdf[id_col].astype(np.int64),
                "n_bytes": pdf[bin_col].map(len).astype(np.int64),
                "sha256": [hashlib.sha256(bytes(b)).hexdigest()
                           for b in pdf[bin_col]],
                "width": [m["width"] for m in metas],
                "height": [m["height"] for m in metas],
            })

    return docs.select(id_col, bin_col).mapInPandas(gen, IMAGE_META_SCHEMA)


def image_features(docs: DataFrame, id_col: str = "doc_id",
                   bin_col: str = "payload", dim: int = 16,
                   strict: bool = False) -> DataFrame:
    """STUB feature extraction (real deployment: a vision model). Deterministic
    byte-histogram features keep downstream ANN/cluster stages testable."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict:
                raise NotImplementedError("feature extraction needs a model")
            feats = []
            for b in pdf[bin_col]:
                arr = np.frombuffer(bytes(b), dtype=np.uint8)
                hist, _ = np.histogram(arr, bins=dim, range=(0, 256))
                total = max(1, hist.sum())
                feats.append((hist / total).astype(np.float32).tolist())
            yield pd.DataFrame({
                "doc_id": pdf[id_col].astype(np.int64),
                "feature": feats,
            })

    return docs.select(id_col, bin_col).mapInPandas(gen, FEATURE_SCHEMA)


def frame_sample(docs: DataFrame, id_col: str = "doc_id",
                 bin_col: str = "payload", every_n_bytes: int = 1024,
                 max_frames: int = 8) -> DataFrame:
    """STUB frame sampling for video-like payloads: emit one 'frame' row per
    every_n_bytes offset (real deployment: ffmpeg keyframe extraction). Shows
    the explode shape: one input row -> bounded multiple output rows."""
    schema = T.StructType([
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("offset", T.LongType(), False),
        T.StructField("frame_sha1", T.StringType(), False),
    ])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, b in zip(pdf[id_col], pdf[bin_col]):
                raw = bytes(b)
                n = min(max_frames, max(1, len(raw) // every_n_bytes))
                for i in range(n):
                    off = i * every_n_bytes
                    chunk = raw[off:off + every_n_bytes]
                    rows.append((int(did), i, off,
                                 hashlib.sha1(chunk).hexdigest()))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "offset",
                                              "frame_sha1"])

    return docs.select(id_col, bin_col).mapInPandas(gen, schema)
