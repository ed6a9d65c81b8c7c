"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata, processed via Arrow-batched pandas iterators.

The Spark-side plumbing is real and tested (schema, partition-parallel
mapInPandas, batch shapes); the actual codec work is stubbed behind
``P6_SPARK_FAKE_DECODE`` because image/audio libraries are not in this
container — swap `_decode_stub` for a PIL/libav call and nothing else
changes. This is the standard shape for 100 TB media pipelines: payload
bytes never leave the executor, metadata flows as columns, Python sees
Arrow record batches (not rows).
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, digest string, feature array<float>"
)


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests/demos: payload bytes are
    derived from media_id, so every stage is reproducible."""
    rows = []
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        payload = bytes((i * 7 + j) % 256 for j in range(128 + (i % 5) * 32))
        meta = (64 + i % 8, 48 + i % 8, None) if kind == "image" else (None, None, 1000 + i)
        rows.append((i, kind, f"application/x-{kind}", payload, meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _decode_stub(payload: bytes) -> list[float]:
    """Deterministic fake 'decode + feature-extract'. Replace with a real
    codec (PIL/torchaudio/pyav) — the Spark plumbing is unchanged."""
    if os.environ.get("P6_SPARK_REAL_DECODE"):
        raise NotImplementedError(
            "real media decoding requires image/audio libraries not present "
            "in this environment"
        )
    acc = 0
    out = []
    for i, b in enumerate(payload[:32]):
        acc = (acc * 31 + b) % 997
        out.append(float(acc) / 997.0)
    return out


def extract_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Decode/feature-extract via mapInPandas: Arrow batches in, Arrow
    batches out; payload bytes stay executor-local, one Python worker per
    partition. Column pruning still applies upstream — select only the
    columns you need before calling."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": payloads.map(lambda b: len(b) if b is not None else 0),
                    "digest": payloads.map(
                        lambda b: hashlib.md5(b or b"").hexdigest()
                    ),
                    "feature": payloads.map(lambda b: _decode_stub(b or b"")),
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image-resize plumbing: filters to images, routes payloads through a
    pandas batch stage that would call the codec; stubbed to re-emit the
    payload with updated metadata."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            # real impl: decode -> resample to width x height -> re-encode
            pdf["width"] = width
            pdf["height"] = height
            yield pdf[["media_id", "payload", "width", "height"]]

    return (
        media.filter(F.col("kind") == "image")
        .select("media_id", "payload")
        .mapInPandas(run, schema="media_id long, payload binary, width int, height int")
    )


def frame_energy(media: DataFrame, frame_bytes: int = 64) -> DataFrame:
    """Audio frame-energy plumbing: payload bytes chunked into fixed-size
    frames, integer energy (sum of squared centered samples) per frame,
    via an Arrow mapInPandas stage. Samples are read as unsigned 8-bit
    PCM centered at 128 — swap the frombuffer line for a real libav
    decode and nothing else changes. All-integer output, so the stage is
    hash-certifiable cross-engine; payload bytes stay executor-local."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            frames: list[int] = []
            energies: list[int] = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload or b"")
                arr = np.frombuffer(b, dtype=np.uint8).astype(np.int64) - 128
                n_frames = (len(arr) + frame_bytes - 1) // frame_bytes
                for fi in range(n_frames):
                    seg = arr[fi * frame_bytes : (fi + 1) * frame_bytes]
                    ids.append(mid)
                    frames.append(fi)
                    energies.append(int((seg * seg).sum()))
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": frames, "energy": energies},
                dtype="int64",
            )

    return (
        media.filter(F.col("kind") == "audio")
        .select("media_id", "payload")
        .mapInPandas(run, schema="media_id long, frame_idx long, energy long")
    )


def sample_frames(media: DataFrame, every_ms: int = 500) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled frame
    timestamp (explode on a computed sequence — pure column logic; the
    per-frame decode would live in a downstream mapInPandas)."""
    frames = F.sequence(
        F.lit(0),
        F.coalesce(F.col("meta.duration_ms"), F.lit(0)),
        F.lit(every_ms),
    )
    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", F.explode(frames).alias("frame_ts_ms"))
    )
