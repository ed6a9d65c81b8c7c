"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata, processed via Arrow-batched pandas iterators.

The Spark-side plumbing is real and tested (schema, partition-parallel
mapInPandas, batch shapes). Since round 11 the codec itself is real for
the two containers the stdlib can parse — PCM WAV (RIFF chunk walk,
8/16/24/32-bit signed samples) and binary PPM (Netpbm P6 header +
pixels) — with a deterministic byte-fingerprint featurizer as the
fallback for opaque payloads (swap in PIL/libav for richer formats;
nothing else changes). ``P6_SPARK_REAL_DECODE`` flips the fallback into
a loud ValueError for pipelines that require every payload decoded.
This is the standard shape for 100 TB media pipelines: payload bytes
never leave the executor, metadata flows as columns, Python sees Arrow
record batches (not rows).
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
    """Deterministic byte-fingerprint featurizer — the fallback for
    OPAQUE payloads (no recognized container). Swap in PIL/libav for
    richer formats; the Spark plumbing is unchanged."""
    acc = 0
    out = []
    for i, b in enumerate(payload[:32]):
        acc = (acc * 31 + b) % 997
        out.append(float(acc) / 997.0)
    return out


def _is_wav(payload: bytes) -> bool:
    return payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"


def _is_ppm(payload: bytes) -> bool:
    return payload[:2] == b"P6" and payload[2:3] in (b" ", b"\t", b"\n", b"\r")


def _wav_chunks(payload: bytes) -> dict[bytes, bytes]:
    """RIFF chunk walk (stdlib-only): {chunk_id: body} for fmt/data."""
    out: dict[bytes, bytes] = {}
    pos = 12  # past RIFF<size>WAVE
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        out[cid] = payload[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    return out


def _wav_samples(payload: bytes) -> tuple[int, int, list[int]]:
    """Parse a PCM WAV container: (n_channels, frame_rate, samples) with
    samples interleaved and CENTERED at 0 (8-bit PCM is unsigned and
    stored biased by 128; 16/24/32-bit are signed little-endian)."""
    import struct

    chunks = _wav_chunks(payload)
    if b"fmt " not in chunks or b"data" not in chunks:
        raise ValueError("WAV payload missing fmt/data chunk")
    fmt = chunks[b"fmt "]
    audio_format, n_ch, rate = struct.unpack_from("<HHI", fmt, 0)
    bits = struct.unpack_from("<H", fmt, 14)[0]
    if audio_format != 1:
        raise ValueError(f"only PCM WAV supported (format {audio_format})")
    data = chunks[b"data"]
    width = bits // 8
    n = len(data) // width
    if width == 1:
        samples = [b - 128 for b in data[:n]]
    else:
        samples = [
            int.from_bytes(data[i * width : (i + 1) * width], "little", signed=True)
            for i in range(n)
        ]
    return n_ch, rate, samples


def _decode_wav(payload: bytes) -> list[float]:
    """Real WAV feature-extract: [n_channels, rate_khz, n_frames,
    then 8 per-segment mean-|sample| values normalized to full scale].
    All inputs to the float stage are exact integers, so the vector is
    deterministic across runs/partitions."""
    n_ch, rate, samples = _wav_samples(payload)
    n_frames = len(samples) // max(n_ch, 1)
    head = [float(n_ch), rate / 1000.0, float(n_frames)]
    if not samples:
        return head + [0.0] * 8
    full_scale = 128.0 if max(abs(s) for s in samples) <= 127 else 32768.0
    seg = (len(samples) + 7) // 8
    feats = []
    for k in range(8):
        part = samples[k * seg : (k + 1) * seg]
        feats.append(
            (sum(abs(s) for s in part) / len(part)) / full_scale if part else 0.0
        )
    return head + feats


def _ppm_header(payload: bytes) -> tuple[int, int, int, int]:
    """Parse a binary-PPM (P6) header: (width, height, maxval,
    pixel_data_offset). Header tokens are whitespace-separated with
    '#' comments, per the Netpbm spec."""
    toks: list[int] = []
    pos = 2  # past 'P6'
    while len(toks) < 3:
        c = payload[pos : pos + 1]
        if c == b"#":
            pos = payload.index(b"\n", pos) + 1
        elif c.isspace():
            pos += 1
        elif c.isdigit():
            end = pos
            while payload[end : end + 1].isdigit():
                end += 1
            toks.append(int(payload[pos:end]))
            pos = end
        else:
            raise ValueError("malformed PPM header")
    pos += 1  # single whitespace after maxval
    width, height, maxval = toks
    return width, height, maxval, pos


def _decode_ppm(payload: bytes) -> list[float]:
    """Real binary-PPM (P6) feature-extract: [width, height, maxval,
    mean R, mean G, mean B normalized to maxval]."""
    width, height, maxval, pos = _ppm_header(payload)
    n = width * height
    pix = payload[pos : pos + 3 * n]
    if len(pix) < 3 * n:
        raise ValueError("truncated PPM pixel data")
    sums = [0, 0, 0]
    for i in range(n):
        sums[0] += pix[3 * i]
        sums[1] += pix[3 * i + 1]
        sums[2] += pix[3 * i + 2]
    return [float(width), float(height), float(maxval)] + [
        (s / n) / maxval for s in sums
    ]


def _resize_ppm(payload: bytes, new_w: int, new_h: int) -> bytes:
    """Real binary-PPM resize: nearest-neighbor resample to new_w x
    new_h and re-encode with a canonical ``P6\\n{w} {h}\\n{maxval}\\n``
    header. Source pixel for destination (x, y) is
    ((x * src_w) // new_w, (y * src_h) // new_h) — pure integer
    arithmetic, so the output bytes are deterministic across engines
    and platforms."""
    src_w, src_h, maxval, pos = _ppm_header(payload)
    n = src_w * src_h
    pix = payload[pos : pos + 3 * n]
    if len(pix) < 3 * n:
        raise ValueError("truncated PPM pixel data")
    out = bytearray(f"P6\n{new_w} {new_h}\n{maxval}\n".encode())
    for y in range(new_h):
        sy = (y * src_h) // new_h
        row = sy * src_w
        for x in range(new_w):
            sx = (x * src_w) // new_w
            i = 3 * (row + sx)
            out += pix[i : i + 3]
    return bytes(out)


def decode_features(payload: bytes) -> list[float]:
    """Codec dispatch: REAL stdlib decode for recognized containers
    (PCM WAV via RIFF chunk walk, binary PPM), byte-fingerprint
    fallback for opaque payloads. With ``P6_SPARK_REAL_DECODE`` set,
    unrecognized containers RAISE instead of falling back — the loud-
    failure posture for pipelines that require every payload decoded
    (rows route through the dead-letter machinery upstream)."""
    if _is_wav(payload):
        return _decode_wav(payload)
    if _is_ppm(payload):
        return _decode_ppm(payload)
    if os.environ.get("P6_SPARK_REAL_DECODE"):
        raise ValueError(
            "P6_SPARK_REAL_DECODE: unrecognized media container "
            f"(head={payload[:4]!r}); only PCM WAV and binary PPM decode "
            "with the stdlib codec"
        )
    return _decode_stub(payload)


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
                    "feature": payloads.map(lambda b: decode_features(b or b"")),
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def _resize_payload(b, width: int, height: int):
    """Per-payload resize dispatch (same posture as decode_features):
    REAL nearest-neighbor resize for recognized binary PPM, byte-
    identical passthrough for opaque payloads, and a loud ValueError
    for opaque payloads under ``P6_SPARK_REAL_DECODE``."""
    if b is not None and _is_ppm(b):
        return _resize_ppm(b, width, height)
    if b is not None and os.environ.get("P6_SPARK_REAL_DECODE"):
        raise ValueError(
            "P6_SPARK_REAL_DECODE: unrecognized image container "
            f"(head={bytes(b)[:4]!r}); only binary PPM resizes with the "
            "stdlib codec"
        )
    return b


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize via an Arrow mapInPandas stage: filters to images
    and routes payloads through the codec. A recognized binary-PPM
    container is REALLY resized (nearest-neighbor resample + re-encode,
    r11's stdlib codec); opaque payloads pass through byte-identical
    with updated declared dims (the certified harness-corpus path).
    With ``P6_SPARK_REAL_DECODE`` set, an opaque image payload RAISES
    instead — the same loud-failure posture as ``decode_features``."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["payload"] = pdf["payload"].map(
                lambda b: _resize_payload(b, width, height)
            )
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
    via an Arrow mapInPandas stage. A recognized PCM WAV container is
    REALLY decoded (RIFF chunk walk, signed samples — r11's stdlib
    codec); opaque payloads are read as unsigned 8-bit PCM centered at
    128, which keeps the synthetic-corpus certification byte-stable.
    All-integer output, so the stage is hash-certifiable cross-engine;
    payload bytes stay executor-local."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            frames: list[int] = []
            energies: list[int] = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload or b"")
                if _is_wav(b):
                    _, _, samples = _wav_samples(b)
                    arr = np.asarray(samples, dtype=np.int64)
                else:
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
