"""Round-11 real stdlib codec (VERDICT r10 item 5): the multimodal
decode path is no longer an env-gated NotImplementedError — PCM WAV
parses via a RIFF chunk walk and binary PPM via a Netpbm header parser,
both pure stdlib. Pins:
(a) the WAV parser agrees with Python's own `wave` module writer on
    channels/rate/samples (independent stdlib reference),
(b) decode_features on real containers matches hand-computed features,
(c) frame_energy REALLY decodes WAV payloads (signed 16-bit PCM
    energies, not byte-fingerprint energies) while opaque payloads keep
    the certified unsigned-8-bit path byte-identical,
(d) the end-to-end Arrow mapInPandas stage runs the real codec on a
    mixed real-media table,
(e) P6_SPARK_REAL_DECODE flips opaque payloads from fallback to a loud
    ValueError; recognized containers decode with or without the flag."""

from __future__ import annotations

import io
import struct
import wave

import pytest

from p6_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    _decode_stub,
    _wav_samples,
    decode_features,
    extract_features,
    frame_energy,
    synthetic_media,
)

SAMPLES = [0, 1000, -1000, 32000, -32000, 5, -5, 12345, -12345, 64, 7, -8]


def _wav_bytes(samples: list[int], n_ch: int = 1, rate: int = 16_000) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_ch)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def _ppm_bytes(width: int, height: int, pixels: list[tuple[int, int, int]]) -> bytes:
    head = f"P6\n# test comment\n{width} {height}\n255\n".encode()
    return head + bytes(c for p in pixels for c in p)


def test_wav_parser_agrees_with_stdlib_wave_writer():
    payload = _wav_bytes(SAMPLES, n_ch=2, rate=44_100)
    n_ch, rate, samples = _wav_samples(payload)
    assert (n_ch, rate) == (2, 44_100)
    assert samples == SAMPLES


def test_wav_features_match_hand_computation():
    payload = _wav_bytes(SAMPLES)
    feats = decode_features(payload)
    assert feats[:3] == [1.0, 16.0, float(len(SAMPLES))]
    seg = (len(SAMPLES) + 7) // 8  # 2 samples per segment
    want = []
    for k in range(8):
        part = SAMPLES[k * seg : (k + 1) * seg]
        want.append(
            (sum(abs(s) for s in part) / len(part)) / 32768.0 if part else 0.0
        )
    assert feats[3:] == want


def test_ppm_features_match_hand_computation():
    pixels = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (10, 20, 30)]
    feats = decode_features(_ppm_bytes(2, 2, pixels))
    assert feats[:3] == [2.0, 2.0, 255.0]
    for i in range(3):
        assert feats[3 + i] == (sum(p[i] for p in pixels) / 4) / 255


def test_opaque_payload_keeps_fingerprint_fallback_and_strict_raises(
    monkeypatch,
):
    opaque = bytes(range(40))
    monkeypatch.delenv("P6_SPARK_REAL_DECODE", raising=False)
    assert decode_features(opaque) == _decode_stub(opaque)
    monkeypatch.setenv("P6_SPARK_REAL_DECODE", "1")
    with pytest.raises(ValueError, match="unrecognized media container"):
        decode_features(opaque)
    # recognized containers decode regardless of the flag
    assert decode_features(_wav_bytes(SAMPLES))[2] == float(len(SAMPLES))


def test_frame_energy_really_decodes_wav(spark):
    payload = _wav_bytes(SAMPLES)
    media = spark.createDataFrame(
        [(0, "audio", "audio/wav", payload, (None, None, 1000))], MEDIA_SCHEMA
    )
    rows = frame_energy(media, frame_bytes=4).orderBy("frame_idx").collect()
    want = [
        sum(s * s for s in SAMPLES[i : i + 4]) for i in range(0, len(SAMPLES), 4)
    ]
    assert [r["energy"] for r in rows] == want
    assert [r["frame_idx"] for r in rows] == list(range(len(want)))


def test_frame_energy_opaque_path_byte_identical(spark):
    """The synthetic-corpus certification path (unsigned 8-bit centered
    at 128) is untouched by the codec upgrade."""
    media = synthetic_media(spark, n=6)
    rows = frame_energy(media, frame_bytes=64).collect()
    payloads = {
        r["media_id"]: bytes(r["payload"])
        for r in media.filter("kind = 'audio'").collect()
    }
    want = {}
    for mid, b in payloads.items():
        arr = [x - 128 for x in b]
        for fi in range(0, (len(arr) + 63) // 64):
            seg = arr[fi * 64 : (fi + 1) * 64]
            want[(mid, fi)] = sum(s * s for s in seg)
    got = {(r["media_id"], r["frame_idx"]): r["energy"] for r in rows}
    assert got == want


def test_extract_features_runs_real_codec_end_to_end(spark):
    wav = _wav_bytes(SAMPLES)
    ppm = _ppm_bytes(2, 2, [(9, 9, 9)] * 4)
    opaque = bytes(range(64))
    media = spark.createDataFrame(
        [
            (0, "audio", "audio/wav", wav, (None, None, 10)),
            (1, "image", "image/x-portable-pixmap", ppm, (2, 2, None)),
            (2, "video", "application/x-video", opaque, (None, None, 99)),
        ],
        MEDIA_SCHEMA,
    )
    got = {
        r["media_id"]: r
        for r in extract_features(media).orderBy("media_id").collect()
    }
    assert got[0]["feature"][:3] == [1.0, 16.0, float(len(SAMPLES))]
    assert got[1]["feature"][:3] == [2.0, 2.0, 255.0]
    assert got[2]["feature"] == [
        pytest.approx(x) for x in _decode_stub(opaque)
    ]
    assert got[0]["n_bytes"] == len(wav)


def test_resize_ppm_nearest_neighbor_exact():
    # 2x2 source with distinct corner colors; 4x4 NN upsample maps
    # dst (x,y) -> src ((x*2)//4, (y*2)//4): each corner becomes a 2x2 block
    from p6_spark.operators.multimodal import _ppm_header, _resize_ppm

    corners = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (9, 9, 9)]
    src = _ppm_bytes(2, 2, corners)
    out = _resize_ppm(src, 4, 4)
    w, h, maxval, pos = _ppm_header(out)
    assert (w, h, maxval) == (4, 4, 255)
    pix = out[pos:]
    assert len(pix) == 4 * 4 * 3
    got = [
        tuple(pix[3 * (y * 4 + x) : 3 * (y * 4 + x) + 3])
        for y in range(4)
        for x in range(4)
    ]
    want = [
        corners[(y // 2) * 2 + (x // 2)] for y in range(4) for x in range(4)
    ]
    assert got == want
    # downsample back to 2x2 recovers the corners exactly
    back = _resize_ppm(out, 2, 2)
    _, _, _, bpos = _ppm_header(back)
    assert [
        tuple(back[bpos + 3 * i : bpos + 3 * i + 3]) for i in range(4)
    ] == corners


def test_resize_images_really_resizes_ppm_and_passes_opaque(spark):
    from p6_spark.operators.multimodal import resize_images

    ppm = _ppm_bytes(2, 2, [(1, 2, 3), (4, 5, 6), (7, 8, 9), (10, 11, 12)])
    opaque = bytes(range(48))
    media = spark.createDataFrame(
        [
            (0, "image", "image/x-portable-pixmap", ppm, (2, 2, None)),
            (1, "image", "application/octet-stream", opaque, (8, 6, None)),
            (2, "audio", "audio/wav", b"RIFFxxxx", (None, None, 5)),
        ],
        MEDIA_SCHEMA,
    )
    rows = {
        r["media_id"]: r
        for r in resize_images(media, 3, 3).orderBy("media_id").collect()
    }
    assert sorted(rows) == [0, 1]  # audio filtered out
    from p6_spark.operators.multimodal import _ppm_header

    w, h, maxval, pos = _ppm_header(bytes(rows[0]["payload"]))
    assert (w, h) == (3, 3) and rows[0]["width"] == 3
    assert len(bytes(rows[0]["payload"])) == pos + 27
    # opaque image passes through byte-identical (certified harness arm)
    assert bytes(rows[1]["payload"]) == opaque


def test_resize_payload_strict_raises_on_opaque(monkeypatch):
    # driver-side dispatch test (the executor env does not track a
    # post-fork monkeypatch, same pattern as the decode_features pin)
    from p6_spark.operators.multimodal import _resize_payload

    opaque = bytes(range(16))
    monkeypatch.delenv("P6_SPARK_REAL_DECODE", raising=False)
    assert _resize_payload(opaque, 2, 2) == opaque
    assert _resize_payload(None, 2, 2) is None
    monkeypatch.setenv("P6_SPARK_REAL_DECODE", "1")
    with pytest.raises(ValueError, match="unrecognized image container"):
        _resize_payload(opaque, 2, 2)
    # recognized PPM resizes regardless of the flag
    ppm = _ppm_bytes(2, 2, [(1, 2, 3)] * 4)
    assert _resize_payload(ppm, 1, 1)[-3:] == bytes((1, 2, 3))
