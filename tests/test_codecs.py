"""Unit tests for the real pure-Python media codecs (no Spark needed)."""

from __future__ import annotations

import hashlib
import struct

import pytest

from wheels_in_motion_analytics_spark.multimodal import codecs as C


def _blocks(prefix: str, n: int) -> bytes:
    return b"".join(hashlib.md5(f"{prefix}:{k}".encode()).digest() for k in range(n))


def test_ppm_roundtrip_and_header_tokenizer():
    pix = _blocks("img:7", 12)
    ppm = C.PPM_HEADER + pix
    assert C.decode_ppm(ppm) == (8, 8, pix)
    # arbitrary conformant header variants must parse too (real parser,
    # not a fixed-offset slice)
    alt = b"P6 8\n8\t255\n" + pix
    assert C.decode_ppm(alt) == (8, 8, pix)
    assert C.decode_ppm(C.encode_ppm(8, 8, pix)) == (8, 8, pix)


def test_ppm_decode_rejects_malformed():
    with pytest.raises(ValueError):
        C.decode_ppm(b"JFIF....")
    with pytest.raises(ValueError):
        C.decode_ppm(b"P6\n8 8\n255\n" + b"x" * 10)  # truncated raster
    with pytest.raises(ValueError):
        C.decode_ppm(b"P6\n2 2\n65535\n" + b"x" * 12)  # 16-bit maxval


def test_ppm_resize_nearest_exact_picks():
    pix = _blocks("img:7", 12)
    resized = C.resize_ppm_nearest(C.PPM_HEADER + pix, 4, 4)
    w, h, raster = C.decode_ppm(resized)
    assert (w, h) == (4, 4)
    exp = bytearray()
    for r in range(4):
        for c in range(4):
            off = ((2 * r) * 8 + 2 * c) * 3
            exp += pix[off : off + 3]
    assert raster == bytes(exp)


def test_ppm_stream_split_parses_frame_boundaries():
    stream = b"".join(C.PPM_HEADER + _blocks(f"vid:7:{f}", 12) for f in range(4))
    frames = C.split_ppm_stream(stream)
    assert len(frames) == 4
    assert all(len(f) == C.PPM_FRAME_BYTES for f in frames)
    assert frames[2] == C.PPM_HEADER + _blocks("vid:7:2", 12)


def test_bmp_decode_undoes_flip_and_bgr():
    pix = _blocks("bmp:7", 12)  # stored bottom-up BGR rows (8x8x3, no pad)
    bmp = C.bmp_header(8, 8) + pix
    w, h, rgb = C.decode_bmp(bmp)
    assert (w, h) == (8, 8) and len(rgb) == 192
    # decoded top-down row 0 pixel 0 = stored row 7 pixel 0, BGR→RGB
    src = 7 * 24
    assert rgb[0] == pix[src + 2] and rgb[1] == pix[src + 1] and rgb[2] == pix[src]
    with pytest.raises(ValueError):
        C.decode_bmp(b"PNG....")


def test_bmp_row_padding_handled():
    # 3x2 image: row = 9 bytes -> padded to 12
    raw_rows = [bytes(range(10, 19)), bytes(range(110, 119))]
    padded = b"".join(r + b"\x00\x00\x00" for r in raw_rows)
    bmp = C.bmp_header(3, 2) + padded
    w, h, rgb = C.decode_bmp(bmp)
    assert (w, h) == (3, 2)
    # decoded row 0 = stored row 1 (bottom-up), channels swapped
    assert rgb[0] == raw_rows[1][2] and rgb[2] == raw_rows[1][0]
    assert len(rgb) == 18  # padding stripped


def test_wav_decode_via_stdlib_wave():
    data = _blocks("wav:7", 32)
    wav = C.wav_header() + data
    rate, n, samples = C.decode_wav(wav)
    assert (rate, n) == (C.WAV_RATE, C.WAV_SAMPLES)
    assert samples[0] == struct.unpack("<h", data[:2])[0]
    assert samples[-1] == struct.unpack("<h", data[-2:])[0]
    assert all(-32768 <= s <= 32767 for s in samples)


def test_image_ahash_popcount_consistency(spark):
    from wheels_in_motion_analytics_spark.registry import load_all_queries

    rows = (
        load_all_queries()["multimodal_image_ahash"]
        .fn(spark, "/root/testdata/sf0.001")
        .collect()
    )
    assert len(rows) == 500
    for r in rows:
        assert 0 <= r["ahash_hi"] < 2**32 and 0 <= r["ahash_lo"] < 2**32
        assert r["n_ones"] == bin(r["ahash_hi"]).count("1") + bin(r["ahash_lo"]).count("1")
        # mean-threshold hashes of non-constant images are never all-0/all-1
        assert 0 < r["n_ones"] < 64


def test_audio_silence_segments_invariants(spark):
    """Python replay of the window/threshold/island pipeline on the real
    decoded samples, plus structural segment invariants."""
    from wheels_in_motion_analytics_spark.multimodal import (
        AUDIO_SEG_WINDOW,
        audio_media_table,
    )
    from wheels_in_motion_analytics_spark.registry import load_all_queries

    rows = {
        r["doc_id"]: r
        for r in load_all_queries()["multimodal_audio_silence_segments"]
        .fn(spark, "/root/testdata/sf0.001")
        .collect()
    }
    assert len(rows) == 500
    n_win = C.WAV_SAMPLES // AUDIO_SEG_WINDOW
    payloads = {
        r["doc_id"]: bytes(r["payload"])
        for r in audio_media_table(spark, "/root/testdata/sf0.001")
        .limit(20)
        .collect()
    }
    for doc_id, payload in payloads.items():
        _, _, samples = C.decode_wav(payload)
        wsums = [
            sum(abs(s) for s in samples[w * AUDIO_SEG_WINDOW : (w + 1) * AUDIO_SEG_WINDOW])
            for w in range(n_win)
        ]
        total = sum(wsums)
        low = [n_win * 2 * ws < total for ws in wsums]
        segs = sum(1 for i, f in enumerate(low) if f and (i == 0 or not low[i - 1]))
        best = 0
        run = 0
        for f in low:
            run = run + 1 if f else 0
            best = max(best, run)
        r = rows[doc_id]
        assert r["total_abs"] == total
        assert r["n_low_windows"] == sum(low)
        assert r["n_segments"] == segs
        assert r["longest_segment"] == best
    for r in rows.values():
        assert r["n_segments"] <= r["n_low_windows"]
        assert r["longest_segment"] <= r["n_low_windows"]
        assert (r["n_segments"] == 0) == (r["n_low_windows"] == 0)
