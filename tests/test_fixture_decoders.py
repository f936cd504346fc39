"""Fixture-based decoder tests (VERDICT r4 #5): every parser is exercised
on bytes it did NOT synthesize itself, killing the "decoder only parses its
own synthesis" circularity.

External fixtures used:
- the 2x2 24-bit BMP worked example published in the Wikipedia "BMP file
  format" article (a byte-for-byte transcription of a file produced by an
  external encoder, with documented expected pixels);
- CPython's own test image `python.bmp` (32bpp BI_BITFIELDS BITMAPV5 —
  a real-world format the decoder must REJECT cleanly, driving the
  documented digest-fallback path);
- WAV files written by the Python standard library's `wave` module — an
  independent, standards-authoritative encoder, not the repo's synth_wav;
- an RVID container assembled byte-by-byte in this test (independent
  struct packing, not synth_video) whose frames are the external BMP.
"""

from __future__ import annotations

import io as std_io
import struct
import sys
import sysconfig
import wave
from pathlib import Path

import numpy as np
import pytest

from elastik_nearest_neighbors_spark.operators.multimodal import (
    decode_audio,
    decode_image,
    decode_video,
    image_features,
)

# Wikipedia "BMP file format", Example 1: 2x2, 24bpp, bottom-up.
# Expected pixels (top-down RGB): (0,0,255) (0,255,0) / (255,0,0) (255,255,255)
WIKIPEDIA_BMP_2X2 = bytes.fromhex(
    "424D460000000000000036000000"  # BITMAPFILEHEADER: "BM", size 70, offset 54
    "2800000002000000020000000100"  # BITMAPINFOHEADER: 40, w=2, h=2, planes=1
    "18000000000010000000130B0000"  # bpp=24, comp=0, imgsize=16, 2835 ppm
    "130B00000000000000000000"     # 2835 ppm, 0 colors, 0 important
    "0000FF" "FFFFFF" "0000"        # bottom row: red, white, pad
    "FF0000" "00FF00" "0000"        # top row: blue, green, pad
)


def test_external_bmp_fixture_decodes_pixel_exact():
    px = decode_image(WIKIPEDIA_BMP_2X2)
    assert px.shape == (2, 2, 3) and px.dtype == np.uint8
    want = np.array(
        [[[0, 0, 255], [0, 255, 0]], [[255, 0, 0], [255, 255, 255]]],
        dtype=np.uint8,
    )
    assert np.array_equal(px, want)
    # features off the external pixels: exact integer sums -> exact doubles
    feats = image_features(px)
    # channel-value total = 255*3 (pure pixels) + 765 (white) = 1530 over 12
    assert feats[6] == pytest.approx(1530 / 12.0, abs=0)  # global mean
    assert feats[7] == 1.0  # max/255
    # per-channel means: R=(0+0+255+255)/4, G=(0+255+0+255)/4, B=(255+0+0+255)/4
    assert feats[0:3] == [127.5, 127.5, 127.5]


def _cpython_bmp() -> bytes | None:
    base = Path(sysconfig.get_paths()["stdlib"])
    for rel in ("test/test_email/data/python.bmp",):
        p = base / rel
        if p.exists():
            return p.read_bytes()
    return None


def test_real_world_unsupported_bmp_rejected_cleanly():
    """CPython's python.bmp is 32bpp BI_BITFIELDS — a real encoder's output
    the parser must refuse with the documented ValueError (not crash or
    misparse), which is what routes featurize to the digest fallback."""
    payload = _cpython_bmp()
    if payload is None:
        pytest.skip("CPython test image not present in this install")
    assert payload[:2] == b"BM"  # it IS a BMP container...
    with pytest.raises(ValueError, match="only uncompressed 24-bit BMP"):
        decode_image(payload)  # ...just not a flavor we claim to decode


def _stdlib_wav(frames: np.ndarray, n_channels: int, rate: int = 8000) -> bytes:
    buf = std_io.BytesIO()
    w = wave.open(buf, "wb")
    w.setnchannels(n_channels)
    w.setsampwidth(2)
    w.setframerate(rate)
    w.writeframes(frames.astype("<i2").tobytes())
    w.close()
    return buf.getvalue()


def test_stdlib_wave_mono_fixture_decodes_sample_exact():
    samples = np.array([0, 1, -1, 32767, -32768, 12345, -12345], dtype=np.int64)
    payload = _stdlib_wav(samples, n_channels=1)
    # provenance check: the bytes really came from the stdlib encoder,
    # which writes a canonical RIFF/WAVE fmt chunk
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    x = decode_audio(payload)
    assert x.dtype == np.float64
    assert np.array_equal(x, samples.astype(np.float64))


def test_stdlib_wave_stereo_fixture_downmixes_exact():
    left = np.array([100, -200, 300, -32768], dtype=np.int64)
    right = np.array([300, 200, -300, -32768], dtype=np.int64)
    inter = np.empty(8, dtype=np.int64)
    inter[0::2], inter[1::2] = left, right
    payload = _stdlib_wav(inter, n_channels=2)
    x = decode_audio(payload)
    assert np.array_equal(x, (left + right) / 2.0)


def test_handbuilt_rvid_of_external_frames_decodes():
    """RVID is this repo's own container, so no external encoder exists;
    the fixture is instead assembled byte-by-byte HERE (independent struct
    packing, not synth_video) and its frames are the external BMP — the
    container parser and the frame decoder both run on foreign bytes."""
    n = 3
    parts = [b"RVID", struct.pack("<I", n)]
    for _ in range(n):
        parts.append(struct.pack("<I", len(WIKIPEDIA_BMP_2X2)))
        parts.append(WIKIPEDIA_BMP_2X2)
    frames = decode_video(b"".join(parts))
    assert frames.shape == (n, 2, 2, 3)
    want = np.array(
        [[[0, 0, 255], [0, 255, 0]], [[255, 0, 0], [255, 255, 255]]],
        dtype=np.uint8,
    )
    for f in range(n):
        assert np.array_equal(frames[f], want)
    # truncated container: clean error, not a misparse
    with pytest.raises(ValueError):
        decode_video(b"".join(parts)[:-10] + b"\x00" * 4)
