"""Multimodal column plumbing (SURVEY §2 #9).

The reference's pipeline decodes images and extracts MobileNet feature
vectors before indexing. The container has no PIL/cv2/ffmpeg, so decoding is
limited to formats parseable with struct + numpy alone — which is enough for
REAL decode paths on all three modalities: uncompressed 24-bit BMP images
(`decode_image`), PCM16 RIFF/WAVE audio (`decode_audio`), and a BMP-frame
video container (`decode_video`). Compressed formats (JPEG/MP3/H.264) would
slot into the same `mapInPandas` pipelines once the codec libraries exist;
payloads the parsers reject fall back to a deterministic digest stand-in,
flagged `decoded=false`. Everything Spark-side is real and tested: the
opaque `binary` payload column, Arrow-batched `mapInPandas` with stable
output schemas, and the downstream hand-off into the LSH indexer.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import io
from ..session import configure

FEATURE_DIM = 8
FEATURIZE_SCHEMA = (
    "doc_id bigint, n_bytes int, mime string, features array<double>, decoded boolean"
)

# synthetic test-image parameters (shared with the DuckDB oracle):
# pixel[k, c] = (seed + k·B + c·C) mod 256, k the top-down linear index,
# c ∈ {0:R, 1:G, 2:B}; seed = doc_id·A for still images. W=18 makes the
# 54-byte BMP row stride pad to 56 — the decoder's padding path is exercised
# on every payload, not just in unit tests.
IMG_W, IMG_H = 18, 9
IMG_A, IMG_B, IMG_C = 7907, 151, 101
_BMP_HDR = 54  # 14-byte file header + 40-byte BITMAPINFOHEADER


def _bmp_stride(w: int) -> int:
    return (w * 3 + 3) // 4 * 4


def decode_image(payload: bytes) -> "np.ndarray":
    """REAL decode: parse an uncompressed 24-bit BMP (BITMAPINFOHEADER)
    with struct + numpy — no image library needed. Returns (h, w, 3) uint8
    RGB. Raises ValueError for anything else (compressed/paletted formats
    would need PIL/cv2)."""
    if len(payload) < _BMP_HDR or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (data_off,) = struct.unpack("<I", payload[10:14])
    hdr_size, w, h, planes, bpp, compression = struct.unpack("<IiiHHI", payload[14:34])
    if hdr_size < 40 or bpp != 24 or compression != 0 or planes != 1:
        raise ValueError(f"only uncompressed 24-bit BMP supported, got bpp={bpp} comp={compression}")
    flip = h > 0  # positive height = bottom-up row order (the common case)
    h = abs(h)
    stride = _bmp_stride(w)
    data = payload[data_off : data_off + stride * h]
    if len(data) != stride * h:
        raise ValueError("truncated BMP pixel array")
    rows = np.frombuffer(data, dtype=np.uint8).reshape(h, stride)[:, : w * 3]
    px = rows.reshape(h, w, 3)[:, :, ::-1]  # BGR storage → RGB
    return px[::-1] if flip else px


def synth_bmp(seed: int, w: int = IMG_W, h: int = IMG_H) -> bytes:
    """Deterministic 24-bit BMP: pixel[k, c] = (seed + k·B + c·C) mod 256 —
    a real bottom-up, row-padded BMP file the decoder parses back, with
    values the DuckDB oracle regenerates from the same integer formula."""
    k = np.arange(w * h, dtype=np.int64)[:, None]
    c = np.arange(3, dtype=np.int64)[None, :]
    px = ((seed + k * IMG_B + c * IMG_C) % 256).astype(np.uint8).reshape(h, w, 3)
    stride = _bmp_stride(w)
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = px[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    size = _BMP_HDR + stride * h
    return (
        b"BM"
        + struct.pack("<IHHI", size, 0, 0, _BMP_HDR)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, stride * h, 2835, 2835, 0, 0)
        + rows.tobytes()
    )


def image_features(px: "np.ndarray") -> list[float]:
    """8 decoded-pixel features, bit-exact cross-engine: per-channel mean
    (0-2), per-channel RMS (3-5), global mean (6), global max/255 (7). Each
    is an exact integer sum (≪ 2^53) followed by one or two correctly-
    rounded IEEE ops (divide, sqrt), so the DuckDB oracle reproduces the
    identical doubles from SQL aggregates over the shared pixel formula."""
    x = np.asarray(px, dtype=np.int64)
    n = x.shape[0] * x.shape[1]
    ch_sum = x.sum(axis=(0, 1))
    ch_sq = (x * x).sum(axis=(0, 1))
    return (
        [float(s / n) for s in ch_sum]
        + [float(np.sqrt(s2 / n)) for s2 in ch_sq]
        + [float(x.sum() / (3 * n)), float(x.max() / 255.0)]
    )


def fake_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic digest-based stand-in features in [0, 1) — the
    fallback for payloads the BMP parser rejects."""
    d = hashlib.md5(payload).digest()
    return [int.from_bytes(d[2 * i : 2 * i + 2], "big") / 65536.0 for i in range(dim)]


def featurize_binary(df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id") -> DataFrame:
    """binary payload → feature vector via Arrow-batched mapInPandas.

    BMP payloads take the REAL decode path (struct/numpy parser, features
    over actual pixels); anything else falls back to the md5-digest
    stand-in, flagged decoded=false. Batch shape: each pandas batch holds
    ≤ arrow.maxRecordsPerBatch rows; per-batch numpy work, no per-row
    Python overhead beyond the decode call.
    """

    def run(batches):
        for pdf in batches:
            payloads = pdf[payload_col]
            feats, decoded = [], []
            for b in payloads:
                bb = bytes(b)
                try:
                    feats.append(image_features(decode_image(bb)))
                    decoded.append(True)
                except ValueError:
                    feats.append(fake_features(bb))
                    decoded.append(False)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": [len(bytes(b)) for b in payloads],
                    "mime": pdf["mime"],
                    "features": feats,
                    "decoded": decoded,
                }
            )

    return df.mapInPandas(run, FEATURIZE_SCHEMA)


def _synth_bmp_udf():
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def _synth(doc_ids: pd.Series) -> pd.Series:
        return doc_ids.map(lambda d: synth_bmp(int(d) * IMG_A))

    return _synth


def multimodal_featurize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: each document gets a deterministic synthetic 24-bit
    BMP payload (synth_bmp), and featurization runs through the REAL decode
    path — BMP parse, actual pixel statistics — not the digest stub. The
    oracle regenerates the pixels from the shared integer formula and
    asserts decoded=TRUE on every row, so the gate fails if any payload
    silently falls back to the stub.

    Output is LONG format — one row per (doc, feature dim), flat scalars
    only (array columns aren't canonicalizable by the gate)."""
    configure(spark)
    docs = io.table(spark, sf_dir, "documents", widen=True)
    payload = docs.select(
        "doc_id",
        _synth_bmp_udf()(F.col("doc_id")).alias("payload"),
        F.lit("image/bmp").alias("mime"),
    )
    wide = featurize_binary(payload)
    return wide.select(
        "doc_id",
        "n_bytes",
        "mime",
        F.posexplode("features").alias("feat_idx", "feature"),
        "decoded",
    )


AUDIO_WINDOWS = 4
AUDIO_SCHEMA = "doc_id bigint, n_bytes int, window_idx int, rms double, decoded boolean"
# synthetic test-audio parameters (shared with the DuckDB oracle)
WAV_SAMPLES = 256
WAV_RATE = 8000
WAV_A, WAV_B = 7919, 104729  # sample[k] = ((doc_id·A + k·B) mod 2^16) − 2^15


def decode_audio(payload: bytes) -> "np.ndarray":
    """REAL decode: parse an uncompressed RIFF/WAVE PCM16 payload with
    struct + numpy (no audio library needed) and return float64 samples
    (multi-channel downmixed by mean). Raises ValueError for anything that
    is not PCM16 WAV — compressed formats would need soundfile/librosa."""
    import struct

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    fmt, data, pos = None, None, 12
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, n_channels, _rate, _byte_rate, _block_align, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError(f"only PCM16 supported, got format={audio_format} bits={bits}")
    x = np.frombuffer(data, dtype="<i2").astype(np.float64)
    if n_channels > 1:
        x = x.reshape(-1, n_channels).mean(axis=1)
    return x


def synth_wav(doc_id: int, n: int = WAV_SAMPLES, rate: int = WAV_RATE) -> bytes:
    """Deterministic mono PCM16 WAV: sample[k] = ((doc_id·A + k·B) mod 2^16)
    − 2^15 — a real RIFF file the decoder parses, with samples the DuckDB
    oracle regenerates from the same integer formula."""
    import struct

    k = np.arange(n, dtype=np.int64)
    x = ((doc_id * WAV_A + k * WAV_B) % 65536 - 32768).astype("<i2")
    data = x.tobytes()
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def audio_window_stats(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """binary audio payload → per-window RMS energy via mapInPandas — the
    audio twin of featurize_binary. PCM16 WAV payloads take the REAL decode
    path (struct/numpy parser, actual sample math); anything else falls back
    to the md5-digest stand-in, flagged decoded=false. RMS over int16
    samples is bit-exact cross-engine: the squared sum is an exact int64
    (≤ n·2^30 ≪ 2^53), and /n then sqrt are single correctly-rounded IEEE
    ops — so the oracle reproduces the doubles bit-for-bit from SQL."""

    def run(batches):
        for pdf in batches:
            out = {"doc_id": [], "n_bytes": [], "window_idx": [], "rms": [], "decoded": []}
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                bb = bytes(b)
                try:
                    wave = decode_audio(bb)
                    win = np.array_split(np.asarray(wave, dtype=np.float64), AUDIO_WINDOWS)
                    vals = [float(np.sqrt(np.mean(w * w))) for w in win]
                    ok = True
                except ValueError:
                    vals = [
                        int.from_bytes(
                            hashlib.md5(bb + f"#{w}".encode()).digest()[:2], "big"
                        )
                        / 65536.0
                        for w in range(AUDIO_WINDOWS)
                    ]
                    ok = False
                for w, v in enumerate(vals):
                    out["doc_id"].append(i)
                    out["n_bytes"].append(len(bb))
                    out["window_idx"].append(w)
                    out["rms"].append(v)
                    out["decoded"].append(ok)
            yield pd.DataFrame(out)

    return df.mapInPandas(run, AUDIO_SCHEMA)


def _synth_wav_udf():
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def _synth(doc_ids: pd.Series) -> pd.Series:
        return doc_ids.map(lambda d: synth_wav(int(d)))

    return _synth


def multimodal_audio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: each document gets a deterministic synthetic PCM16
    WAV payload (synth_wav), and the stats run through the REAL decode path
    — RIFF parse, int16 samples, actual windowed RMS — not the digest stub.
    The oracle regenerates the samples from the shared integer formula and
    asserts decoded=TRUE on every row, so the gate fails if any payload
    silently falls back to the stub.

    Output: (doc_id, n_bytes, window_idx, rms, decoded)."""
    configure(spark)
    docs = io.table(spark, sf_dir, "documents", widen=True)
    payload = docs.select("doc_id", _synth_wav_udf()(F.col("doc_id")).alias("payload"))
    return audio_window_stats(payload)


N_FRAMES = 4
FRAMESAMPLE_SCHEMA = (
    "doc_id bigint, frame_idx int, src_frame int, frame_w int, frame_h int,"
    " frame_mean double, frame_rms double, decoded boolean"
)
# synthetic test-video parameters (shared with the DuckDB oracle): VID_FRAMES
# BMP frames of VID_W×VID_H in an RVID container; frame f of doc d has pixel
# seed d·IMG_A + f·VID_D, so every (frame, pixel, channel) value is the same
# integer formula the image path uses, shifted per frame.
VID_FRAMES = 8
VID_W, VID_H = 10, 6
VID_D = 4099
_RVID_MAGIC = b"RVID"


def decode_video(payload: bytes) -> "np.ndarray":
    """REAL decode: parse the RVID container (magic + u32 frame count, then
    length-prefixed BMP frames) and decode every frame through decode_image.
    Returns (n_frames, h, w, 3) uint8 RGB. Raises ValueError for anything
    else — real codecs (H.264 etc.) would need pyav/ffmpeg, but the frame-
    extraction pipeline downstream is identical."""
    if len(payload) < 8 or payload[:4] != _RVID_MAGIC:
        raise ValueError("not an RVID payload")
    (n_frames,) = struct.unpack("<I", payload[4:8])
    frames, pos = [], 8
    for _ in range(n_frames):
        if pos + 4 > len(payload):
            raise ValueError("truncated RVID frame table")
        (ln,) = struct.unpack("<I", payload[pos : pos + 4])
        frames.append(decode_image(payload[pos + 4 : pos + 4 + ln]))
        pos += 4 + ln
    if not frames:
        raise ValueError("empty RVID container")
    return np.stack(frames)


def synth_video(doc_id: int, n_frames: int = VID_FRAMES) -> bytes:
    """Deterministic RVID container of synth_bmp frames."""
    out = [_RVID_MAGIC, struct.pack("<I", n_frames)]
    for f in range(n_frames):
        b = synth_bmp(doc_id * IMG_A + f * VID_D, w=VID_W, h=VID_H)
        out.append(struct.pack("<I", len(b)))
        out.append(b)
    return b"".join(out)


def frame_sample_binary(df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id") -> DataFrame:
    """video-as-binary → N_FRAMES evenly spaced decoded frames via
    mapInPandas: one output row per (doc, sampled frame) with the source
    frame index and bit-exact pixel statistics (mean, RMS — same exact-
    integer-sum + single-IEEE-op contract as image_features). RVID payloads
    take the REAL decode path; anything else falls back to byte-slice
    digests (frame_w/h = 0, decoded = false)."""

    def run(batches):
        for pdf in batches:
            rows = {
                "doc_id": [], "frame_idx": [], "src_frame": [], "frame_w": [],
                "frame_h": [], "frame_mean": [], "frame_rms": [], "decoded": [],
            }
            for did, b in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(b)
                try:
                    vid = decode_video(raw).astype(np.int64)
                    n_frames, h, w = vid.shape[0], vid.shape[1], vid.shape[2]
                    step = max(n_frames // N_FRAMES, 1)
                    n_vals = 3 * h * w
                    for i in range(N_FRAMES):
                        src = min(i * step, n_frames - 1)
                        x = vid[src]
                        rows["doc_id"].append(did)
                        rows["frame_idx"].append(i)
                        rows["src_frame"].append(src)
                        rows["frame_w"].append(w)
                        rows["frame_h"].append(h)
                        rows["frame_mean"].append(float(x.sum() / n_vals))
                        rows["frame_rms"].append(float(np.sqrt((x * x).sum() / n_vals)))
                        rows["decoded"].append(True)
                except ValueError:
                    n = max(len(raw), 1)
                    step = max(n // N_FRAMES, 1)
                    for i in range(N_FRAMES):
                        sl = raw[i * step : i * step + step]
                        d = hashlib.md5(sl).digest()
                        rows["doc_id"].append(did)
                        rows["frame_idx"].append(i)
                        rows["src_frame"].append(i)
                        rows["frame_w"].append(0)
                        rows["frame_h"].append(0)
                        rows["frame_mean"].append(int.from_bytes(d[:2], "big") / 65536.0)
                        rows["frame_rms"].append(int.from_bytes(d[2:4], "big") / 65536.0)
                        rows["decoded"].append(False)
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, FRAMESAMPLE_SCHEMA)


def _synth_video_udf():
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def _synth(doc_ids: pd.Series) -> pd.Series:
        return doc_ids.map(lambda d: synth_video(int(d)))

    return _synth


def multimodal_framesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: each document gets a deterministic synthetic RVID
    video payload (VID_FRAMES BMP frames), and sampling runs through the
    REAL decode path — container parse, per-frame BMP decode, actual pixel
    statistics. The oracle regenerates every sampled frame's pixels from
    the shared integer formula and asserts decoded=TRUE on every row."""
    configure(spark)
    docs = io.table(spark, sf_dir, "documents", widen=True)
    payload = docs.select("doc_id", _synth_video_udf()(F.col("doc_id")).alias("payload"))
    return frame_sample_binary(payload)
