"""Multimodal column plumbing (SURVEY §2 #9).

The reference's pipeline decodes images and extracts MobileNet feature
vectors before indexing. This container has no image/audio libraries, so the
DECODE STEP IS STUBBED (`decode_image` raises NotImplementedError; the
featurizer falls back to a deterministic digest-based fake). Everything
Spark-side is real and tested: the opaque `binary` payload column with a
typed metadata struct, Arrow-batched `mapInPandas` with a stable output
schema, and the downstream hand-off into the LSH indexer.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import io
from ..session import configure

FEATURE_DIM = 8
FEATURIZE_SCHEMA = "doc_id bigint, n_bytes int, mime string, features array<double>"


def decode_image(payload: bytes) -> "np.ndarray":
    """Real decode path — requires an image library not present here.

    STUB: replace with PIL/cv2 decode + model inference in production."""
    raise NotImplementedError("image decoding requires PIL/cv2; not available in this container")


def fake_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic digest-based stand-in features in [0, 1)."""
    d = hashlib.md5(payload).digest()
    return [int.from_bytes(d[2 * i : 2 * i + 2], "big") / 65536.0 for i in range(dim)]


def featurize_binary(df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id") -> DataFrame:
    """binary payload → feature vector via Arrow-batched mapInPandas.

    Batch shape: each pandas batch holds ≤ arrow.maxRecordsPerBatch rows;
    per-batch numpy work, no per-row Python overhead beyond the decode call.
    """

    def run(batches):
        for pdf in batches:
            payloads = pdf[payload_col]
            feats = []
            for b in payloads:
                # append in BOTH paths so rows stay aligned once the real
                # decode exists (a decoded row must still emit its features)
                try:
                    img = decode_image(bytes(b))  # real path, stubbed here
                    feats.append(np.asarray(img, dtype=np.float64)[:FEATURE_DIM].tolist())
                except NotImplementedError:
                    feats.append(fake_features(bytes(b)))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": [len(bytes(b)) for b in payloads],
                    "mime": pdf["mime"],
                    "features": feats,
                }
            )

    return df.mapInPandas(run, FEATURIZE_SCHEMA)


def multimodal_featurize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: documents' text bytes stand in for image payloads.

    Output is LONG format — one row per (doc, feature dim), flat scalars
    only (array columns aren't canonicalizable by the gate). The digest
    features are 16-bit words / 65536 (exactly representable doubles), so
    a DuckDB oracle reproduces them bit-for-bit from md5 hex substrings —
    this query is fully oracle-gated, stub decode and all."""
    configure(spark)
    docs = io.table(spark, sf_dir, "documents", widen=True)
    payload = docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.lit("text/plain").alias("mime"),
    )
    wide = featurize_binary(payload)
    return wide.select(
        "doc_id",
        "n_bytes",
        "mime",
        F.posexplode("features").alias("feat_idx", "feature"),
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
FRAMESAMPLE_SCHEMA = "doc_id bigint, frame_idx int, frame_bytes int, frame_digest string"


def decode_video(payload: bytes) -> "np.ndarray":
    """Real decode path — requires a video library not present here.

    STUB: replace with pyav/ffmpeg frame extraction in production."""
    raise NotImplementedError("video decoding requires pyav/ffmpeg; not available in this container")


def frame_sample_binary(df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id") -> DataFrame:
    """video-as-binary → N_FRAMES evenly spaced frames via mapInPandas.

    The decode is stubbed (no video libs): each 'frame' is the byte-slice at
    its sample offset, digested deterministically. The Spark plumbing — one
    output row per (doc, frame), stable schema, Arrow batching, even spacing
    arithmetic — is exactly the production shape."""

    def run(batches):
        for pdf in batches:
            rows = {"doc_id": [], "frame_idx": [], "frame_bytes": [], "frame_digest": []}
            for did, b in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(b)
                try:
                    decode_video(raw)  # real path, stubbed in this container
                except NotImplementedError:
                    n = max(len(raw), 1)
                    step = max(n // N_FRAMES, 1)
                    for i in range(N_FRAMES):
                        sl = raw[i * step : i * step + step]
                        rows["doc_id"].append(did)
                        rows["frame_idx"].append(i)
                        rows["frame_bytes"].append(len(sl))
                        rows["frame_digest"].append(hashlib.md5(sl).hexdigest()[:16])
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, FRAMESAMPLE_SCHEMA)


def multimodal_framesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: documents' text bytes stand in for video payloads."""
    configure(spark)
    docs = io.table(spark, sf_dir, "documents", widen=True)
    payload = docs.select("doc_id", F.encode("text", "utf-8").alias("payload"))
    return frame_sample_binary(payload)
