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
AUDIO_SCHEMA = "doc_id bigint, n_bytes int, window_idx int, rms double"


def decode_audio(payload: bytes) -> "np.ndarray":
    """Real decode path — requires an audio library not present here.

    STUB: replace with soundfile/librosa decode in production."""
    raise NotImplementedError(
        "audio decoding requires soundfile/librosa; not available in this container"
    )


def audio_window_stats(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """binary audio payload → per-window RMS energy via mapInPandas — the
    audio twin of featurize_binary (same batch shape, same stub contract).
    The digest stand-in derives window w's RMS from md5(payload ∥ '#w'),
    first 2 digest bytes / 65536 — exactly representable and reproducible
    from SQL, so the registry entry is fully oracle-gated."""

    def run(batches):
        for pdf in batches:
            out = {"doc_id": [], "n_bytes": [], "window_idx": [], "rms": []}
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                bb = bytes(b)
                try:
                    wave = decode_audio(bb)  # real path, stubbed here
                    win = np.array_split(np.asarray(wave, dtype=np.float64), AUDIO_WINDOWS)
                    vals = [float(np.sqrt(np.mean(w * w))) for w in win]
                except NotImplementedError:
                    vals = [
                        int.from_bytes(
                            hashlib.md5(bb + f"#{w}".encode()).digest()[:2], "big"
                        )
                        / 65536.0
                        for w in range(AUDIO_WINDOWS)
                    ]
                for w, v in enumerate(vals):
                    out["doc_id"].append(i)
                    out["n_bytes"].append(len(bb))
                    out["window_idx"].append(w)
                    out["rms"].append(v)
            yield pd.DataFrame(out)

    return df.mapInPandas(run, AUDIO_SCHEMA)


def multimodal_audio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: documents' text bytes stand in for audio payloads
    (same convention as multimodal_featurize). Fully oracle-gated — the
    digest windows are reproducible from md5 hex in SQL.

    Output: (doc_id, n_bytes, window_idx, rms)."""
    configure(spark)
    docs = io.table(spark, sf_dir, "documents", widen=True)
    payload = docs.select("doc_id", F.encode("text", "utf-8").alias("payload"))
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
