"""Multimodal columns — opaque binary payloads with typed metadata.

A 100 TB training-data pipeline carries image/audio/video next to text:
the engine's contract is an opaque ``binary`` payload column plus a typed
metadata struct, with decode / feature-extract / resize / frame-sample as
Arrow-batched stages over ``mapInPandas``.

The actual codec step is STUBBED in this environment (no PIL/ffmpeg in the
container): ``decode_payload`` raises ``NotImplementedError`` unless a
decoder is importable, and the featurizers fall back to a clearly-marked
deterministic byte-level featurization. Everything Spark-side — schema,
partitioning, UDF signatures, Arrow batch shapes — is real and tested; a
real decoder drops into ``_DECODERS`` without touching the plan.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id bigint, kind string, payload binary, "
    "meta struct<width: int, height: int, sample_rate: int, duration_ms: int>"
)

FEATURE_SCHEMA = "media_id bigint, kind string, n_bytes int, features array<double>"
FRAME_SCHEMA = "media_id bigint, frame_id int, frame binary"

_DECODERS: dict[str, object] = {}  # kind -> callable(bytes) -> object; empty here


def synth_media(spark, n: int, partitions: int = 8) -> DataFrame:
    """Deterministic fake media table (seeded by id, no RNG state)."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kinds = ["image", "audio", "video"]
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                kind = kinds[i % 3]
                payload = (hashlib.sha256(f"media{i}".encode()).digest()
                           * (4 + i % 5))
                rows.append({
                    "media_id": i, "kind": kind, "payload": payload,
                    "meta": {"width": 64 + (i % 8) * 32 if kind == "image" else None,
                             "height": 64 + (i % 4) * 32 if kind == "image" else None,
                             "sample_rate": 16000 if kind == "audio" else None,
                             "duration_ms": 1000 + i % 9000 if kind != "image" else None},
                })
            yield pd.DataFrame(rows, columns=["media_id", "kind", "payload", "meta"])

    return spark.range(n, numPartitions=partitions).mapInPandas(gen, MEDIA_SCHEMA)


def extract_binary_meta(media: DataFrame) -> DataFrame:
    """JVM-side payload introspection: byte length + leading magic bytes —
    no Python in the plan (the cheap metadata pass runs before any decode)."""
    return media.select(
        "media_id", "kind",
        F.length("payload").alias("n_bytes"),
        F.upper(F.hex(F.expr("substring(payload, 1, 4)"))).alias("magic"),
        F.col("meta.width").alias("width"),
        F.col("meta.duration_ms").alias("duration_ms"),
    )


def decode_payload(kind: str, payload: bytes):
    """The codec boundary. Real decoders are not available in this
    container — register one in ``_DECODERS`` to activate."""
    dec = _DECODERS.get(kind)
    if dec is None:
        raise NotImplementedError(
            f"no decoder registered for kind={kind!r} in this environment"
        )
    return dec(payload)


def _fake_featurize(payload: bytes, dim: int = 16) -> list[float]:
    """DETERMINISTIC FAKE featurization (decode stub): normalized histogram
    of byte values in ``dim`` bins — stands in for a real embedding."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist, _ = np.histogram(arr, bins=dim, range=(0, 256))
    total = max(1, int(hist.sum()))
    return (hist / total).astype("float64").tolist()


def featurize_media(media: DataFrame, dim: int = 16) -> DataFrame:
    """Arrow-batched feature extraction over the binary column. Tries the
    real decoder first; falls back to the deterministic fake featurizer."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for kind, payload in zip(pdf["kind"], pdf["payload"]):
                try:
                    decoded = decode_payload(kind, payload)  # real path
                    feats.append(_fake_featurize(bytes(decoded), dim))
                except NotImplementedError:
                    feats.append(_fake_featurize(bytes(payload), dim))
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["payload"].map(len).astype("int32"),
                "features": feats,
            })

    return media.select("media_id", "kind", "payload").mapInPandas(
        run, FEATURE_SCHEMA)


def frame_sample(media: DataFrame, frame_bytes: int = 32,
                 every_n: int = 2) -> DataFrame:
    """Frame sampling plumbing: slice each payload into fixed-size frames
    and keep every n-th — the batch shape (1 input row → many output rows)
    a real video frame sampler has."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fids, frames = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload)
                n_frames = len(raw) // frame_bytes
                for f in range(0, n_frames, every_n):
                    ids.append(int(mid))
                    fids.append(f)
                    frames.append(raw[f * frame_bytes:(f + 1) * frame_bytes])
            yield pd.DataFrame({"media_id": ids, "frame_id": fids,
                                "frame": frames})

    return media.select("media_id", "payload").mapInPandas(run, FRAME_SCHEMA)
