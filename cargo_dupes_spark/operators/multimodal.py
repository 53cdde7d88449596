"""Multimodal columns: opaque binary payloads + typed metadata.

Training-data pipelines carry image/audio/video as `binary` columns with a
metadata struct; the Spark-side plumbing (schema, partitioning, Arrow batch
shape, UDF signatures) is real and tested here, while the codec step is
STUBBED — the decode libraries (Pillow, ffmpeg, torchaudio) are not in this
container. Each stub either raises NotImplementedError (strict mode) or
produces a deterministic fake derived from the payload bytes (test mode),
so downstream operators (dedup on perceptual hashes, feature joins) are
exercised end-to-end.

The reference analog is the `MacroCall{name}` opaque node
(``dupes-rust/src/normalizer/helpers.rs:15-31``): an object we can't look
inside, carried with its name/metadata and still participating in hashing.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("url", T.StringType(), True),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                    T.StructField("codec", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("phash", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)

_FEATURE_DIM = 32


def _decode_stub(payload: bytes, media_type: str, strict: bool) -> np.ndarray:
    """STUB for the real codec. Strict mode refuses (the honest boundary);
    test mode derives a deterministic pseudo-feature from a sha256 of the
    payload so plumbing is testable without codec libraries."""
    if strict:
        raise NotImplementedError(
            f"{media_type} decoding requires codec libraries not present in "
            "this environment; run with strict=False for deterministic fakes"
        )
    digest = hashlib.sha256(payload or b"").digest()
    raw = np.frombuffer((digest * ((_FEATURE_DIM * 4) // len(digest) + 1))[: _FEATURE_DIM * 4], dtype=np.uint32)
    return (raw.astype(np.float32) / np.float32(2**32)).astype(np.float32)


def extract_features(
    media: DataFrame, strict: bool = False, batch_label: str = "media_features"
) -> DataFrame:
    """media table -> (media_id, media_type, phash, feature) via mapInPandas.

    Partition-parallel, Arrow-batched; the phash is the first 8 bytes of the
    feature quantized to bits (a stand-in for a perceptual hash) so the
    exact-dup groupBy works on media exactly as on text fingerprints.
    """

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats, phashes = [], []
            for payload, mtype in zip(pdf["payload"], pdf["media_type"]):
                vec = _decode_stub(payload, mtype, strict)
                feats.append(vec.tolist())
                bits = (vec[:64] > 0.5) if len(vec) >= 64 else (vec > 0.5)
                ph = 0
                for i, b in enumerate(bits):
                    ph |= int(b) << i
                phashes.append(ph - (1 << 64) if ph >= (1 << 63) else ph)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "phash": pd.Series(phashes, dtype="int64"),
                    "feature": feats,
                }
            )

    return media.mapInPandas(_batches, FEATURE_SCHEMA)


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: the schema/partition shape of a real resize, payload
    replaced by a deterministic truncation (STUB — no image codec here)."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = pdf.copy()
            out["payload"] = [
                (p or b"")[: max(64, width * height // 64)] for p in pdf["payload"]
            ]
            out["meta"] = [
                {
                    "width": width,
                    "height": height,
                    "duration_ms": (m or {}).get("duration_ms"),
                    "codec": (m or {}).get("codec"),
                }
                for m in pdf["meta"]
            ]
            yield out

    return media.mapInPandas(_batches, MEDIA_SCHEMA)


def exact_media_dupes(features: DataFrame) -> DataFrame:
    """Exact perceptual-hash duplicate groups — the media twin of the text
    exact tier (same groupBy-fingerprint shape, G1)."""
    counts = (
        features.groupBy("media_type", "phash")
        .agg(F.count(F.lit(1)).alias("n_members"))
        .filter(F.col("n_members") > 1)
    )
    return features.join(counts, ["media_type", "phash"], "inner").select(
        "media_id", "media_type", F.col("phash").alias("group_fp")
    )


def synthetic_media(spark, n: int = 64, seed: int = 5) -> DataFrame:
    """Deterministic fake media table for tests (no external data).
    Every third row duplicates the payload of the row before it."""
    rng = np.random.default_rng(seed)
    rows = []
    payloads: list[bytes] = []
    for i in range(n):
        mtype = ("image", "audio", "video")[i % 3]
        if i % 6 == 5 and i >= 3:
            payload = payloads[i - 3]  # planted exact dup, same media_type
        else:
            payload = rng.bytes(256)
        payloads.append(payload)
        rows.append(
            (
                i,
                f"http://media.example/{mtype}/{i}",
                mtype,
                payload,
                (64 * (i % 4 + 1), 48 * (i % 4 + 1), 1000 * (i % 7), "raw"),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
