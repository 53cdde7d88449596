"""Multimodal columns: opaque binary payloads + typed metadata.

Training-data pipelines carry image/audio/video as `binary` columns with a
metadata struct. The Spark-side plumbing (schema, partitioning, Arrow batch
shape, UDF signatures) is real and tested, and so are two codecs that need
NOTHING beyond numpy + the stdlib:

  * image/ppm  — binary P6 PPM parser -> (h, w, 3) uint8; features are a
    16x16 block-mean profile and the phash is a REAL 64-bit average hash
    (8x8 grayscale > mean — robust to uniform brightness shifts, tested).
  * audio/wav  — stdlib ``wave`` PCM decode -> int16 samples; features are
    32 windowed RMS energies and the phash is the 64-bit energy-vs-mean
    bit profile.

Codecs that genuinely require external libraries (video containers, jpeg,
mp3: ffmpeg/Pillow are not in this environment) remain a DECLARED BOUNDARY:
strict mode raises NotImplementedError; test mode derives a deterministic
sha256 pseudo-feature so downstream operators (dedup on perceptual hashes,
feature joins) stay exercised end-to-end.

The reference analog is the `MacroCall{name}` opaque node
(``dupes-rust/src/normalizer/helpers.rs:15-31``): an object we can't look
inside, carried with its name/metadata and still participating in hashing.
"""

from __future__ import annotations

import hashlib
import io
import wave
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


# ---------------------------------------------------------------------------
# real codecs (numpy + stdlib only)
# ---------------------------------------------------------------------------
def encode_ppm(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> binary P6 PPM bytes."""
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + img.astype(np.uint8).tobytes()


def _ppm_token(payload: bytes, pos: int) -> tuple[bytes, int]:
    """Next header token, skipping whitespace AND '#' comment lines (netpbm
    spec allows comments anywhere whitespace can appear in the header)."""
    while pos < len(payload):
        c = payload[pos : pos + 1]
        if c.isspace():
            pos += 1
        elif c == b"#":
            nl = payload.find(b"\n", pos)
            if nl == -1:
                raise ValueError("unterminated PPM header comment")
            pos = nl + 1
        else:
            break
    start = pos
    while (
        pos < len(payload)
        and not payload[pos : pos + 1].isspace()
        and payload[pos : pos + 1] != b"#"
    ):
        pos += 1
    if start == pos:
        raise ValueError("truncated PPM header")
    return payload[start:pos], pos


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary P6 PPM -> (h, w, 3) uint8. Raises ValueError on ANY malformed
    input — comments handled, CRLF after maxval handled, truncated pixel
    data detected — so a foreign-but-valid file decodes and a broken one is
    counted by the caller's error accounting, never silently mis-hashed."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    pos = 2
    fields: list[bytes] = []
    while len(fields) < 3:
        tok, pos = _ppm_token(payload, pos)
        fields.append(tok)
    try:
        w, h, maxval = (int(f) for f in fields)
    except ValueError as e:
        raise ValueError(f"malformed PPM header fields {fields!r}") from e
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    if w <= 0 or h <= 0:
        raise ValueError(f"invalid PPM dimensions {w}x{h}")
    # exactly ONE whitespace char after maxval per spec (pixel bytes may
    # legally look like whitespace, so no loop) — but tolerate a CRLF pair,
    # the one sequence real foreign writers emit
    if pos >= len(payload) or not payload[pos : pos + 1].isspace():
        raise ValueError("expected whitespace after PPM maxval")
    pos += 2 if payload[pos : pos + 2] == b"\r\n" else 1
    if len(payload) - pos < w * h * 3:
        raise ValueError("truncated PPM pixel data")
    data = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
    return data.reshape(h, w, 3)


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (mono int16 samples, sample_rate) via stdlib wave."""
    with wave.open(io.BytesIO(payload), "rb") as f:
        n = f.getnframes()
        raw = f.readframes(n)
        ch = f.getnchannels()
        if f.getsampwidth() != 2:
            raise ValueError("only 16-bit PCM WAV supported")
        x = np.frombuffer(raw, dtype=np.int16)
        if ch > 1:
            x = x.reshape(-1, ch).mean(axis=1).astype(np.int16)
        return x, f.getframerate()


def _block_mean(gray: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Crop-to-multiple block-mean downsample (the no-deps resize kernel)."""
    h, w = gray.shape
    bh, bw = max(h // out_h, 1), max(w // out_w, 1)
    cropped = gray[: bh * out_h, : bw * out_w]
    if cropped.shape != (bh * out_h, bw * out_w):  # tiny images: pad by edge
        cropped = np.pad(
            gray,
            ((0, max(bh * out_h - h, 0)), (0, max(bw * out_w - w, 0))),
            mode="edge",
        )[: bh * out_h, : bw * out_w]
    return cropped.reshape(out_h, bh, out_w, bw).mean(axis=(1, 3))


def _bits_to_i64(bits: np.ndarray) -> int:
    ph = 0
    for i, b in enumerate(bits.ravel()[:64]):
        ph |= int(bool(b)) << i
    return ph - (1 << 64) if ph >= (1 << 63) else ph


def _image_features(img: np.ndarray) -> tuple[int, np.ndarray]:
    """Real average-hash (8x8 gray > mean) + 32-dim block-mean profile."""
    gray = img.mean(axis=2)
    g8 = _block_mean(gray, 8, 8)
    phash = _bits_to_i64(g8 > g8.mean())
    g16 = _block_mean(gray, 16, 16)
    feat = np.concatenate([g16.mean(axis=1), g16.mean(axis=0)]) / 255.0
    return phash, feat.astype(np.float32)


def _audio_features(x: np.ndarray) -> tuple[int, np.ndarray]:
    """64-bit windowed-energy bit profile + 32-window RMS feature."""
    if len(x) == 0:
        return 0, np.zeros(_FEATURE_DIM, dtype=np.float32)
    xf = x.astype(np.float64)
    win = np.array_split(xf, 64)
    e = np.array([float(np.mean(w * w)) if len(w) else 0.0 for w in win])
    phash = _bits_to_i64(e > e.mean())
    win32 = np.array_split(xf, _FEATURE_DIM)
    rms = np.array([np.sqrt(np.mean(w * w)) if len(w) else 0.0 for w in win32])
    peak = rms.max() or 1.0
    return phash, (rms / peak).astype(np.float32)


def _decode_stub(payload: bytes, media_type: str, strict: bool) -> np.ndarray:
    """STUB for codecs that need external libraries (the declared
    boundary). Strict mode refuses; test mode derives a deterministic
    pseudo-feature from a sha256 of the payload so plumbing stays testable."""
    if strict:
        raise NotImplementedError(
            f"{media_type} decoding requires codec libraries not present in "
            "this environment; run with strict=False for deterministic fakes"
        )
    # counter-mode sha256: every one of the _FEATURE_DIM*4 bytes is
    # independent (the previous digest-tiling repeated the 32-byte digest 4x,
    # collapsing the derived phash to 8 effective bits — two of 32 random
    # payloads collided at test scale)
    need = _FEATURE_DIM * 4
    blocks = []
    counter = 0
    while sum(len(b) for b in blocks) < need:
        blocks.append(
            hashlib.sha256(
                (payload or b"") + counter.to_bytes(4, "big")
            ).digest()
        )
        counter += 1
    raw = np.frombuffer(b"".join(blocks)[:need], dtype=np.uint32)
    return (raw.astype(np.float32) / np.float32(2**32)).astype(np.float32)


def media_features(
    payload: bytes, media_type: str, codec: str | None, strict: bool
) -> tuple[int, np.ndarray]:
    """(phash, feature) for one payload: REAL decode for image/ppm and
    audio/wav; declared-boundary stub otherwise."""
    if media_type == "image" and codec == "ppm":
        return _image_features(decode_ppm(payload))
    if media_type == "audio" and codec == "wav":
        return _audio_features(decode_wav(payload)[0])
    vec = _decode_stub(payload, media_type, strict)
    bits = (vec[:64] > 0.5) if len(vec) >= 64 else (vec > 0.5)
    return _bits_to_i64(np.asarray(bits)), vec


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
            codecs = [
                (m or {}).get("codec") if not isinstance(m, tuple) else m[3]
                for m in pdf["meta"]
            ]
            for payload, mtype, codec in zip(
                pdf["payload"], pdf["media_type"], codecs
            ):
                ph, vec = media_features(payload, mtype, codec, strict)
                feats.append(vec.tolist())
                phashes.append(ph)
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
    """Resize: REAL block-mean resample + P6 re-encode for image/ppm rows;
    other codecs keep the schema/partition plumbing with a deterministic
    truncation (declared boundary — no jpeg/video codec here)."""

    def _resize_one(payload: bytes | None, meta, mtype: str) -> bytes:
        codec = (
            (meta or {}).get("codec")
            if not isinstance(meta, tuple)
            else meta[3]
        )
        if payload and mtype == "image" and codec == "ppm":
            img = decode_ppm(payload)
            resized = np.stack(
                [
                    _block_mean(img[:, :, c].astype(np.float64), height, width)
                    for c in range(3)
                ],
                axis=2,
            )
            return encode_ppm(np.clip(resized, 0, 255).astype(np.uint8))
        return (payload or b"")[: max(64, width * height // 64)]

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = pdf.copy()
            out["payload"] = [
                _resize_one(p, m, t)
                for p, m, t in zip(pdf["payload"], pdf["meta"], pdf["media_type"])
            ]
            out["meta"] = [
                {
                    "width": width,
                    "height": height,
                    "duration_ms": (
                        (m or {}).get("duration_ms")
                        if not isinstance(m, tuple)
                        else m[2]
                    ),
                    "codec": (
                        (m or {}).get("codec")
                        if not isinstance(m, tuple)
                        else m[3]
                    ),
                }
                for m in pdf["meta"]
            ]
            yield out

    return media.mapInPandas(_batches, MEDIA_SCHEMA)


def near_media_dupes(
    features: DataFrame,
    hamming_threshold: int = 3,
    n_chunks: int = 4,
    max_bucket_size: int = 2000,
    salt_buckets: int = 16,
) -> DataFrame:
    """NEAR-duplicate media pairs: Hamming-ball bucketing over the 64-bit
    perceptual hash — the media twin of the text SimHash tier (VERDICT r4
    #3; reference analog: the near tier over opaque-object fingerprints,
    ``dupes-core/src/grouper.rs:95-220``). A brightness-shifted or
    re-encoded copy whose aHash differs in <= hamming_threshold bits is
    found; exact equality (exact_media_dupes) misses it.

    Same machinery as the text tier end-to-end: pigeonhole chunk keys
    (hamming <= d implies >= 1 of d+1 bit-slices equal,
    functions/simhash.py) with media_type folded into the band key so
    cross-type pairs never co-locate, candidates through the
    capped/salted/accounted ``nid_pairs_from_buckets``, then an exact
    bit_count(xor) verify. Scale shape: the candidate shuffle carries
    (8-byte media_id, 8-byte band_key) only; the verify joins an 8-byte
    phash — nothing payload-sized moves.

    Returns (id_a < id_b, media_type, hamming <= hamming_threshold)."""
    from ..config import PipelineConfig
    from ..functions.simhash import simhash_chunk_col
    from .lsh import nid_pairs_from_buckets

    if n_chunks < hamming_threshold + 1:
        raise ValueError("pigeonhole requires n_chunks >= hamming_threshold+1")
    cfg = PipelineConfig(
        max_bucket_size=max_bucket_size, salt_buckets=salt_buckets
    )
    keys = F.array(
        *[
            F.xxhash64(
                F.col("media_type"),
                F.lit(i),
                simhash_chunk_col("phash", i, n_chunks),
            )
            for i in range(n_chunks)
        ]
    )
    bucketed = features.select(
        F.col("media_id").alias("nid"), F.posexplode(keys).alias("band_id", "band_key")
    )
    nid_pairs, _ = nid_pairs_from_buckets(bucketed, cfg, collect_flagged=False)
    a = features.select(
        F.col("media_id").alias("nid_a"),
        F.col("media_type").alias("type_a"),
        F.col("phash").alias("ph_a"),
    )
    b = features.select(
        F.col("media_id").alias("nid_b"),
        F.col("media_type").alias("type_b"),
        F.col("phash").alias("ph_b"),
    )
    return (
        nid_pairs.join(a, "nid_a")
        .join(b, "nid_b")
        # band keys fold the type in, so cross-type pairs can only arise
        # from a 2^-64 key collision — re-check anyway (never silent)
        .filter(F.col("type_a") == F.col("type_b"))
        .select(
            F.col("nid_a").alias("id_a"),
            F.col("nid_b").alias("id_b"),
            F.col("type_a").alias("media_type"),
            F.bit_count(F.col("ph_a").bitwiseXOR(F.col("ph_b")))
            .cast("long")
            .alias("hamming"),
        )
        .filter(F.col("hamming") <= hamming_threshold)
    )


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


def synthetic_wav(rng: np.random.Generator, n_samples: int = 4000) -> bytes:
    """Deterministic 16-bit mono PCM WAV (stdlib wave encoder)."""
    t = np.arange(n_samples)
    freq = float(rng.uniform(0.01, 0.2))
    x = (10000 * np.sin(freq * t) + rng.normal(0, 500, n_samples)).astype(
        np.int16
    )
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(8000)
        f.writeframes(x.tobytes())
    return buf.getvalue()


NEAR_MEDIA_OFFSET = 10_000


def swap_extreme_blocks(img: np.ndarray) -> np.ndarray:
    """Copy of a (24, 32, 3) image with the pixel blocks of the 8x8 aHash
    grid's max-mean and min-mean cells SWAPPED — a perturbation whose aHash
    Hamming distance is EXACTLY 2 by arithmetic:

      * swapping two equal-sized blocks permutes the 64 block means, so the
        global mean (their average) is unchanged;
      * the max-mean block's position now holds the min mean (< global mean
        -> bit flips 1->0) and vice versa (bit flips 0->1);
      * every other block is untouched and compares against the same global
        mean -> no other bit can change.

    Requires a non-constant image (strict max > mean > min — asserted)."""
    h, w = img.shape[:2]
    if h % 8 or w % 8:
        raise ValueError("image dims must be multiples of 8 for exact blocks")
    bh, bw = h // 8, w // 8
    gray = img.mean(axis=2)
    g8 = _block_mean(gray, 8, 8)
    m = g8.mean()
    if not (g8.max() > m > g8.min()):
        raise ValueError("degenerate image: block means not strictly split")
    ru, cu = np.unravel_index(int(g8.argmax()), (8, 8))
    rv, cv = np.unravel_index(int(g8.argmin()), (8, 8))
    out = img.copy()
    u = (slice(ru * bh, (ru + 1) * bh), slice(cu * bw, (cu + 1) * bw))
    v = (slice(rv * bh, (rv + 1) * bh), slice(cv * bw, (cv + 1) * bw))
    out[u], out[v] = img[v].copy(), img[u].copy()
    return out


def _wav_from_samples(x: np.ndarray, rate: int = 8000) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(x.astype(np.int16).tobytes())
    return buf.getvalue()


def synthetic_media_near(spark, n: int = 96, seed: int = 11) -> DataFrame:
    """Media table with planted NEAR-duplicates whose aHash Hamming
    distances are PROVABLE arithmetic (so the near tier is SQL-oracle
    checkable without decoding anything, the same discipline as
    ``synthetic_media``'s exact planting):

      * image rows (i%3==0), i%6==0: uniform brightness shift +10 (pixels
        kept < 200 so nothing clips) — every block mean AND the global mean
        shift by exactly +10, all 64 comparisons unchanged -> hamming 0;
      * image rows, i%6==3: ``swap_extreme_blocks`` -> hamming EXACTLY 2;
      * audio rows (i%3==1), i%6==1: samples doubled (|x| < 16384 so the
        int16 doubling is exact) — window energies scale by exactly 4, the
        energy-vs-mean bit profile is scale-invariant -> hamming 0;
      * video rows (i%3==2): no planted copies (random payloads).

    Copies live at media_id + NEAR_MEDIA_OFFSET. No organic pair within
    hamming<=3 exists at this seed (brute-force-pinned in
    tests/test_multimodal.py — aHash bits of random noise are ~fair coins,
    so collisions within distance 3 have probability ~1e-10 per pair)."""
    rng = np.random.default_rng(seed)
    rows: list[tuple] = []

    def add(mid: int, mtype: str, payload: bytes, codec: str, w=0, h=0, dur=0):
        rows.append(
            (
                mid,
                f"http://media.example/{mtype}/{mid}",
                mtype,
                payload,
                (w, h, dur, codec),
            )
        )

    for i in range(n):
        mtype = ("image", "audio", "video")[i % 3]
        if mtype == "image":
            w, h = 32, 24
            img = rng.integers(0, 200, size=(h, w, 3), dtype=np.uint8)
            add(i, "image", encode_ppm(img), "ppm", w, h)
            if i % 6 == 0:
                add(
                    i + NEAR_MEDIA_OFFSET, "image",
                    encode_ppm(img + np.uint8(10)), "ppm", w, h,
                )
            elif i % 6 == 3:
                add(
                    i + NEAR_MEDIA_OFFSET, "image",
                    encode_ppm(swap_extreme_blocks(img)), "ppm", w, h,
                )
        elif mtype == "audio":
            t = np.arange(4000)
            freq = float(rng.uniform(0.01, 0.2))
            x = (8000 * np.sin(freq * t) + rng.normal(0, 400, len(t))).astype(
                np.int16
            )
            assert int(np.abs(x).max()) < 16384  # exact int16 doubling
            add(i, "audio", _wav_from_samples(x), "wav", dur=500)
            if i % 6 == 1:
                add(
                    i + NEAR_MEDIA_OFFSET, "audio",
                    _wav_from_samples(x * 2), "wav", dur=500,
                )
        else:
            add(i, "video", rng.bytes(256), "raw", dur=1000 * (i % 7))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def synthetic_media(spark, n: int = 64, seed: int = 5) -> DataFrame:
    """Deterministic media table for tests (no external data): REAL P6 PPM
    images and 16-bit WAV audio, plus raw-byte 'video' rows exercising the
    declared-boundary stub. Every third row duplicates the payload of the
    row before it (planted exact dups, same media_type)."""
    rng = np.random.default_rng(seed)
    rows = []
    payloads: list[bytes] = []
    for i in range(n):
        mtype = ("image", "audio", "video")[i % 3]
        if i % 6 == 5 and i >= 3:
            payload = payloads[i - 3]  # planted exact dup, same media_type
        elif mtype == "image":
            w, h = 32 + 8 * (i % 3), 24 + 8 * (i % 2)
            payload = encode_ppm(
                rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            )
        elif mtype == "audio":
            payload = synthetic_wav(rng)
        else:
            payload = rng.bytes(256)
        payloads.append(payload)
        codec = {"image": "ppm", "audio": "wav", "video": "raw"}[mtype]
        rows.append(
            (
                i,
                f"http://media.example/{mtype}/{i}",
                mtype,
                payload,
                (64 * (i % 4 + 1), 48 * (i % 4 + 1), 1000 * (i % 7), codec),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
