"""Substring tier [X1-X3]: winnowed fingerprints + exact LCS verification.

The reference's third tier extracts sub-units (if-branches, match arms, loop
bodies; ``dupes-core/src/extractor.rs:18-133``), reindexes them context-free
(``node.rs:343-358``) and reruns exact matching. The webtext analog detects
**cross-document repeated substrings >= L chars**.

Candidate generation uses winnowing (Schleimer, Wilkerson & Aiken,
"Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD'03 — the
MOSS scheme): hash every k-gram, keep the minimum hash of every w-length
window. GUARANTEE: any common substring of length >= k + w - 1 shares at
least one selected fingerprint, so with k + w - 1 <= min_substring_len the
candidate stage has perfect recall. Selected fingerprints are position-
independent (the "reindex from offset 0" analog: a k-gram hashes the same
wherever it occurs).

Verification computes the exact longest-common-substring length per pair
(binary search over length with vectorized uint64 rolling hashes + literal
string confirmation on hash hits — no false positives).

Scale shape: fingerprints explode to ~n_chars/w rows per doc (≈2% of
corpus chars at w=49), shuffle once on the 8-byte fingerprint, pair within
buckets (same cap/accounting as LSH), verify only candidates.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import PipelineConfig

_B = np.uint64(0x9E3779B97F4A7C15)  # odd => invertible mod 2^64
_B_INV = np.uint64(pow(int(_B), -1, 1 << 64))


def _kgram_hashes(data: np.ndarray, k: int) -> np.ndarray:
    """uint64 rolling hashes of all k-grams of a uint8 array (vectorized).

    H[i] = sum_j data[i+j] * B^(k-1-j)  (mod 2^64), computed from prefix
    sums of data[j] * B^(-j) — B odd makes B^-1 exist mod 2^64.
    """
    n = len(data)
    if n < k:
        return np.empty(0, dtype=np.uint64)
    with np.errstate(over="ignore"):
        idx = np.arange(n, dtype=np.uint64)
        inv_pows = np.empty(n, dtype=np.uint64)
        inv_pows[0] = np.uint64(1)
        np.cumprod(np.full(n - 1, _B_INV, dtype=np.uint64), out=inv_pows[1:])
        pows = np.empty(n, dtype=np.uint64)
        pows[0] = np.uint64(1)
        np.cumprod(np.full(n - 1, _B, dtype=np.uint64), out=pows[1:])
        weighted = data.astype(np.uint64) * inv_pows
        prefix = np.zeros(n + 1, dtype=np.uint64)
        np.cumsum(weighted, out=prefix[1:])
        window = prefix[k:] - prefix[:-k]  # wraps correctly mod 2^64
        h = window * pows[: n - k + 1] * pows[k - 1]
    return h


def winnow(text: str, k: int, w: int) -> np.ndarray:
    """Distinct selected fingerprints of one document (MOSS winnowing)."""
    data = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    h = _kgram_hashes(data, k)
    if len(h) == 0:
        return np.empty(0, dtype=np.int64)
    if len(h) <= w:
        return np.unique(h.min(keepdims=True)).view(np.int64)
    windows = np.lib.stride_tricks.sliding_window_view(h, w)
    mins = windows.min(axis=1)
    return np.unique(mins).view(np.int64)


def winnow_udf(k: int, w: int):
    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _winnow(texts: pd.Series) -> pd.Series:
        return pd.Series([winnow(t or "", k, w) for t in texts])

    return _winnow


def substring_candidates(
    fingerprints: DataFrame, cfg: PipelineConfig
) -> tuple[DataFrame, DataFrame]:
    """docs -> (candidate pairs tier='substring', dropped mega-buckets).

    Docs shorter than min_substring_len can't contain a qualifying repeat
    and are gated out before the explode (the min_sub_nodes gate, X2).
    """
    from .lsh import pairs_from_buckets

    eligible = fingerprints.filter(
        F.length("norm_text") >= cfg.min_substring_len
    )
    fps = eligible.select(
        "url",
        "lang",
        F.explode(
            winnow_udf(cfg.winnow_kgram, cfg.winnow_window)(F.col("norm_text"))
        ).alias("fph"),
    )
    bucketed = fps.select(
        "url",
        F.lit(0).alias("band_id"),
        F.xxhash64("lang", "fph").alias("band_key"),
    )
    return pairs_from_buckets(bucketed, cfg, "substring", urls=eligible)


def _common_substring_len_at(
    a: np.ndarray, b: np.ndarray, length: int, a_str: bytes, b_str: bytes
) -> bool:
    """Is there a common substring of exactly `length`? Hash-bucket then
    literal confirmation (no hash-collision false positives)."""
    ha = _kgram_hashes(a, length)
    hb = _kgram_hashes(b, length)
    if len(ha) == 0 or len(hb) == 0:
        return False
    table: dict[int, list[int]] = {}
    for i, h in enumerate(ha):
        table.setdefault(int(h), []).append(i)
    for j, h in enumerate(hb):
        for i in table.get(int(h), ()):
            if a_str[i : i + length] == b_str[j : j + length]:
                return True
    return False


def longest_common_substring_len(sa: str, sb: str, min_len: int) -> int:
    """Exact LCS length if >= min_len else 0 — binary search over length."""
    a_str = sa.encode("utf-8")
    b_str = sb.encode("utf-8")
    a = np.frombuffer(a_str, dtype=np.uint8)
    b = np.frombuffer(b_str, dtype=np.uint8)
    lo, hi = min_len, min(len(a), len(b))
    if hi < lo or not _common_substring_len_at(a, b, lo, a_str, b_str):
        return 0
    # invariant: common substring of length lo exists
    while lo < hi:
        mid = (lo + hi + 1) // 2
        if _common_substring_len_at(a, b, mid, a_str, b_str):
            lo = mid
        else:
            hi = mid - 1
    return lo


def verify_substring_pairs(
    pairs: DataFrame, fingerprints: DataFrame, cfg: PipelineConfig
) -> DataFrame:
    """Candidate pairs -> verified substring edges.

    similarity := lcs_len / min(len_a, len_b) — 1.0 means full containment
    (doc B inside doc A), the shape of the reference's sub-unit duplicates.
    """
    texts_a = fingerprints.select(
        F.col("url").alias("url_a"), F.col("norm_text").alias("text_a")
    )
    texts_b = fingerprints.select(
        F.col("url").alias("url_b"), F.col("norm_text").alias("text_b")
    )
    joined = pairs.join(texts_a, "url_a", "inner").join(texts_b, "url_b", "inner")
    min_len = cfg.min_substring_len

    @F.pandas_udf(T.DoubleType())
    def _lcs_sim(ta: pd.Series, tb: pd.Series) -> pd.Series:
        out = []
        for sa, sb in zip(ta, tb):
            sa = sa or ""
            sb = sb or ""
            lcs = longest_common_substring_len(sa, sb, min_len)
            denom = min(len(sa.encode()), len(sb.encode()))
            out.append(lcs / denom if lcs and denom else 0.0)
        return pd.Series(out)

    return (
        joined.withColumn("similarity", _lcs_sim("text_a", "text_b"))
        .filter(F.col("similarity") > 0.0)
        .select("url_a", "url_b", "tier", "similarity")
    )
