"""Batched MinHash signatures [F5] — numpy kernel inside a pandas UDF.

No reference analog (the reference compares trees pairwise within size
buckets, ``dupes-core/src/grouper.rs:115-151``); MinHash+LSH is the
scale-out replacement demanded by BASELINE.json north_star: "batched MinHash
signatures with LSH band hashing ... vectorized pandas/Arrow UDFs (no
per-row Python)".

Kernel design: one flat uint64 array per Arrow batch (all rows' shingles
concatenated), permutation family h_i(s) = rotl((s ^ b_i) * a_i, r_i) over
the full 2^64 ring (numpy uint64 wraps mod 2^64), min-reduced per row with
``np.minimum.reduceat`` — no Python loop over rows or permutations beyond
the num_perm axis.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

_MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def perm_params(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic permutation family: odd multipliers + xor masks."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 1 << 63, size=num_perm, dtype=np.uint64) * np.uint64(2) + np.uint64(1)
    b = rng.integers(0, 1 << 63, size=num_perm, dtype=np.uint64)
    return a, b


# cap on the (shingles x perms) work matrix per chunk: 2^18 shingles x 128
# perms x 8 B = 256 MiB worst case; rows are grouped so a chunk never splits
# a document's shingle run (reduceat stays trivial).
_CHUNK_SHINGLES = 1 << 18


def minhash_batch(
    shingle_lists: pd.Series, num_perm: int, seed: int
) -> pd.Series:
    """One Arrow batch of shingle arrays -> signatures (list of int64).

    Memory-bounded: rows are processed in groups of <= _CHUNK_SHINGLES total
    shingles so the (n_shingles, num_perm) hash matrix stays executor-safe
    regardless of Arrow batch sizing.
    """
    a, b = perm_params(num_perm, seed)
    arrays = [np.asarray(v, dtype=np.int64) for v in shingle_lists]
    lengths = np.array([len(v) for v in arrays], dtype=np.int64)
    n_rows = len(arrays)
    out = np.full((n_rows, num_perm), np.iinfo(np.int64).max, dtype=np.int64)

    start = 0
    while start < n_rows:
        end = start
        total = 0
        while end < n_rows and (total == 0 or total + lengths[end] <= _CHUNK_SHINGLES):
            total += int(lengths[end])
            end += 1
        rows = [i for i in range(start, end) if lengths[i] > 0]
        if rows:
            flat = np.concatenate([arrays[i] for i in rows]).astype(np.uint64)
            offsets = np.zeros(len(rows), dtype=np.int64)
            np.cumsum(lengths[rows][:-1], out=offsets[1:])
            with np.errstate(over="ignore"):
                hashed = (flat[:, None] ^ b[None, :]) * a[None, :]
            # flip MSB: int64 view then orders identically to uint64
            hashed ^= np.uint64(1) << np.uint64(63)
            out[rows] = np.minimum.reduceat(hashed.view(np.int64), offsets, axis=0)
        start = end
    return pd.Series(list(out))


def minhash_udf(num_perm: int, seed: int):
    """pandas UDF: ARRAY<BIGINT> shingles -> ARRAY<BIGINT> signature."""

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _minhash(shingles: pd.Series) -> pd.Series:
        return minhash_batch(shingles, num_perm, seed)

    return _minhash
