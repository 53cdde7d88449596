"""SimHash [F6] — 64-bit bit-vote sketch, numpy kernel inside a pandas UDF.

Second, interchangeable near-dup detector (BASELINE.json north_star:
"SimHash with Hamming-ball bucketing"). Each shingle hash votes ±1 on each
of 64 bit positions; the signature bit is the vote's sign. Near-duplicate
docs differ in few bits, so candidates are found by equality on one of
``chunks`` bit-slices (pigeonhole: Hamming distance <= d implies at least
one of d+1 chunks is identical).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_CHUNK_SHINGLES = 1 << 18


def simhash_batch(shingle_lists: pd.Series) -> pd.Series:
    """Arrow batch of shingle arrays -> int64 simhash per row."""
    arrays = [np.asarray(v, dtype=np.int64) for v in shingle_lists]
    lengths = np.array([len(v) for v in arrays], dtype=np.int64)
    n_rows = len(arrays)
    out = np.zeros(n_rows, dtype=np.int64)

    start = 0
    while start < n_rows:
        end = start
        total = 0
        while end < n_rows and (total == 0 or total + lengths[end] <= _CHUNK_SHINGLES):
            total += int(lengths[end])
            end += 1
        rows = [i for i in range(start, end) if lengths[i] > 0]
        if rows:
            flat = np.concatenate([arrays[i] for i in rows])
            # (n_shingles, 64) bit matrix via unpackbits on the LE byte view
            bits = np.unpackbits(
                flat.astype("<u8").view(np.uint8).reshape(-1, 8),
                axis=1,
                bitorder="little",
            ).astype(np.int32)
            offsets = np.zeros(len(rows), dtype=np.int64)
            np.cumsum(lengths[rows][:-1], out=offsets[1:])
            votes = np.add.reduceat(bits, offsets, axis=0)  # ones count per bit
            half = (lengths[rows] / 2.0)[:, None]
            sig_bits = (votes > half).astype(np.uint8)  # majority vote
            packed = np.packbits(sig_bits, axis=1, bitorder="little")
            out[rows] = packed.view("<u8").reshape(-1).view(np.int64)
        start = end
    return pd.Series(out)


def simhash_udf():
    @F.pandas_udf(T.LongType())
    def _simhash(shingles: pd.Series) -> pd.Series:
        return simhash_batch(shingles)

    return _simhash


def hamming_col(a: Column | str, b: Column | str) -> Column:
    """Hamming distance between two int64 simhashes — JVM-side bit_count(xor).
    The verification predicate of the SimHash tier (analog of the Dice
    threshold check, grouper.rs:137-151)."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return F.bit_count(ca.bitwiseXOR(cb))


def simhash_chunk_col(sim_col: Column | str, chunk_idx: int, n_chunks: int) -> Column:
    """chunk_idx-th bit-slice of the 64-bit simhash (bucketing key).
    shiftrightunsigned keeps the slice sign-free."""
    c = F.col(sim_col) if isinstance(sim_col, str) else sim_col
    width = 64 // n_chunks
    mask = (1 << width) - 1
    return F.shiftrightunsigned(c, chunk_idx * width).bitwiseAND(F.lit(mask))
