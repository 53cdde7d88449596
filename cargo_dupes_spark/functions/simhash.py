"""SimHash [F6] — 64-bit bit-vote sketch, numpy kernel inside a pandas UDF.

Second, interchangeable near-dup detector (BASELINE.json north_star:
"SimHash with Hamming-ball bucketing"). Each shingle hash votes ±1 on each
of 64 bit positions; the signature bit is the vote's sign. Near-duplicate
docs differ in few bits, so candidates are found by equality on one of
``chunks`` bit-slices (pigeonhole: Hamming distance <= d implies at least
one of d+1 chunks is identical).

Kernel layout mirrors minhash.py: one flat contiguous buffer per Arrow
batch, a per-bit loop of (shift, mask, segmented-sum) passes — no
(shingles × 64) bit matrix, no unpackbits blow-up.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .minhash import doc_aligned_chunks, flatten_shingle_rows


def simhash_from_flat(flat: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """(n_nonempty_rows,) int64 simhash: majority vote per bit position."""
    n = len(offsets)
    # row lengths from offsets (last run ends at len(flat))
    ends = np.empty(n, dtype=np.int64)
    ends[:-1] = offsets[1:]
    ends[-1] = len(flat)
    half = (ends - offsets) / 2.0
    sig = np.zeros(n, dtype=np.uint64)
    one = np.uint64(1)
    for d0, d1, fl, off in doc_aligned_chunks(flat, offsets):
        buf = np.empty_like(fl)
        for bit in range(64):
            np.right_shift(fl, np.uint64(bit), out=buf)
            np.bitwise_and(buf, one, out=buf)
            ones = np.add.reduceat(buf, off)
            sig[d0:d1] |= (ones > half[d0:d1]).astype(np.uint64) << np.uint64(bit)
    return sig.view(np.int64)


def simhash_batch(shingle_lists: pd.Series) -> pd.Series:
    """Arrow batch of shingle arrays -> int64 simhash per row (0 for empty)."""
    out = np.zeros(len(shingle_lists), dtype=np.int64)
    flat, offsets, idx = flatten_shingle_rows(shingle_lists)
    if len(idx):
        out[idx] = simhash_from_flat(flat, offsets)
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
