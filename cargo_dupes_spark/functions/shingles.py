"""Token k-shingling [F7] — fully JVM-side (no Python in the hot path).

The shingle set plays the role of the reference's normalized-node multiset:
the near-dup similarity (Jaccard over shingles) is the analog of the Dice
tree score (``dupes-core/src/similarity.rs:13-21``). k and the hash seed are
the "shared shingle/signature config" that recall is measured at
(BASELINE.json north_rule).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def shingles_col(norm_col: Column | str, k: int, seed: int = 42) -> Column:
    """Distinct 64-bit hashes of all k-token shingles of norm_text.

    Built entirely from expression lambdas: split → sliding windows via
    transform(sequence) → xxhash64 per window. Documents shorter than k
    tokens hash their full text as a single shingle (so tiny docs still
    participate, mirroring the reference's "whole unit is the fingerprint"
    for small trees).
    """
    c = F.col(norm_col) if isinstance(norm_col, str) else norm_col
    toks = F.split(c, " ")
    n = F.size(toks)
    windows = F.transform(
        F.sequence(F.lit(1), F.greatest(n - k + 1, F.lit(1))),
        lambda i: F.array_join(F.slice(toks, i, k), " "),
    )
    return F.array_distinct(
        F.transform(windows, lambda w: F.xxhash64(w, F.lit(seed)))
    )


def jaccard_col(a: Column | str, b: Column | str) -> Column:
    """Exact Jaccard over two distinct-shingle arrays [J4] — built-in set ops
    (array_intersect/array_union), JVM-side; the conservative-zip Dice of the
    reference (similarity.rs:26-46) becomes an exact set intersection here."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    union = F.size(F.array_union(ca, cb))
    inter = F.size(F.array_intersect(ca, cb))
    return F.when(union == 0, F.lit(0.0)).otherwise(
        inter.cast("double") / union.cast("double")
    )
