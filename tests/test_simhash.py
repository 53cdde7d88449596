"""SimHash kernel + Hamming bucketing properties."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from cargo_dupes_spark.functions.simhash import (
    hamming_col,
    simhash_batch,
    simhash_chunk_col,
)


def _hamming(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_identical_sets_zero_distance():
    s = pd.Series([[1, 2, 3, 4], [1, 2, 3, 4]])
    sigs = list(simhash_batch(s))
    assert sigs[0] == sigs[1]


def test_similar_sets_small_distance():
    rng = np.random.default_rng(1)
    base = rng.integers(0, 1 << 62, 500).tolist()
    near = base[:490] + rng.integers(0, 1 << 62, 10).tolist()
    far = rng.integers(0, 1 << 62, 500).tolist()
    sigs = list(simhash_batch(pd.Series([base, near, far])))
    assert _hamming(sigs[0], sigs[1]) < _hamming(sigs[0], sigs[2])
    assert _hamming(sigs[0], sigs[1]) <= 6


def test_hamming_col_matches_python(spark):
    rows = [(12345, 54321), (-1, 1), (0, 0)]
    df = spark.createDataFrame(rows, "a long, b long").select(
        hamming_col("a", "b").alias("d")
    )
    got = [r.d for r in df.collect()]
    assert got == [_hamming(a, b) for a, b in rows]


def test_chunks_cover_hamming_ball(spark):
    """Pigeonhole: any pair at distance <= 3 shares >= 1 of 4 chunk keys."""
    rng = np.random.default_rng(2)
    base = int(rng.integers(0, 1 << 63))
    rows = []
    for _ in range(50):
        flip = int(rng.integers(0, 4))
        v = base
        for bit in rng.choice(64, size=flip, replace=False):
            v ^= 1 << int(bit)
        v = v - (1 << 64) if v >= (1 << 63) else v
        rows.append((base - (1 << 64) if base >= (1 << 63) else base, v))
    df = spark.createDataFrame(rows, "a long, b long")
    matched = df.select(
        *[
            (
                simhash_chunk_col("a", i, 4) == simhash_chunk_col("b", i, 4)
            ).alias(f"c{i}")
            for i in range(4)
        ]
    )
    any_shared = matched.select(
        (F.col("c0") | F.col("c1") | F.col("c2") | F.col("c3")).alias("ok")
    )
    assert all(r.ok for r in any_shared.collect())
