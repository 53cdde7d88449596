"""MinHash kernel + LSH banding properties."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from cargo_dupes_spark.config import PipelineConfig
from cargo_dupes_spark.functions.minhash import minhash_batch, perm_params


def _jaccard(a: set, b: set) -> float:
    return len(a & b) / len(a | b)


def test_deterministic():
    s = pd.Series([[1, 2, 3], [4, 5]])
    a = minhash_batch(s, 32, seed=1)
    b = minhash_batch(s, 32, seed=1)
    assert all(list(x) == list(y) for x, y in zip(a, b))
    c = minhash_batch(s, 32, seed=2)
    assert any(list(x) != list(y) for x, y in zip(a, c))


def test_identical_sets_identical_signatures():
    s = pd.Series([[7, 8, 9], [7, 8, 9]])
    sigs = minhash_batch(s, 64, seed=1)
    assert list(sigs[0]) == list(sigs[1])


def test_agreement_estimates_jaccard():
    """Signature agreement rate ≈ Jaccard (the MinHash property), checked
    with enough permutations that a 3-sigma band is tight."""
    rng = np.random.default_rng(0)
    a = set(rng.integers(0, 1 << 62, 300).tolist())
    b = set(list(a)[:150]) | set(rng.integers(0, 1 << 62, 150).tolist())
    j = _jaccard(a, b)
    num_perm = 2048
    sigs = minhash_batch(pd.Series([list(a), list(b)]), num_perm, seed=3)
    agree = np.mean(np.array(sigs[0]) == np.array(sigs[1]))
    sigma = (j * (1 - j) / num_perm) ** 0.5
    assert abs(agree - j) < 5 * sigma


def test_empty_and_chunk_boundaries():
    # empty arrays get the max sentinel; chunking never mixes rows
    big = list(range(100_000))
    s = pd.Series([[], big, [1], big])
    sigs = minhash_batch(s, 16, seed=1)
    assert list(sigs[0]) == [np.iinfo(np.int64).max] * 16
    assert list(sigs[1]) == list(sigs[3])


def test_lsh_candidate_probability():
    """With b=32,r=4 the s-curve guarantees candidates at J>=0.7 with
    P >= 0.999 — the recall budget of the near tier (SURVEY §7.4 risk 2)."""
    cfg = PipelineConfig()
    b, r = cfg.lsh_bands, cfg.lsh_rows
    for j, floor in [(0.7, 0.999), (0.8, 0.999999)]:
        p = 1 - (1 - j**r) ** b
        assert p >= floor
