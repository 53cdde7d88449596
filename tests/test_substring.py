"""Winnowing + LCS verification properties."""

from __future__ import annotations

import random

import numpy as np
import pytest

from cargo_dupes_spark.config import PipelineConfig
from cargo_dupes_spark.operators.substring import (
    _kgram_hashes,
    longest_common_substring_len,
    winnow,
)

CFG = PipelineConfig()


def _lcs_dp(a: str, b: str) -> int:
    """O(nm) DP oracle for small strings."""
    best = 0
    prev = [0] * (len(b) + 1)
    for i in range(1, len(a) + 1):
        cur = [0] * (len(b) + 1)
        for j in range(1, len(b) + 1):
            if a[i - 1] == b[j - 1]:
                cur[j] = prev[j - 1] + 1
                best = max(best, cur[j])
        prev = cur
    return best


def test_kgram_hashes_match_direct():
    data = np.frombuffer(b"abcabcabd", dtype=np.uint8)
    h = _kgram_hashes(data, 3)
    assert len(h) == 7
    assert h[0] == h[3]  # "abc" == "abc"
    assert h[0] != h[6]  # "abc" != "abd"


def test_winnow_guarantee():
    """Any shared substring >= k + w - 1 chars must share a selected
    fingerprint (Schleimer et al. guarantee)."""
    rng = random.Random(3)
    alphabet = "abcdefgh "
    k, w = CFG.winnow_kgram, CFG.winnow_window
    need = k + w - 1
    for _ in range(10):
        shared = "".join(rng.choice(alphabet) for _ in range(need))
        a = "".join(rng.choice(alphabet) for _ in range(200)) + shared
        b = shared + "".join(rng.choice(alphabet) for _ in range(200))
        fa = set(winnow(a, k, w).tolist())
        fb = set(winnow(b, k, w).tolist())
        assert fa & fb, "winnowing guarantee violated"


def test_lcs_exact_vs_dp():
    rng = random.Random(5)
    alphabet = "abc"
    for _ in range(20):
        a = "".join(rng.choice(alphabet) for _ in range(80))
        b = "".join(rng.choice(alphabet) for _ in range(80))
        want = _lcs_dp(a, b)
        got = longest_common_substring_len(a, b, min_len=1)
        assert got == want


def test_lcs_threshold_gate():
    a = "x" * 100 + "COMMONSEGMENT" + "y" * 100
    b = "p" * 50 + "COMMONSEGMENT" + "q" * 50
    assert longest_common_substring_len(a, b, min_len=13) == 13
    assert longest_common_substring_len(a, b, min_len=14) == 0


def test_containment_similarity(spark, fixture_corpus):
    """Planted substring pairs verify with similarity == 1.0 end-to-end."""
    from pyspark.sql import functions as F

    from cargo_dupes_spark.operators.exact import prepare
    from cargo_dupes_spark.operators.substring import (
        substring_candidates,
        verify_substring_pairs,
    )

    df, corpus = fixture_corpus
    cfg = CFG
    fps = prepare(df, cfg)
    pairs, dropped = substring_candidates(fps, cfg)
    edges = verify_substring_pairs(pairs, fps, cfg)
    found = {
        (min(r.url_a, r.url_b), max(r.url_a, r.url_b)): r.similarity
        for r in edges.collect()
    }
    for a, b in corpus.substring_pairs:
        key = (min(a, b), max(a, b))
        assert key in found, f"planted substring pair missed: {key}"
