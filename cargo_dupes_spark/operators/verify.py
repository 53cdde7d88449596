"""Candidate verification [J4/J5] — exact Jaccard on shingle sets.

The reference verifies candidates with an exact Dice tree-compare
(``dupes-core/src/similarity.rs:13-46``); here candidates are verified with
EXACT Jaccard over distinct shingle arrays (not the MinHash estimate — the
recall gate requires the verify step to never drop a true pair,
SURVEY §7.4 risk 2). Dice and Jaccard are monotone-related (D = 2J/(1+J)).

Implementation is fully JVM-side: two hash joins pulling each side's
shingles, then array_intersect/array_union sizes. SimHash-tier candidates
get a cheap bit_count(xor) Hamming prefilter before the Jaccard check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import PipelineConfig
from ..functions.shingles import jaccard_col
from ..functions.simhash import hamming_col


def verify_pairs(
    pairs: DataFrame, signatures: DataFrame, cfg: PipelineConfig
) -> DataFrame:
    """(url_a, url_b, tier) -> verified edges with exact similarity.

    Both joins key on nid = xxhash64(url) — the same 8-byte surrogate
    discipline as the candidate stage (operators/lsh.py): the signatures
    side is the big one and shuffles/probes on a BIGINT instead of a url
    string. nid collisions (two urls hashing alike would attach a foreign
    shingle row) are neutralized by a post-join url equality filter — the
    true row always survives it. Pairs are joined INTO the signatures side
    rather than collected; AQE handles residual skew (hot urls appear in
    many pairs).
    """
    sig_a = signatures.select(
        F.xxhash64("url").alias("nid_a"),
        F.col("url").alias("_sig_url_a"),
        F.col("shingles").alias("shingles_a"),
        F.col("simhash").alias("simhash_a"),
    )
    sig_b = signatures.select(
        F.xxhash64("url").alias("nid_b"),
        F.col("url").alias("_sig_url_b"),
        F.col("shingles").alias("shingles_b"),
        F.col("simhash").alias("simhash_b"),
    )
    joined = (
        pairs.withColumn("nid_a", F.xxhash64("url_a"))
        .withColumn("nid_b", F.xxhash64("url_b"))
        .join(sig_a, "nid_a", "inner")
        .join(sig_b, "nid_b", "inner")
        .filter(
            (F.col("url_a") == F.col("_sig_url_a"))
            & (F.col("url_b") == F.col("_sig_url_b"))
        )
    )

    # Hamming prefilter only constrains simhash-tier candidates
    joined = joined.filter(
        (F.col("tier") != F.lit("simhash"))
        | (hamming_col("simhash_a", "simhash_b") <= cfg.hamming_threshold)
    )

    return (
        joined.withColumn(
            "similarity", jaccard_col("shingles_a", "shingles_b")
        )
        .filter(F.col("similarity") >= cfg.jaccard_threshold)
        .select("url_a", "url_b", "tier", "similarity")
    )
