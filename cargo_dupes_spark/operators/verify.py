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

    At scale both joins shuffle on url (string key); the signatures side is
    the big one, so pairs are joined INTO it rather than collected. AQE
    handles residual skew (hot urls appear in many pairs).
    """
    sig_a = signatures.select(
        F.col("url").alias("url_a"),
        F.col("shingles").alias("shingles_a"),
        F.col("simhash").alias("simhash_a"),
    )
    sig_b = signatures.select(
        F.col("url").alias("url_b"),
        F.col("shingles").alias("shingles_b"),
        F.col("simhash").alias("simhash_b"),
    )
    joined = pairs.join(sig_a, "url_a", "inner").join(sig_b, "url_b", "inner")

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
