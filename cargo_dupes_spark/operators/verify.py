"""Candidate verification [J4/J5] — exact Jaccard on shingle sets.

The reference verifies candidates with an exact Dice tree-compare
(``dupes-core/src/similarity.rs:13-46``); here candidates are verified with
EXACT Jaccard over distinct shingle arrays (not the MinHash estimate — the
recall gate requires the verify step to never drop a true pair,
SURVEY §7.4 risk 2). Dice and Jaccard are monotone-related (D = 2J/(1+J)).

Implementation is fully JVM-side and shuffles the heavy shingle payload
ONCE. The previous shape (two aliased joins pulling each side's signatures)
scanned the signatures table twice and moved the shingle-array mass through
two exchanges — the measured cause of the verify stage scaling only 1.4-1.9x
from 2->8 cores (DRAM-bound; VERDICT r3 #1). Now:

  1. candidate pairs explode to two light rows (pair key, nid, side) —
     ~130 B/row, no arrays, so AQE can broadcast them outright;
  2. ONE inner join pulls signatures (single scan, single exchange at most);
  3. a groupBy on the pair key reassembles (shingles_a, shingles_b) —
     the only exchange that carries arrays, sized by the candidate set
     (pairs << corpus at scale), not by the corpus.

SimHash-tier candidates get a cheap bit_count(xor) Hamming prefilter before
the Jaccard check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import PipelineConfig
from ..contracts import assert_unique_ids
from ..functions.shingles import jaccard_col
from ..functions.simhash import hamming_col


def reassembly_partitions(df: DataFrame) -> int:
    """Partition count for the pair-reassembly exchanges (here and in
    operators/substring.py & similarity.py): the session's configured
    shuffle width — what a non-AQE plan would use. The reassembly groupBy
    feeds CPU-DENSE work (exact Jaccard over shingle arrays, the LCS
    kernel, cosine re-rank) whose cost per shuffled byte is far above
    typical, so AQE's byte-based coalescing (advisory 4 MB) lands it on
    1-2 tasks and serializes the verify compute (measured: the minhash and
    substring verify jobs each ran 0.7+ s on ONE task at bench scale). An
    explicit repartition(N, pair_key) is exempt from AQE coalescing and
    adds NO extra exchange — the groupBy on a superset of the keys reuses
    the partitioning. Scale-adaptive: N is the cluster-sized shuffle
    width, never a local constant."""
    try:
        return int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions")
        )
    except (TypeError, ValueError):  # 'auto' or unset -> core count
        return df.sparkSession.sparkContext.defaultParallelism


def verify_pairs(
    pairs: DataFrame, signatures: DataFrame, cfg: PipelineConfig
) -> DataFrame:
    """(url_a, url_b, tier) -> verified edges with exact similarity.

    The join keys on nid = xxhash64(url) — the same 8-byte surrogate
    discipline as the candidate stage (operators/lsh.py): the signatures
    side probes on a BIGINT instead of a url string. nid collisions (two
    urls hashing alike would attach a foreign shingle row) are neutralized
    by a url equality filter BEFORE the reassembly groupBy — the true row
    always survives it, the foreign one never reaches the group. AQE
    handles residual skew (hot urls appear in many pairs).

    Set CARGO_DUPES_DEBUG_CONTRACTS=1 to assert the one-row-per-url
    contract on ``signatures`` per call (contracts.py, ADVICE r4).
    """
    assert_unique_ids(signatures, "url", "verify_pairs(signatures)")
    exploded = pairs.select(
        "url_a",
        "url_b",
        "tier",
        F.explode(
            F.array(
                F.struct(
                    F.xxhash64("url_a").alias("nid"), F.lit("a").alias("side")
                ),
                F.struct(
                    F.xxhash64("url_b").alias("nid"), F.lit("b").alias("side")
                ),
            )
        ).alias("_e"),
    ).select("url_a", "url_b", "tier", "_e.nid", "_e.side")

    sig = signatures.select(
        F.xxhash64("url").alias("nid"),
        F.col("url").alias("_sig_url"),
        "shingles",
        "simhash",
    )

    matched = exploded.join(sig, "nid", "inner").filter(
        F.when(F.col("side") == "a", F.col("url_a") == F.col("_sig_url"))
        .otherwise(F.col("url_b") == F.col("_sig_url"))
    )

    def side_first(col: str, side: str):
        # exactly one row per (pair, side) after the url filter (signatures
        # are one-row-per-url by pipeline contract), so first() over the
        # side-masked column is deterministic
        return F.first(
            F.when(F.col("side") == side, F.col(col)), ignorenulls=True
        ).alias(f"{col}_{side}")

    joined = (
        matched.repartition(
            reassembly_partitions(matched), "url_a", "url_b"
        )
        .groupBy("url_a", "url_b", "tier")
        .agg(
            side_first("shingles", "a"),
            side_first("shingles", "b"),
            side_first("simhash", "a"),
            side_first("simhash", "b"),
        )
        # inner-join semantics: a pair with either side absent from the
        # signatures table is not verifiable and drops here
        .filter(
            F.col("shingles_a").isNotNull() & F.col("shingles_b").isNotNull()
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
