"""Candidate-pair generation: MinHash/LSH banding + SimHash Hamming buckets.

This is the scale-out replacement for the reference's O(bucket²) pairwise
loop within (kind, ⌊log2 size⌋) buckets (J2/J3,
``dupes-core/src/grouper.rs:115-151``): the bucketing idea survives, the
bucket key becomes an LSH band hash (or a SimHash bit-slice), and the
"pairwise comparison within a bucket" becomes an equi-self-join.

Scale notes (the parts that matter at 10^12 docs):
  * band_key is a single 8-byte join key; the self-join is a shuffled hash
    join co-partitioned on it. AQE skew-join splits residual skew.
  * mega-buckets (boilerplate shingles shared by millions of docs) would
    make the self-join quadratic — buckets above cfg.max_bucket_size are
    excluded from pairing and ACCOUNTED (returned for the lineage table;
    never silently dropped — SURVEY §7.4 risk 4).
  * docs of different lang never pair (the reference's hard mismatch on
    MacroCall names / per-language analyzers) — lang is folded into the
    band key, so cross-lang pairs never even co-locate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import PipelineConfig
from ..functions.simhash import simhash_chunk_col


def minhash_bands(signatures: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """(url, band_id, band_key): one row per band per doc.

    band_key folds lang + band_id + the band's signature slice into one
    xxhash64 — JVM-side via a transform/posexplode over the signature array.
    """
    b, r = cfg.lsh_bands, cfg.lsh_rows
    bands = F.transform(
        F.sequence(F.lit(0), F.lit(b - 1)),
        # xxhash64 hashes the array column directly — no string join; the
        # minhash reference is a bound attribute, so no recompute per band
        lambda i: F.xxhash64(
            F.col("lang"), i, F.slice(F.col("minhash"), i * r + 1, r)
        ),
    )
    return signatures.select(
        "url", F.posexplode(bands).alias("band_id", "band_key")
    )


def simhash_buckets(signatures: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """(url, band_id, band_key) from SimHash bit-slices: pigeonhole
    guarantees any pair with Hamming distance <= hamming_threshold shares at
    least one of the cfg.simhash_chunks slices."""
    n = cfg.simhash_chunks
    parts = []
    for i in range(n):
        parts.append(
            signatures.select(
                "url",
                F.lit(i).alias("band_id"),
                F.xxhash64(
                    F.col("lang"), F.lit(i), simhash_chunk_col("simhash", i, n)
                ).alias("band_key"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def pairs_from_buckets(
    bucketed: DataFrame, cfg: PipelineConfig, tier: str
) -> tuple[DataFrame, DataFrame]:
    """Bucket rows -> deduped candidate pairs (url_a < url_b) + an
    accounting DataFrame of buckets that were salted or dropped.

    Skew policy (north_rule "salted repartitioning handles hot-host URL
    skew"; SURVEY §7.4 risk 4 — never silent):
      * size <= max_bucket_size                    — pair normally
      * max < size <= max*salt_buckets             — SALT: split members
        into salt_buckets sub-buckets by url hash and pair within each
        sub-bucket. Bounds the join fan-out at (size/salt)² per sub-bucket.
        Cross-sub-bucket pairs in this band are lost, but hot docs share
        many OTHER bands (a true near-dup pair collides in any of b bands),
        so the recall hit concentrates on boilerplate mega-groups.
      * size > max*salt_buckets                    — drop + account
        (returned for the lineage/metrics sink).

    Returns (pairs, flagged) where flagged has
    (band_id, band_key, bucket_size, action in {'salted','dropped'}).
    """
    cap = cfg.max_bucket_size
    salt = cfg.salt_buckets
    # persist: sizes feeds the pairing filter, the salting filter, and the
    # accounting action — without it the band-key shuffle reruns per use.
    # One row per bucket (≪ bucketed rows).
    sizes = (
        bucketed.groupBy("band_id", "band_key")
        .agg(F.count(F.lit(1)).alias("bucket_size"))
        .persist()
    )
    ok = sizes.filter((F.col("bucket_size") > 1) & (F.col("bucket_size") <= cap))
    salted = sizes.filter(
        (F.col("bucket_size") > cap) & (F.col("bucket_size") <= cap * salt)
    )
    flagged = sizes.filter(F.col("bucket_size") > cap).select(
        "band_id",
        "band_key",
        "bucket_size",
        F.when(F.col("bucket_size") <= cap * salt, F.lit("salted"))
        .otherwise(F.lit("dropped"))
        .alias("action"),
    )

    elig_ok = bucketed.join(
        ok.select("band_id", "band_key"), ["band_id", "band_key"], "inner"
    ).select("url", "band_id", "band_key")
    elig_salted = bucketed.join(
        salted.select("band_id", "band_key"), ["band_id", "band_key"], "inner"
    ).select(
        "url",
        "band_id",
        # sub-bucket key: fold a url-hash salt into the band key
        F.xxhash64(
            F.col("band_key"), F.pmod(F.xxhash64("url"), F.lit(salt))
        ).alias("band_key"),
    )
    eligible = elig_ok.unionByName(elig_salted)

    a = eligible.alias("a")
    b = eligible.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.url") < F.col("b.url")),
            "inner",
        )
        .select(
            F.col("a.url").alias("url_a"),
            F.col("b.url").alias("url_b"),
        )
        .dropDuplicates(["url_a", "url_b"])
        .withColumn("tier", F.lit(tier))
    )
    return pairs, flagged
