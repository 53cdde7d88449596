"""Similarity search over embedding columns: brute-force cosine top-k and an
LSH-bucketed scale path.

Extends the engine for training-data pipelines (embeddings table:
vec_id BIGINT, embedding ARRAY<FLOAT>, label INT). The brute-force path is
the exactness baseline (and the DuckDB-oracle-checkable one); the
random-hyperplane LSH path is the 100 TB shape: candidates only meet inside
buckets, turning the O(n²) cross join into per-bucket self-joins — the same
bucket-then-verify skeleton as the near-dup tier.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window


def cosine_col(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity of two float arrays — zip_with/aggregate, JVM-side."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b

    def dot(x: Column, y: Column) -> Column:
        return F.aggregate(
            F.zip_with(x, y, lambda u, v: u * v),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    denom = F.sqrt(dot(ca, ca)) * F.sqrt(dot(cb, cb))
    return F.when(denom == 0, F.lit(0.0)).otherwise(dot(ca, cb) / denom)


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query (cross join + window rank).

    The correctness baseline: at scale use lsh_topk, or broadcast `queries`
    (typical ANN usage has a small query set against a huge corpus — the
    cross join is then a broadcast nested loop, no shuffle of the corpus).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("query_vec")
    )
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cand_vec")
    )
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_col("query_vec", "cand_vec"), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def random_hyperplane_udf(dim: int, n_planes: int, seed: int = 13):
    """Sign-sketch of an embedding: n_planes random hyperplanes -> bit key.
    (Charikar'02 SimHash for angular distance — the embedding-space twin of
    the text SimHash tier.)"""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_planes)).astype(np.float32)

    @F.pandas_udf(T.LongType())
    def _sketch(vecs: pd.Series) -> pd.Series:
        mat = np.stack([np.asarray(v, dtype=np.float32) for v in vecs])
        bits = (mat @ planes) > 0
        weights = (1 << np.arange(n_planes, dtype=np.int64))
        return pd.Series(bits @ weights)

    return _sketch


def lsh_topk(
    embeddings: DataFrame,
    k: int,
    dim: int,
    n_planes: int = 12,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 13,
) -> DataFrame:
    """Approximate all-pairs top-k: n_tables independent hyperplane sketches,
    candidates meet when any sketch matches, exact cosine re-rank inside
    buckets. Recall grows with n_tables; bucket sizes shrink with n_planes."""
    sketched = embeddings.select(id_col, vec_col)
    buckets = []
    for t in range(n_tables):
        udf = random_hyperplane_udf(dim, n_planes, seed + t)
        buckets.append(
            sketched.select(
                F.col(id_col).alias("vid"),
                F.col(vec_col).alias("vec"),
                F.lit(t).alias("table_id"),
                udf(F.col(vec_col)).alias("bucket"),
            )
        )
    all_buckets = buckets[0]
    for b in buckets[1:]:
        all_buckets = all_buckets.unionByName(b)

    a = all_buckets.alias("a")
    b = all_buckets.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.table_id") == F.col("b.table_id"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vid") != F.col("b.vid")),
        )
        .select(
            F.col("a.vid").alias("query_id"),
            F.col("b.vid").alias("neighbor_id"),
            F.col("a.vec").alias("qv"),
            F.col("b.vec").alias("cv"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.select(
        "query_id",
        "neighbor_id",
        F.round(cosine_col("qv", "cv"), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float,
    dim: int,
    n_planes: int = 10,
    n_tables: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 13,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cosine >= threshold), the
    semantic-dedup detector: LSH-bucketed candidates + exact cosine verify,
    emitting (id_a < id_b) edges ready for the same CC clustering."""
    topk = lsh_topk(
        embeddings, k=50, dim=dim, n_planes=n_planes, n_tables=n_tables,
        id_col=id_col, vec_col=vec_col, seed=seed,
    )
    return (
        topk.filter(F.col("cosine") >= threshold)
        .select(
            F.least("query_id", "neighbor_id").alias("id_a"),
            F.greatest("query_id", "neighbor_id").alias("id_b"),
            "cosine",
        )
        .dropDuplicates(["id_a", "id_b"])
    )
