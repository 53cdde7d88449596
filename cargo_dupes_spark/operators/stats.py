"""Duplication statistics [G2/G3/G4] — DuplicationStats analog.

Reference: ``compute_stats``/``compute_stats_with_sub``
(``dupes-core/src/grouper.rs:232-273``) counts units, groups, and duplicated
lines per tier, with zero-guarded percentage helpers (``grouper.rs:38-56``).
Token counts play the role of line counts. One pass over memberships + one
over the corpus — all built-in aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def compute_stats(fingerprints: DataFrame, memberships: DataFrame) -> DataFrame:
    """Single-row stats DataFrame over the run.

    Columns (per tier t in exact/near/substring):
      {t}_groups, {t}_docs, {t}_tokens — group count, member docs, member
      token sum; plus total_docs, total_tokens and zero-guarded
      {t}_token_percent.
    """
    totals = fingerprints.agg(
        F.count(F.lit(1)).alias("total_docs"),
        F.coalesce(F.sum("n_tokens"), F.lit(0)).alias("total_tokens"),
    )
    with_tokens = memberships.join(
        fingerprints.select("url", "n_tokens"), "url", "left"
    )
    # global aggregates always yield exactly one row, even on empty input —
    # robust where a pivot over an empty memberships table would vanish
    out = totals
    for tier in ("exact", "near", "substring"):
        tier_agg = with_tokens.filter(F.col("tier") == tier).agg(
            F.countDistinct("group_fp").cast("long").alias(f"{tier}_groups"),
            F.count(F.lit(1)).cast("long").alias(f"{tier}_docs"),
            F.coalesce(F.sum("n_tokens"), F.lit(0))
            .cast("long")
            .alias(f"{tier}_tokens"),
        )
        out = out.crossJoin(tier_agg)
    for tier in ("exact", "near", "substring"):
        # zero-guarded percentage (grouper.rs:38-56)
        out = out.withColumn(
            f"{tier}_token_percent",
            F.when(F.col("total_tokens") == 0, F.lit(0.0)).otherwise(
                F.round(
                    F.col(f"{tier}_tokens") * 100.0 / F.col("total_tokens"), 6
                )
            ),
        )
    return out.select(
        "total_docs",
        "total_tokens",
        *[
            c
            for tier in ("exact", "near", "substring")
            for c in (
                f"{tier}_groups",
                f"{tier}_docs",
                f"{tier}_tokens",
                f"{tier}_token_percent",
            )
        ],
    )
