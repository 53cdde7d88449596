"""Fingerprinting — 64-bit content hashes and composite group fingerprints.

Reference: ``Fingerprint`` newtype over u64 (``dupes-core/src/fingerprint.rs``):
  from_node (rs:14-18)          -> xxhash64(norm_text)        [F1]
  from_sig_and_body (rs:22-27)  -> xxhash64(title, norm_text) [F2]
  from_fingerprints (rs:32-40)  -> sorted-then-hashed composite [F3]
  to_hex/from_hex (rs:50-57)    -> 16-char lowercase hex      [F4]

All built-in expressions — xxhash64 is Spark's stable, seedable 64-bit hash
(JVM-side, codegen'd), playing the role of Rust's DefaultHasher.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def fingerprint_col(*cols: Column | str) -> Column:
    """[F1]/[F2] deterministic 64-bit fingerprint of one or more columns."""
    return F.xxhash64(*cols)


def composite_fingerprint_col(fp_col: Column | str) -> Column:
    """[F3] order-independent composite fingerprint: sort member fps, hash the
    sequence — same sorted-then-hash construction as
    Fingerprint::from_fingerprints (fingerprint.rs:32-40). Use inside
    groupBy(...).agg(...).
    """
    c = F.col(fp_col) if isinstance(fp_col, str) else fp_col
    return F.xxhash64(F.array_join(F.sort_array(F.collect_list(c)), ","))


def fingerprint_hex_col(fp_col: Column | str) -> Column:
    """[F4] 16-char lowercase hex (fingerprint.rs:50-57). Negative longs hex
    as two's complement, matching the reference's u64 formatting."""
    c = F.col(fp_col) if isinstance(fp_col, str) else fp_col
    return F.lower(F.lpad(F.hex(c), 16, "0"))
