"""Fingerprinting — 64/128-bit content hashes and composite group
fingerprints.

Reference: ``Fingerprint`` newtype over u64 (``dupes-core/src/fingerprint.rs``):
  from_node (rs:14-18)          -> xxhash64(norm_text)        [F1]
  from_sig_and_body (rs:22-27)  -> xxhash64(title, norm_text) [F2]
  from_fingerprints (rs:32-40)  -> sorted-then-hashed composite [F3]
  to_hex/from_hex (rs:50-57)    -> 16-char lowercase hex      [F4]

All built-in expressions — xxhash64 is Spark's stable, seedable 64-bit hash
(JVM-side, codegen'd), playing the role of Rust's DefaultHasher.

Width (cfg.fingerprint_bits): 64-bit fingerprints are BIGINT columns —
the default, honest below ~10^9 docs (expected collisions ~n²/2^65).
At the north_rule's 10^12-doc scale a 64-bit exact tier would silently
merge ~30k unrelated doc pairs, so ``bits=128`` derives TWO independently
seeded xxhash64 halves and carries them as one 32-char lowercase hex
STRING: every downstream groupBy/join/min is type-agnostic, so the whole
pipeline (exact tier, composites, CC node ids, ignore lists, streaming
state) switches width from this one knob. Cost: 32-byte shuffle keys
instead of 8 — paid only when opted in.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# seed for the high half of 128-bit fingerprints (any fixed odd constant;
# xxhash64 with a prepended seed column is independent of the unseeded hash)
_WIDE_SEED = 0x9E3779B97F4A7C15 - (1 << 64)  # as signed i64 literal


def _hex16(c: Column) -> Column:
    return F.lower(F.lpad(F.hex(c), 16, "0"))


def fingerprint_col(*cols: Column | str, bits: int = 64) -> Column:
    """[F1]/[F2] deterministic fingerprint of one or more columns.

    bits=64  -> BIGINT xxhash64.
    bits=128 -> 32-char lowercase hex string: hex(xxhash64(seed, cols)) ||
    hex(xxhash64(cols)) — two independent 64-bit halves."""
    if bits == 64:
        return F.xxhash64(*cols)
    if bits != 128:
        raise ValueError(f"fingerprint_bits must be 64 or 128, got {bits}")
    return F.concat(
        _hex16(F.xxhash64(F.lit(_WIDE_SEED), *cols)),
        _hex16(F.xxhash64(*cols)),
    )


def composite_fingerprint_col(fp_col: Column | str, bits: int = 64) -> Column:
    """[F3] order-independent composite fingerprint: sort member fps, hash the
    sequence — same sorted-then-hash construction as
    Fingerprint::from_fingerprints (fingerprint.rs:32-40). Use inside
    groupBy(...).agg(...). Output width matches ``bits`` (the member fp
    column's own width)."""
    c = F.col(fp_col) if isinstance(fp_col, str) else fp_col
    joined = F.array_join(F.sort_array(F.collect_list(c)), ",")
    return fingerprint_col(joined, bits=bits)


def fingerprint_hex_col(fp_col: Column | str, bits: int = 64) -> Column:
    """[F4] lowercase hex (fingerprint.rs:50-57). 64-bit: negative longs hex
    as two's complement, matching the reference's u64 formatting; 128-bit
    fingerprints already ARE their 32-char hex form."""
    c = F.col(fp_col) if isinstance(fp_col, str) else fp_col
    return c if bits == 128 else _hex16(c)
