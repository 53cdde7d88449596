"""Pipeline configuration with TOML + CLI layering.

Semantics mirror the reference's layered config
(``dupes-core/src/config.rs:114-142``: dupes.toml > Cargo.toml metadata >
defaults, with CLI overrides applied on top, ``dupes-core/src/cli.rs:193-215``)
— re-expressed as a frozen dataclass loaded from ``pipeline.toml`` with
explicit override kwargs.

Knob lineage (reference -> here):
  min_nodes=10            -> min_tokens          (P3 size gate)
  similarity_threshold    -> jaccard_threshold   (Dice t maps to J = t/(2-t);
                             reference code default Dice 0.9 / CLI 0.8 ->
                             J 0.818 / 0.667; we default J 0.7)
  sub_function / min_sub_nodes=5 -> substring_tier / min_substring_len
  exclude patterns        -> url_exclude
  exclude_tests           -> exclude_boilerplate
  CI thresholds (cli.rs:304-374) -> max_exact_groups etc.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import tomllib
from dataclasses import dataclass
from pathlib import Path
from typing import Any


@dataclass(frozen=True)
class PipelineConfig:
    # --- size gates (reference P3: parser.rs:66-72) ---
    min_tokens: int = 5

    # --- extraction (P1/P2/P5: table-driven rules per content type,
    # functions/extract.py EXTRACTION_RULES — the NodeMapping analog) ---
    content_type: str = "text/html"

    # --- normalization (reference N1-N7) ---
    mask_numbers: bool = True
    mask_urls: bool = True
    mask_emails: bool = True

    # --- shingling / MinHash / LSH (F5-F7, J3) ---
    shingle_k: int = 3            # tokens per shingle
    num_perm: int = 128           # MinHash signature length
    lsh_bands: int = 32           # bands * rows_per_band == num_perm
    lsh_rows: int = 4
    minhash_seed: int = 1          # fixed: recall is measured "at identical
    shingle_seed: int = 42         # shingle/signature config" (north_rule)

    # --- verification threshold (J4; Dice->Jaccard mapping documented above) ---
    jaccard_threshold: float = 0.7

    # --- SimHash tier (F6) ---
    simhash_bits: int = 64
    hamming_threshold: int = 3
    simhash_chunks: int = 4       # pigeonhole: d<=3 pairs share >=1 of 4 chunks

    # --- substring tier (X1-X3) ---
    substring_tier: bool = True
    min_substring_len: int = 64    # chars; reference min_sub_nodes=5 analog
    winnow_kgram: int = 16         # winnowing k-gram size (chars)
    winnow_window: int = 49        # guarantee: matches >= k + w - 1 = 64 chars

    # --- filters (S1-S2, P4) ---
    url_exclude: tuple[str, ...] = ()
    exclude_boilerplate: bool = True
    langs: tuple[str, ...] = ()    # empty = all; cross-lang pairs never compared

    # --- skew handling (north_rule: hot-host URL skew) ---
    max_bucket_size: int = 2000    # LSH band buckets above this are salted/split
    salt_buckets: int = 16

    # --- fingerprint width ---
    # 64: BIGINT xxhash64 (default; collision math honest below ~10^9 docs).
    # 128: two independently seeded xxhash64 halves as one 32-char hex
    # string — the 10^12-doc upgrade path (functions/fingerprint.py). Flows
    # through exact tier, composites, CC node ids, ignore lists, streaming.
    fingerprint_bits: int = 64

    # --- streaming state layout ---
    # stream_fps is hive/Iceberg-partitioned by pmod(fingerprint, N): the
    # per-batch state probe prunes to the partitions the batch's own
    # fingerprints can live in, instead of scanning the whole corpus state
    stream_fp_buckets: int = 64

    # --- clustering ---
    cc_max_iterations: int = 50

    # --- CI gate thresholds (O4: cli.rs:304-374); None = not enforced ---
    max_exact_groups: int | None = None
    max_near_groups: int | None = None
    max_exact_percent: float | None = None
    max_near_percent: float | None = None

    # --- IO ---
    warehouse: str = "/tmp/cargo_dupes_spark/warehouse"
    checkpoint_dir: str = "/tmp/cargo_dupes_spark/checkpoints"

    def config_hash(self) -> str:
        """Deterministic hash of all knobs — recorded with every metrics row
        so a resume only skips stages produced under the identical config
        (reference analog: a changed dupes.toml invalidates prior results)."""
        payload = json.dumps(dataclasses.asdict(self), sort_keys=True, default=str)
        return hashlib.sha256(payload.encode()).hexdigest()[:16]

    def validate(self) -> "PipelineConfig":
        from .functions.extract import EXTRACTION_RULES

        if self.content_type not in EXTRACTION_RULES:
            raise ValueError(
                f"no extraction rules for {self.content_type!r}; "
                f"known: {sorted(EXTRACTION_RULES)}"
            )
        if self.lsh_bands * self.lsh_rows != self.num_perm:
            raise ValueError(
                f"lsh_bands*lsh_rows ({self.lsh_bands}*{self.lsh_rows}) "
                f"must equal num_perm ({self.num_perm})"
            )
        if not 0.0 < self.jaccard_threshold <= 1.0:
            raise ValueError("jaccard_threshold must be in (0, 1]")
        if self.simhash_bits != 64:
            raise ValueError("only 64-bit SimHash is supported")
        if self.fingerprint_bits not in (64, 128):
            raise ValueError("fingerprint_bits must be 64 or 128")
        if self.simhash_chunks < self.hamming_threshold + 1:
            raise ValueError(
                "pigeonhole requires simhash_chunks >= hamming_threshold+1"
            )
        if self.winnow_kgram + self.winnow_window - 1 > self.min_substring_len:
            raise ValueError(
                "winnowing guarantee k+w-1 must be <= min_substring_len"
            )
        return self


def dice_to_jaccard(dice: float) -> float:
    """The reference thresholds are Dice over trees (similarity.rs:13-21);
    ours are Jaccard over shingle sets. D = 2J/(1+J)  <=>  J = D/(2-D)."""
    return dice / (2.0 - dice)


def jaccard_to_dice(jaccard: float) -> float:
    return 2.0 * jaccard / (1.0 + jaccard)


def load_config(
    toml_path: str | Path | None = None, **overrides: Any
) -> PipelineConfig:
    """Layered load: defaults < pipeline.toml [pipeline] < explicit overrides.

    Mirrors Config::load + apply_overrides (config.rs:114-142, cli.rs:193-215):
    file values replace defaults, CLI/kwarg values replace file values, and
    unknown keys are rejected (the reference fails on malformed TOML too).
    """
    values: dict[str, Any] = {}
    if toml_path is not None:
        p = Path(toml_path)
        if p.exists():
            with open(p, "rb") as f:
                doc = tomllib.load(f)
            values.update(doc.get("pipeline", doc))
    values.update({k: v for k, v in overrides.items() if v is not None})

    known = {f.name for f in dataclasses.fields(PipelineConfig)}
    unknown = set(values) - known
    if unknown:
        raise ValueError(f"unknown config keys: {sorted(unknown)}")
    for key in ("url_exclude", "langs"):
        if key in values and isinstance(values[key], list):
            values[key] = tuple(values[key])
    return PipelineConfig(**values).validate()


DEFAULT_CONFIG = PipelineConfig()
