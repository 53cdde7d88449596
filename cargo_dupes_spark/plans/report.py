"""Reporters [S6/S7/O5] — text and JSON sinks over the output tables.

Mirrors the reference's Reporter trait + Text/Json implementations
(``dupes-core/src/output/mod.rs:22-37``, ``output/text.rs:18-326``,
``output/json.rs:60-138``): stats header, then per-tier group sections that
only render when non-empty (``cli.rs:283-301``). All data arriving here is
already small (groups + a single stats row) — collection to the driver is
the correct move, the heavy lifting stayed distributed.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import DataFrame

from ..functions.fingerprint import fingerprint_hex_col

_TIER_TITLES = {
    "exact": "Exact Duplicates",
    "near": "Near Duplicates",
    "substring": "Substring Duplicates",
}


def _fmt_thousands(n: int) -> str:
    """Comma formatting (output/text.rs:6-16)."""
    return f"{n:,}"


def _collect(groups: DataFrame, stats: DataFrame, top_n: int | None):
    bits = 128 if dict(groups.dtypes).get("group_fp") == "string" else 64
    g = groups.select(
        fingerprint_hex_col("group_fp", bits=bits).alias("fingerprint"),
        "tier",
        "n_members",
        "similarity",
        "total_tokens",
        "members",
    )
    if top_n is not None:
        g = g.limit(top_n)
    return g.collect(), stats.collect()[0].asDict()


def text_report(
    groups: DataFrame, stats: DataFrame, top_n: int | None = None
) -> str:
    rows, s = _collect(groups, stats, top_n)
    lines = [
        "Duplication Report",
        "==================",
        f"Total documents:  {_fmt_thousands(s['total_docs'])}",
        f"Total tokens:     {_fmt_thousands(s['total_tokens'])}",
    ]
    for tier in ("exact", "near", "substring"):
        lines.append(
            f"{tier:>9} tier:  {_fmt_thousands(s[f'{tier}_groups'])} groups, "
            f"{_fmt_thousands(s[f'{tier}_docs'])} docs, "
            f"{s[f'{tier}_token_percent']:.2f}% of tokens"
        )
    for tier in ("exact", "near", "substring"):
        tier_rows = [r for r in rows if r["tier"] == tier]
        if not tier_rows:  # sections render only when non-empty
            continue
        lines += ["", _TIER_TITLES[tier], "-" * len(_TIER_TITLES[tier])]
        for r in tier_rows:
            sim = f" similarity={r['similarity']:.3f}" if r["similarity"] is not None else ""
            lines.append(
                f"group {r['fingerprint']} "
                f"({r['n_members']} members,{sim} "
                f"{_fmt_thousands(r['total_tokens'] or 0)} tokens)"
            )
            for url in r["members"]:
                lines.append(f"  - {url}")
    return "\n".join(lines) + "\n"


def json_report(
    groups: DataFrame, stats: DataFrame, top_n: int | None = None
) -> str:
    """Machine-readable report (shape mirrors JsonGroup/JsonMember,
    output/json.rs:44-58)."""
    rows, s = _collect(groups, stats, top_n)
    payload: dict[str, Any] = {
        "stats": s,
        "groups": [
            {
                "fingerprint": r["fingerprint"],
                "tier": r["tier"],
                "similarity": r["similarity"],
                "n_members": r["n_members"],
                "total_tokens": r["total_tokens"],
                "members": list(r["members"]),
            }
            for r in rows
        ],
    }
    return json.dumps(payload, indent=2, sort_keys=True)
