#!/usr/bin/env python
"""Deterministic sf-proxy generator for LOCAL measurement only.

The driver's round-end bench may run at a larger, driver-generated scale
factor (BENCH_r05.json records sf1.0 = 10x sf0.1) that does not exist on
disk between rounds. This script synthesizes a statistically matching stand-
in from the sf0.1 tables' OBSERVED distributions (30-word uniform vocab,
10-100 tokens/doc, lang weights en:2 others:1, 20 sources; events replicated
with shifted user/event ids so window partitions keep their per-user row
counts) so before/after timings are comparable at driver scale. It writes to
a target dir OUTSIDE /root/testdata (which is read-only by contract) and is
never used for correctness checks — the DuckDB oracle runs on the driver's
own sf0.01/sf0.001 tables.

Usage: python scripts/make_sf_proxy.py --out /tmp/sf1.0_proxy --mult 10
"""
from __future__ import annotations

import argparse
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

VOCAB = (
    "spark window merge table column vector stream value data small join "
    "filter big group hash customer sort order slow line part fast row the "
    "agg key query a scan batch"
).split()
LANGS = ["en", "en", "zh", "es", "fr", "de"]  # en double weight


def make_documents(out_dir: str, n_docs: int, seed: int = 4242) -> None:
    rng = np.random.default_rng(seed)
    n_tok = rng.integers(10, 101, size=n_docs)
    total = int(n_tok.sum())
    words = np.array(VOCAB)
    flat = words[rng.integers(0, len(words), size=total)]
    offsets = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(n_tok, out=offsets[1:])
    texts = [" ".join(flat[offsets[i]:offsets[i + 1]]) for i in range(n_docs)]
    langs = [LANGS[i % len(LANGS)] for i in rng.integers(0, len(LANGS), n_docs)]
    table = pa.table(
        {
            "doc_id": pa.array(np.arange(n_docs), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array(
                [f"src{i % 20}" for i in range(n_docs)], pa.string()
            ),
            "n_chars": pa.array(
                np.array([len(t) for t in texts]), pa.int64()
            ),
        }
    )
    pq.write_table(table, os.path.join(out_dir, "documents.parquet"))


def make_events(out_dir: str, mult: int) -> None:
    src = pq.read_table(os.path.join(SRC, "events.parquet"))
    n = src.num_rows
    n_users = 1500
    parts = []
    for k in range(mult):
        t = src
        t = t.set_column(
            t.schema.get_field_index("event_id"),
            "event_id",
            pa.array(t.column("event_id").to_numpy() + k * n, pa.int64()),
        )
        t = t.set_column(
            t.schema.get_field_index("user_id"),
            "user_id",
            pa.array(
                t.column("user_id").to_numpy() + k * n_users,
                src.schema.field("user_id").type,
            ),
        )
        parts.append(t)
    pq.write_table(pa.concat_tables(parts), os.path.join(out_dir, "events.parquet"))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--mult", type=int, default=10)
    args = p.parse_args()
    os.makedirs(args.out, exist_ok=True)
    make_documents(args.out, 5000 * args.mult)
    make_events(args.out, args.mult)
    for t in (
        "embeddings region nation customer supplier part orders lineitem"
    ).split():
        shutil.copy(
            os.path.join(SRC, f"{t}.parquet"),
            os.path.join(args.out, f"{t}.parquet"),
        )
    print(f"wrote proxy tables to {args.out}")
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
