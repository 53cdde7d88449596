#!/usr/bin/env python
"""Round-6 optimization instrumentation (bench.py is FROZEN for measurement;
every extra probe lives here — guide §1).

Modes
-----
--explain [--tag before|after]   capture .explain("formatted") of every
                                 headline query into plans/r06/<q>_<tag>.txt
--queries [--only a,b] [--repeats N]
                                 noop-sink timing per headline query (the
                                 same methodology as bench.run_headline)
--pipeline                       one full pipeline run in-session with
                                 per-stage walls (same shape as
                                 bench.run_pipeline_once but without the
                                 subprocess / corpus-synthesis overhead)
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

import bench  # noqa: E402  (frozen harness; reused, never modified)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _session(cpus: int):
    from cargo_dupes_spark.session import build_session

    return build_session(
        app_name="bench-extra", parallelism=cpus,
        shuffle_partitions=max(cpus, 8),
    )


def run_explains(sf_dir: str, cpus: int, tag: str, only: list[str] | None):
    import __spark_entry__ as entry_mod

    os.makedirs(os.path.join(REPO, "plans", "r06"), exist_ok=True)
    spark = _session(cpus)
    try:
        for name in bench.HEADLINE:
            if only and name not in only:
                continue
            df = entry_mod.queries()[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            out = os.path.join(REPO, "plans", "r06", f"{name}_{tag}.txt")
            with open(out, "w") as f:
                f.write(buf.getvalue())
            print(f"wrote {out}")
    finally:
        spark.stop()


def run_queries(
    sf_dir: str, cpus: int, repeats: int, only: list[str] | None
):
    import __spark_entry__ as entry_mod

    spark = _session(cpus)
    try:
        qs = entry_mod.queries()
        names = [n for n in bench.HEADLINE if (not only or n in only)]
        bench._noop_write(qs["normalize_docs"](spark, sf_dir))  # warm-up
        samples: dict[str, list[float]] = {n: [] for n in names}
        for _ in range(repeats):
            for name in names:
                spark.sparkContext.setJobDescription(f"q:{name}")
                t0 = time.monotonic()
                bench._noop_write(qs[name](spark, sf_dir))
                samples[name].append(round(time.monotonic() - t0, 3))
        out = {
            "queries": {n: min(s) for n, s in samples.items()},
            "samples": samples,
            "sf": sf_dir,
            "cpus": cpus,
        }
        print(json.dumps(out))
    finally:
        spark.stop()


def run_pipeline(sf_dir: str, cpus: int, mult: int):
    import shutil
    import tempfile

    from cargo_dupes_spark.config import PipelineConfig
    from cargo_dupes_spark.plans.pipeline import Pipeline

    spark = _session(cpus)
    warehouse = tempfile.mkdtemp(prefix="bench_extra_wh_")
    try:
        web_pages = bench.replicated_web_pages(spark, sf_dir, mult)
        n_docs = web_pages.count()
        # in-session warm-up like run_headline's first repeat
        cfg0 = PipelineConfig(
            warehouse=os.path.join(warehouse, "warm"),
            checkpoint_dir=os.path.join(warehouse, "warm_ckpt"),
        )
        from cargo_dupes_spark.sources.web_pages import (
            synthetic_web_pages_at_scale,
        )

        warm = Pipeline(spark, cfg0, detectors=("minhash",)).run(
            synthetic_web_pages_at_scale(spark, 3000, num_partitions=8)
        )
        warm["memberships"].count()
        warm["stats"].collect()

        cfg = PipelineConfig(
            warehouse=os.path.join(warehouse, "wh"),
            checkpoint_dir=os.path.join(warehouse, "ckpt"),
        )
        t0 = time.monotonic()
        pipe = Pipeline(spark, cfg, detectors=("minhash",))
        outputs = pipe.run(web_pages)
        outputs["memberships"].count()
        outputs["stats"].collect()
        wall = time.monotonic() - t0
        stage_walls = {
            r["stage"]: round(r["value"], 2)
            for r in pipe.catalog.read_metrics()
            .filter("metric = 'wall_seconds'")
            .collect()
        }
        print(
            json.dumps(
                {
                    "docs": n_docs,
                    "wall_s": round(wall, 3),
                    "docs_per_sec": round(n_docs / wall, 1),
                    "stage_walls": stage_walls,
                    "sf": sf_dir,
                    "cpus": cpus,
                }
            )
        )
    finally:
        spark.stop()
        shutil.rmtree(warehouse, ignore_errors=True)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    p.add_argument("--cpus", type=int, default=DEFAULT_CPUS)
    p.add_argument("--mult", type=int, default=8)
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--tag", default="before")
    p.add_argument("--only", default=None)
    p.add_argument("--explain", action="store_true")
    p.add_argument("--queries", action="store_true")
    p.add_argument("--pipeline", action="store_true")
    args = p.parse_args()
    only = args.only.split(",") if args.only else None

    if args.explain:
        run_explains(args.sf_dir, args.cpus, args.tag, only)
    if args.queries:
        run_queries(args.sf_dir, args.cpus, args.repeats, only)
    if args.pipeline:
        run_pipeline(args.sf_dir, args.cpus, args.mult)
    return 0


if __name__ == "__main__":
    sys.exit(main())
