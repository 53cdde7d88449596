#!/usr/bin/env python
"""Benchmark harness (driver contract + scaling evidence).

Modes
-----
default            Run the headline queries at $SPARK_GRAFT_SF_DIR (default
                   /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and
                   print ONE JSON line:
                     {"metric": ..., "value": total_sec, "unit": "sec",
                      "queries": {name: sec, ...}, "sf": ...}
--pipeline-once    Run the full dedup pipeline (normalize -> fingerprint ->
                   exact tier -> MinHash/LSH -> verify -> CC -> stats, all
                   stages checkpointed) over a deterministically replicated
                   corpus at a given --cpus level; print a JSON line with
                   docs/sec. Used as the unit of work for scaling runs.
--scaling          Spawn --pipeline-once at local[N] and local[4N] (fresh
                   JVMs, same input) and report throughput at both plus
                   scaling efficiency = (thr_4N / thr_N) / 4 — the sandbox
                   proxy for the north_rule's N-vs-4N-executor criterion
                   (no real cluster available here).

The replicated corpus (--mult M) is deterministic: replica 0 keeps the
original text; replicas of every 10th doc are byte-exact copies (exact-tier
work); all other replicas append a one-token suffix (near-tier work, Jaccard
~0.94 between variants), so every stage of the pipeline does real work that
grows linearly with M.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
DEFAULT_MULT = int(os.environ.get("BENCH_MULT", "8"))

REPLICA_OFFSET = 10_000_000
EXACT_REPLICA_MOD = 10


def _noop_write(df) -> None:
    """Force full execution without driver-side materialization."""
    df.write.format("noop").mode("overwrite").save()


def replicated_web_pages(spark, sf_dir: str, mult: int):
    """documents.parquet -> web_pages-shaped input, replicated x mult."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    if mult <= 1:
        return docs.select(
            F.col("doc_id").cast("string").alias("url"),
            "text",
            "lang",
        )
    reps = spark.range(mult).select(F.col("id").alias("replica"))
    exact_copy = (F.col("doc_id") % EXACT_REPLICA_MOD == 0) | (
        F.col("replica") == 0
    )
    return docs.crossJoin(F.broadcast(reps)).select(
        (F.col("doc_id") + F.col("replica") * REPLICA_OFFSET)
        .cast("string")
        .alias("url"),
        F.when(exact_copy, F.col("text"))
        .otherwise(
            F.concat(F.col("text"), F.lit(" zz"), F.col("replica").cast("string"))
        )
        .alias("text"),
        "lang",
    )


def run_pipeline_once(
    sf_dir: str,
    cpus: int,
    mult: int,
    docs: int | None = None,
    input_path: str | None = None,
) -> dict:
    from cargo_dupes_spark.config import PipelineConfig
    from cargo_dupes_spark.plans.pipeline import Pipeline
    from cargo_dupes_spark.session import build_session

    warehouse = tempfile.mkdtemp(prefix=f"bench_wh_{cpus}_")
    # 4 tasks per core: with exactly one task per core a single straggler
    # (host steal, skewed partition) stretches the whole stage — measured as
    # candidate_pairs scaling only ~1.9x over 4x cores. AQE's
    # parallelism-first coalescing only merges sub-1MB partitions, so the
    # slack survives for real shuffles.
    spark = build_session(
        app_name=f"bench-pipeline-{cpus}", parallelism=cpus,
        shuffle_partitions=max(4 * cpus, 16),
    )
    try:
        cfg = PipelineConfig(
            warehouse=warehouse,
            checkpoint_dir=os.path.join(warehouse, "ckpt"),
        )
        if input_path is None:
            if docs:
                from cargo_dupes_spark.sources.web_pages import (
                    synthetic_web_pages_at_scale,
                )

                # partition count fixed independently of cpus so both scaling
                # levels process the identical input split; ~200-token docs
                # (~1.4 KB) approximate Common-Crawl extracted-text sizes
                web_pages = synthetic_web_pages_at_scale(
                    spark, docs, num_partitions=64,
                    min_doc_tokens=140, token_spread=120,
                )
            else:
                web_pages = replicated_web_pages(spark, sf_dir, mult)
            # materialize the input corpus OUTSIDE the timed window: the
            # north_star input is an Iceberg/parquet table of web pages, so
            # the measured job starts from a table scan, not from synthesis
            input_path = os.path.join(warehouse, "input_web_pages")
            web_pages.write.mode("overwrite").parquet(input_path)
        web_pages = spark.read.parquet(input_path)
        n_docs = web_pages.count()

        # JIT/codegen warm-up, excluded from timing (BASELINE.md protocol):
        # a miniature pipeline run compiles every hot code path (regex
        # normalize, shingle windows, Arrow UDF round-trip, shuffle + parquet
        # write) so the measured run reflects steady-state throughput — the
        # regime a real cluster job lives in. ~10 s; without it the first
        # ~15 s of the measured run is C2-compiler time, a fixed cost that
        # poisons the N-vs-4N strong-scaling comparison.
        warm_wh = os.path.join(warehouse, "warmup")
        from cargo_dupes_spark.sources.web_pages import (
            synthetic_web_pages_at_scale as _synth,
        )
        warm_cfg = PipelineConfig(
            warehouse=warm_wh, checkpoint_dir=os.path.join(warm_wh, "ckpt")
        )
        warm_pipe = Pipeline(spark, warm_cfg, detectors=("minhash",))
        warm_out = warm_pipe.run(_synth(spark, 3000, num_partitions=8))
        warm_out["memberships"].count()
        warm_out["stats"].collect()
        shutil.rmtree(warm_wh, ignore_errors=True)

        t0 = time.monotonic()
        pipe = Pipeline(spark, cfg, detectors=("minhash",))
        outputs = pipe.run(web_pages)
        n_members = outputs["memberships"].count()
        outputs["stats"].collect()
        wall = time.monotonic() - t0
        stage_walls = {
            r["stage"]: round(r["value"], 2)
            for r in pipe.catalog.read_metrics()
            .filter("metric = 'wall_seconds'")
            .collect()
        }
        return {
            "stage_walls": stage_walls,
            "cpus": cpus,
            "mult": mult if not docs else None,
            "synthetic_docs": docs,
            "docs": n_docs,
            "memberships": n_members,
            "wall_s": round(wall, 3),
            "docs_per_sec": round(n_docs / wall, 1),
        }
    finally:
        spark.stop()
        shutil.rmtree(warehouse, ignore_errors=True)


def _cpu_spin(_):
    import time as _t

    x = 0
    t0 = _t.monotonic()
    for i in range(30_000_000):
        x += i * i
    return _t.monotonic() - t0


def calibrate_cpu(n: int, repeats: int = 3) -> float:
    """Aggregate pure-CPU throughput (tasks/s) of n concurrent Python
    processes — embarrassingly parallel integer work, no Spark, no memory
    pressure. This is the HARDWARE ceiling: no distributed job can scale
    better than the host's vCPUs do. The sandbox's 32 vCPUs measurably
    deliver only ~2.6-3x the throughput of 8 (host oversubscription), so
    scaling efficiency is reported both raw and normalized by this ceiling.
    """
    import multiprocessing as mp

    best = 0.0
    for _ in range(repeats):
        with mp.Pool(n) as p:
            t0 = time.monotonic()
            p.map(_cpu_spin, range(n))
            best = max(best, n / (time.monotonic() - t0))
    return round(best, 3)


def _mem_stream(_):
    """One worker's DRAM-streaming task: allocate a 256 MB float64 array
    (far beyond L3) and stream-read it repeatedly. Returns nothing; the
    caller times the pool wall. The traffic is ~256 MB written (the
    ``full`` fill) + 24 x 256 MB read = ~6.25 GB per task, all of it
    forced through the memory bus (a.sum() over 32M contiguous doubles
    cannot cache-resident)."""
    import numpy as _np

    a = _np.full(32 * 1024 * 1024, 1.0, dtype=_np.float64)  # 256 MB
    s = 0.0
    for _ in range(24):
        s += float(a.sum())
    return s


_MEM_BYTES_PER_TASK = 32 * 1024 * 1024 * 8 * 25  # 1 write + 24 read passes


def calibrate_membw(n: int, repeats: int = 3) -> float:
    """Aggregate DRAM streaming bandwidth (GB/s) of n concurrent
    processes. This is the OTHER hardware ceiling beside calibrate_cpu's
    pure-CPU one: on this host the memory bus saturates at ~2-3 streaming
    cores, so any bandwidth-bound stage (the Arrow sketch kernels + parquet
    writes of the signatures stage, the shingle-array shuffles of verify)
    cannot scale 4x over 4x cores NO MATTER WHAT THE PLAN DOES — each
    executor on a real cluster owns its DRAM, so this ceiling is sandbox
    physics, not plan shape. Reported as an INSTRUMENT next to the raw and
    CPU-normalized efficiencies; deliberately NOT folded into the
    normalization (a job grading itself on a bandwidth curve it sets would
    be circular — see BASELINE.md host pathology #2)."""
    import multiprocessing as mp

    best = 0.0
    for _ in range(repeats):
        with mp.Pool(n) as p:
            t0 = time.monotonic()
            p.map(_mem_stream, range(n))
            wall = time.monotonic() - t0
            best = max(best, n * _MEM_BYTES_PER_TASK / wall / 1e9)
    return round(best, 2)


def probe_window(
    base_cpus: int,
    min_ceiling: float = 0.9,
    min_per_cpu_rate: float = 0.55,
    min_membw: float = 0.0,
) -> dict:
    """Pre-launch host-weather probe (VERDICT r4 #6): ~30 s of pure-CPU
    spinners at N and 4N processes. A window is OK when (a) the pure-CPU
    N->4N ceiling reads >= min_ceiling (vCPUs not collapsed) AND (b) the
    ABSOLUTE per-cpu task rate is healthy (eight round-4 protocol runs:
    every gate-passing window had per-cpu rates >= ~0.6 tasks/s; windows
    probing clean ratios at 0.47-0.50 tasks/s soured mid-run).

    With ``min_membw`` > 0 the probe ALSO requires the DRAM-streaming
    N->4N ceiling to read >= min_membw. The bus ceiling swings with host
    weather like the CPU one does (recorded launch-adjacent samples range
    0.55-0.88 for the (2,8) pair) — and protocol run 10 showed that in a
    0.98-CPU window the job reads exactly the stage-weighted blend of the
    CPU and bus ceilings, so a window where BOTH instruments read healthy
    is the only kind in which the blended raw figure can clear the gate."""
    hw_n = calibrate_cpu(base_cpus, repeats=3)
    hw_4n = calibrate_cpu(base_cpus * 4, repeats=3)
    ceiling = (hw_4n / hw_n) / 4.0 if hw_n else 0.0
    per_cpu = hw_n / base_cpus
    out = {
        "hw_tasks_per_sec": {str(base_cpus): hw_n, str(base_cpus * 4): hw_4n},
        "ceiling": round(ceiling, 4),
        "per_cpu_rate": round(per_cpu, 4),
        "ok": bool(ceiling >= min_ceiling and per_cpu >= min_per_cpu_rate),
    }
    if min_membw > 0.0:
        bw_n = calibrate_membw(base_cpus, repeats=2)
        bw_4n = calibrate_membw(base_cpus * 4, repeats=2)
        bw_ceiling = (bw_4n / bw_n) / 4.0 if bw_n else 0.0
        out["membw_gbps"] = {str(base_cpus): bw_n, str(base_cpus * 4): bw_4n}
        out["membw_ceiling"] = round(bw_ceiling, 4)
        out["ok"] = bool(out["ok"] and bw_ceiling >= min_membw)
    return out


def run_scaling(
    sf_dir: str,
    base_cpus: int,
    mult: int,
    docs: int | None,
    repeats: int = 2,
    probe_gate: bool = False,
    probe_max_waits: int = 6,
    probe_wait_s: float = 120.0,
    probe_min_ceiling: float = 0.9,
    probe_min_rate: float = 0.55,
    probe_min_membw: float = 0.0,
) -> dict:
    """Same job, same input, local[N] vs local[4N] in fresh JVMs.

    Each level runs `repeats` times and the best (minimum-wall) run is used,
    per the BASELINE.md protocol (warm-up effects excluded).

    The input corpus is synthesized ONCE (full host parallelism — it is
    outside every measured window) and shared read-only by all child runs:
    every level at every repeat scans byte-identical parquet.

    With ``probe_gate`` the launch waits for a clean host window: a pure-CPU
    probe must pass before the measured runs start (abort-and-retry up to
    probe_max_waits, every skipped window recorded in the JSON). The final
    JSON always carries the launch probe and a window_ok flag; a clean
    PRE-launch probe does not guarantee a clean run (windows sour mid-run —
    r4 run 8), so window_ok_in_run reports the in-run calibration too.
    """
    skipped: list[dict] = []
    probe = probe_window(
        base_cpus, probe_min_ceiling, probe_min_rate, probe_min_membw
    )
    if probe_gate:
        waits = 0
        while not probe["ok"] and waits < probe_max_waits:
            skipped.append(probe)
            time.sleep(probe_wait_s)
            waits += 1
            probe = probe_window(
                base_cpus, probe_min_ceiling, probe_min_rate, probe_min_membw
            )

    # DRAM-bandwidth instrument, sampled at launch (adjacent to the probe
    # the run starts under): aggregate streaming GB/s at N and 4N procs and
    # their ratio/4 — the bandwidth analogue of hw_ceiling_eff. A
    # bandwidth-bound stage's best possible N->4N scaling is THIS number,
    # not 1.0; recorded as evidence, never folded into normalized_eff.
    membw_n = calibrate_membw(base_cpus)
    membw_4n = calibrate_membw(base_cpus * 4)
    membw_ceiling = (membw_4n / membw_n) / 4.0 if membw_n else 0.0

    input_dir = tempfile.mkdtemp(prefix="bench_scaling_input_")
    input_path = os.path.join(input_dir, "web_pages")
    try:
        from cargo_dupes_spark.session import build_session

        gen = build_session(app_name="bench-scaling-gen")
        try:
            if docs:
                from cargo_dupes_spark.sources.web_pages import (
                    synthetic_web_pages_at_scale,
                )

                corpus = synthetic_web_pages_at_scale(
                    gen, docs, num_partitions=64,
                    min_doc_tokens=140, token_spread=120,
                )
            else:
                corpus = replicated_web_pages(gen, sf_dir, mult)
            corpus.write.mode("overwrite").parquet(input_path)
        finally:
            gen.stop()

        # INTERLEAVED levels (N, 4N, N, 4N, ...) with a calibration sample
        # adjacent to every Spark run: the host's steal-like interference is
        # sustained over minutes, so running all-N-then-all-4N lets one
        # level soak a bad window the other never sees (observed as
        # pure-CPU "ceilings" above 1.0 — physically meaningless).
        # Interleaving gives both levels, and the calibration, the same
        # exposure to the noise; best-of-repeats then estimates the
        # achievable throughput at each level under comparable conditions.
        results: dict[int, list[dict]] = {}
        hw: dict[int, float] = {}
        for _ in range(repeats):
            for cpus in (base_cpus, base_cpus * 4):
                hw[cpus] = max(
                    hw.get(cpus, 0.0), calibrate_cpu(cpus, repeats=1)
                )
                cmd = [
                    sys.executable, os.path.abspath(__file__),
                    "--pipeline-once", "--cpus", str(cpus),
                    "--mult", str(mult), "--sf-dir", sf_dir,
                    "--input-path", input_path,
                ]
                if docs:
                    cmd += ["--docs", str(docs)]
                proc = subprocess.run(
                    cmd, capture_output=True, text=True, cwd=REPO
                )
                if proc.returncode != 0:
                    raise RuntimeError(
                        f"pipeline-once at cpus={cpus} failed:\n"
                        f"{proc.stderr[-4000:]}"
                    )
                results.setdefault(cpus, []).append(
                    json.loads(proc.stdout.strip().splitlines()[-1])
                )
    finally:
        shutil.rmtree(input_dir, ignore_errors=True)
    best = {c: min(rs, key=lambda r: r["wall_s"]) for c, rs in results.items()}
    thr_n = best[base_cpus]["docs_per_sec"]
    thr_4n = best[base_cpus * 4]["docs_per_sec"]
    raw_eff = (thr_4n / thr_n) / 4.0
    # final calibration samples folded into the per-run interleaved maxima
    hw_n = max(hw[base_cpus], calibrate_cpu(base_cpus, repeats=1))
    hw_4n = max(hw[base_cpus * 4], calibrate_cpu(base_cpus * 4, repeats=1))
    hw_ceiling = (hw_4n / hw_n) / 4.0
    return {
        "metric": "scaling_efficiency_Nx4",
        "value": round(raw_eff, 4),
        "unit": "fraction",
        "n_cpus": base_cpus,
        "throughput_n": thr_n,
        "throughput_4n": thr_4n,
        # hardware calibration: what PERFECT software could achieve on this
        # host (pure-CPU n-process throughput ratio); normalized = job
        # efficiency relative to that ceiling
        "hw_ceiling_eff": round(hw_ceiling, 4),
        "hw_tasks_per_sec": {str(base_cpus): hw_n, str(base_cpus * 4): hw_4n},
        # a measured ceiling > 1.0 is sampling noise (the host cannot scale
        # super-linearly). Clamping the normalizer at 1.0 can only RAISE the
        # reported efficiency vs dividing by the measured ceiling (if
        # calibration sampled a slow window, raw_eff is inflated and the
        # clamp preserves that inflation) — so BOTH normalizations are
        # emitted: normalized_eff (clamped, headline) and
        # normalized_eff_unclamped (divided by the ceiling as measured).
        "normalized_eff": round(min(raw_eff / min(hw_ceiling, 1.0), 1.0), 4)
        if hw_ceiling > 0
        else None,
        "normalized_eff_unclamped": round(min(raw_eff / hw_ceiling, 1.0), 4)
        if hw_ceiling > 0
        else None,
        # pre-launch host-weather probe + gate outcome (VERDICT r4 #6):
        # window_ok = the probe the run LAUNCHED under; window_ok_in_run =
        # the in-run interleaved calibration stayed clean too
        # DRAM streaming bandwidth at N and 4N procs (GB/s) + its N->4N
        # ceiling: the measured upper bound for any bandwidth-bound stage
        # on this shared-bus host (instrument only — see calibrate_membw)
        "membw_gbps": {
            str(base_cpus): membw_n,
            str(base_cpus * 4): membw_4n,
        },
        "membw_ceiling": round(membw_ceiling, 4),
        "probe": probe,
        "window_ok": probe["ok"],
        "window_ok_in_run": bool(hw_ceiling >= 0.85),
        "skipped_windows": skipped,
        "runs": {str(c): rs for c, rs in results.items()},
        "sf": sf_dir if not docs else f"synthetic:{docs}",
    }


# ---------------------------------------------------------------------------
# headline suite (driver default mode)
# ---------------------------------------------------------------------------
HEADLINE = (
    "exact_dup_groups",
    "minhash_near_pairs",
    "simhash_hamming_pairs",
    "near_dup_clusters",
    "substring_containment_pairs",
    "doc_segments",
    "dedup_stats",
    "quality_scores",
    "lang_id",
    "token_counts",
    "topk_cosine",
    "embedding_near_dups",
    "events_topk",
)


def run_headline(sf_dir: str, cpus: int, mult: int, repeats: int = 3) -> dict:
    """Best-of-``repeats`` per query. Identical work on this host varies
    ±25-40% with sustained interference windows (eleven (2,8) protocol runs,
    BASELINE.md), so a single sample made round-over-round comparison
    noise-dominated (VERDICT r3 #2); the per-query minimum estimates the
    achievable wall and ``samples`` carries every observation so the spread
    is auditable."""
    import __spark_entry__ as entry_mod
    from cargo_dupes_spark.session import build_session

    spark = build_session(
        app_name="bench-headline", parallelism=cpus,
        shuffle_partitions=max(cpus, 8),
    )
    try:
        qs = entry_mod.queries()
        # warm-up: JVM + Arrow path, excluded from timings
        _noop_write(qs["normalize_docs"](spark, sf_dir))

        samples: dict[str, list[float]] = {n: [] for n in HEADLINE}
        # round-robin over the suite (all queries once, then again): a slow
        # host window hits ALL queries' sample k, not one query's every
        # sample, so per-query minima stay comparable
        for _ in range(repeats):
            for name in HEADLINE:
                t0 = time.monotonic()
                _noop_write(qs[name](spark, sf_dir))
                samples[name].append(round(time.monotonic() - t0, 3))
        timings = {n: min(s) for n, s in samples.items()}

        # the headline throughput number: full pipeline over the replicated
        # corpus in THIS session (same JVM; scaling mode uses fresh JVMs)
        pipes = [
            _pipeline_in_session(spark, sf_dir, mult) for _ in range(repeats)
        ]
        pipe = min(pipes, key=lambda p: p["wall_s"])
        samples["full_pipeline"] = [p["wall_s"] for p in pipes]
        timings["full_pipeline"] = pipe["wall_s"]

        total = round(sum(timings.values()), 3)
        spread = {
            n: round((max(s) - min(s)) / min(s), 3) if min(s) > 0 else 0.0
            for n, s in samples.items()
        }
        return {
            "metric": "dedup_suite_wall",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "repeats": repeats,
            "samples": samples,
            "spread_frac": spread,
            "sf": sf_dir,
            "cpus": cpus,
            "pipeline_docs": pipe["docs"],
            "pipeline_docs_per_sec": pipe["docs_per_sec"],
        }
    finally:
        spark.stop()


def _pipeline_in_session(spark, sf_dir: str, mult: int) -> dict:
    from cargo_dupes_spark.config import PipelineConfig
    from cargo_dupes_spark.plans.pipeline import Pipeline

    warehouse = tempfile.mkdtemp(prefix="bench_wh_inline_")
    try:
        cfg = PipelineConfig(
            warehouse=warehouse,
            checkpoint_dir=os.path.join(warehouse, "ckpt"),
        )
        web_pages = replicated_web_pages(spark, sf_dir, mult)
        n_docs = web_pages.count()
        t0 = time.monotonic()
        outputs = Pipeline(spark, cfg, detectors=("minhash",)).run(web_pages)
        outputs["memberships"].count()
        outputs["stats"].collect()
        wall = time.monotonic() - t0
        return {
            "docs": n_docs,
            "wall_s": round(wall, 3),
            "docs_per_sec": round(n_docs / wall, 1),
        }
    finally:
        shutil.rmtree(warehouse, ignore_errors=True)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    p.add_argument("--cpus", type=int, default=DEFAULT_CPUS)
    p.add_argument("--mult", type=int, default=DEFAULT_MULT)
    p.add_argument("--pipeline-once", action="store_true")
    p.add_argument("--scaling", action="store_true")
    p.add_argument("--scaling-base-cpus", type=int, default=8)
    p.add_argument("--repeats", type=int, default=2)
    p.add_argument(
        "--bench-repeats", type=int, default=3,
        help="samples per headline query (best-of-N reported)",
    )
    p.add_argument(
        "--docs", type=int, default=None,
        help="use the deterministic synthetic corpus at this many base docs "
             "(linear dup structure) instead of replicating the sf dir",
    )
    p.add_argument(
        "--input-path", default=None,
        help="pre-materialized web_pages parquet to scan instead of "
             "synthesizing (scaling mode shares one corpus this way)",
    )
    p.add_argument(
        "--probe-gate", action="store_true",
        help="scaling mode: wait for a clean host window (pure-CPU probe) "
             "before launching; skipped windows are recorded in the JSON",
    )
    p.add_argument("--probe-max-waits", type=int, default=6)
    p.add_argument("--probe-wait-s", type=float, default=120.0)
    p.add_argument(
        "--probe-min-ceiling", type=float, default=0.9,
        help="probe gate: minimum pure-CPU N->4N ceiling to launch",
    )
    p.add_argument(
        "--probe-min-rate", type=float, default=0.55,
        help="probe gate: minimum absolute per-cpu task rate to launch "
             "(healthy windows on this host read >= ~0.6)",
    )
    p.add_argument(
        "--probe-min-membw", type=float, default=0.0,
        help="probe gate: also require the DRAM-streaming N->4N ceiling "
             ">= this (0 = don't gate on the bus; launch-adjacent samples "
             "on this host range 0.55-0.88)",
    )
    p.add_argument(
        "--membw", action="store_true",
        help="measure the DRAM streaming-bandwidth ceiling at "
             "--scaling-base-cpus vs 4x and exit (instrument only)",
    )
    args = p.parse_args()

    if args.membw:
        n = args.scaling_base_cpus
        bw_n = calibrate_membw(n)
        bw_4n = calibrate_membw(n * 4)
        out = {
            "metric": "membw_ceiling",
            "value": round((bw_4n / bw_n) / 4.0, 4) if bw_n else None,
            "unit": "fraction",
            "membw_gbps": {str(n): bw_n, str(n * 4): bw_4n},
        }
        print(json.dumps(out))
        return 0

    if args.pipeline_once:
        out = run_pipeline_once(
            args.sf_dir, args.cpus, args.mult, args.docs, args.input_path
        )
    elif args.scaling:
        out = run_scaling(
            args.sf_dir, args.scaling_base_cpus, args.mult, args.docs,
            args.repeats, probe_gate=args.probe_gate,
            probe_max_waits=args.probe_max_waits,
            probe_wait_s=args.probe_wait_s,
            probe_min_ceiling=args.probe_min_ceiling,
            probe_min_rate=args.probe_min_rate,
            probe_min_membw=args.probe_min_membw,
        )
    else:
        out = run_headline(args.sf_dir, args.cpus, args.mult, args.bench_repeats)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
