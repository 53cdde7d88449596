"""Structured Streaming incremental dedup: two arrival waves, cross-wave
exact-dup detection against accumulated state, checkpoint-based resume (the
second query run must NOT reprocess wave-1 files), and watermarked windowed
ingest stats."""

from __future__ import annotations

import datetime as dt

import pytest

from cargo_dupes_spark.config import PipelineConfig
from cargo_dupes_spark.schemas import WEB_PAGES
from cargo_dupes_spark.sources.catalog import Catalog
from cargo_dupes_spark.streaming.incremental import (
    incremental_exact_dedup,
    load_stream_dups,
    load_stream_state,
    read_web_pages_stream,
    windowed_doc_stats,
)

TS = dt.datetime(2026, 1, 1, 12, 0, 0)


def _pages(spark, rows):
    data = [
        (url, ts, None, text, lang) for (url, ts, text, lang) in rows
    ]
    return spark.createDataFrame(data, WEB_PAGES)


WAVE1 = [
    ("http://a.example/1", TS, "alpha beta gamma delta epsilon zeta one", "en"),
    ("http://a.example/2", TS, "alpha beta gamma delta epsilon zeta one", "en"),
    ("http://a.example/3", TS, "totally different content words here now two", "en"),
]
WAVE2 = [
    # byte-identical to wave-1 url /1 -> cross-wave dup
    ("http://b.example/9", TS, "alpha beta gamma delta epsilon zeta one", "en"),
    ("http://b.example/10", TS, "fresh new never seen text in wave two", "en"),
]


@pytest.fixture()
def stream_env(spark, tmp_path):
    cfg = PipelineConfig(warehouse=str(tmp_path / "wh"))
    catalog = Catalog(spark, cfg.warehouse, cfg.config_hash())
    drop_dir = tmp_path / "drops"
    drop_dir.mkdir()
    ckpt = str(tmp_path / "ckpt")
    return cfg, catalog, str(drop_dir), ckpt


def _drain(stream_df, catalog, cfg, ckpt):
    q = incremental_exact_dedup(stream_df, catalog, cfg, ckpt)
    q.awaitTermination(120)
    assert not q.isActive


def test_incremental_dedup_two_waves(spark, stream_env):
    cfg, catalog, drop_dir, ckpt = stream_env

    _pages(spark, WAVE1).coalesce(1).write.mode("append").parquet(drop_dir)
    _drain(read_web_pages_stream(spark, drop_dir), catalog, cfg, ckpt)

    state1 = {r.url for r in load_stream_state(catalog).collect()}
    dups1 = {(r.url, r.matched_url) for r in load_stream_dups(catalog).collect()}
    # in-batch dup: /2 matched to /1 (earliest url); state holds one row per fp
    assert state1 == {"http://a.example/1", "http://a.example/3"}
    assert dups1 == {("http://a.example/2", "http://a.example/1")}

    _pages(spark, WAVE2).coalesce(1).write.mode("append").parquet(drop_dir)
    _drain(read_web_pages_stream(spark, drop_dir), catalog, cfg, ckpt)

    state2 = {r.url for r in load_stream_state(catalog).collect()}
    dups2 = {(r.url, r.matched_url) for r in load_stream_dups(catalog).collect()}
    # cross-wave dup detected against state; only the genuinely new doc
    # entered state; wave-1 rows were NOT reprocessed (their dup row count
    # is unchanged — checkpoint resume skipped the already-read file)
    assert state2 == state1 | {"http://b.example/10"}
    assert dups2 == dups1 | {("http://b.example/9", "http://a.example/1")}
    # replay-safety: state reader collapses to one row per url
    assert load_stream_state(catalog).count() == 3


def test_replayed_batch_is_noop(spark, stream_env, tmp_path):
    """Crash-replay contract: state appends committed but the streaming
    checkpoint lost -> the same files replay as a fresh batch against the
    committed state. The replay must append nothing to state and record no
    self-duplicates (url == matched_url)."""
    cfg, catalog, drop_dir, ckpt = stream_env
    _pages(spark, WAVE1).coalesce(1).write.mode("append").parquet(drop_dir)
    _drain(read_web_pages_stream(spark, drop_dir), catalog, cfg, ckpt)
    state1 = sorted(
        (r.url, r.fingerprint) for r in load_stream_state(catalog).collect()
    )
    dups1 = {(r.url, r.matched_url) for r in load_stream_dups(catalog).collect()}

    # replay: fresh checkpoint dir, same drops, same committed state
    _drain(
        read_web_pages_stream(spark, drop_dir), catalog, cfg,
        str(tmp_path / "ckpt_replay"),
    )
    state2 = sorted(
        (r.url, r.fingerprint) for r in load_stream_state(catalog).collect()
    )
    dups2 = {(r.url, r.matched_url) for r in load_stream_dups(catalog).collect()}
    assert state2 == state1
    assert dups2 == dups1
    assert all(u != m for u, m in dups2)


def test_state_probe_prunes_partitions(spark, stream_env):
    """The state probe must read only the fp_bucket partitions the batch
    can hit: the isin filter lands as a PartitionFilter on the parquet scan
    (the VERDICT's plan assertion) and the scan's file set is confined to
    the probed bucket directories."""
    from cargo_dupes_spark.streaming.incremental import pruned_state

    cfg, catalog, drop_dir, ckpt = stream_env
    _pages(spark, WAVE1).coalesce(1).write.mode("append").parquet(drop_dir)
    _drain(read_web_pages_stream(spark, drop_dir), catalog, cfg, ckpt)

    buckets = sorted({r.fp_bucket for r in load_stream_state(catalog).collect()})
    assert len(buckets) == 2  # two distinct fps in wave 1
    probe = pruned_state(catalog, cfg, buckets[:1])
    plan = probe._jdf.queryExecution().executedPlan().toString()
    parts = plan.split("PartitionFilters:", 1)
    assert len(parts) == 2 and "fp_bucket" in parts[1][:300], plan
    # and the pruned read returns exactly the probed bucket's rows
    got = {r.fp_bucket for r in probe.collect()}
    assert got == set(buckets[:1])


def test_cli_stream_subcommand(spark, stream_env, tmp_path):
    """`cli stream <dir>` drains available drops in a fresh process and
    reports the duplicate-arrival count (wiring test for the O3 surface)."""
    import subprocess
    import sys

    cfg, _, drop_dir, _ = stream_env
    _pages(spark, WAVE1).coalesce(1).write.mode("append").parquet(drop_dir)
    proc = subprocess.run(
        [
            sys.executable, "-m", "cargo_dupes_spark.cli",
            "--warehouse", cfg.warehouse,
            "--parallelism", "4",
            "stream", drop_dir,
        ],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "1 duplicate arrivals recorded" in proc.stdout


def test_windowed_doc_stats(spark, stream_env):
    _, _, drop_dir, ckpt = stream_env
    rows = [
        ("u1", dt.datetime(2026, 1, 1, 12, 5), "aa bb cc dd ee ff", "en"),
        ("u2", dt.datetime(2026, 1, 1, 12, 40), "gg hh ii jj kk ll", "en"),
        ("u3", dt.datetime(2026, 1, 1, 13, 10), "mm nn oo pp qq rr", "de"),
    ]
    _pages(spark, rows).coalesce(1).write.mode("append").parquet(drop_dir)

    out = windowed_doc_stats(read_web_pages_stream(spark, drop_dir))
    q = (
        out.writeStream.format("memory")
        .queryName("win_stats")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.window_start.hour, r.lang): r.n_docs
        for r in spark.table("win_stats").collect()
    }
    assert got == {(12, "en"): 2, (13, "de"): 1}
