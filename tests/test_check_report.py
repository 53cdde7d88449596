"""CI gate thresholds + exit codes (cli.rs:304-374) and reporter output
shape (output/text.rs, output/json.rs)."""

from __future__ import annotations

import json

from cargo_dupes_spark.config import PipelineConfig
from cargo_dupes_spark.operators.exact import prepare
from cargo_dupes_spark.operators.groups import assemble_groups
from cargo_dupes_spark.operators.stats import compute_stats
from cargo_dupes_spark.plans.check import EXIT_FAILED, EXIT_PASS, run_check
from cargo_dupes_spark.plans.report import json_report, text_report
from cargo_dupes_spark.schemas import MEMBERSHIPS


def _stats(spark, fixture_corpus):
    df, _ = fixture_corpus
    cfg = PipelineConfig()
    fps = prepare(df, cfg)
    memberships = spark.createDataFrame(
        [("http://host1.example/en/e0m0", 1, "exact", 1.0),
         ("http://host2.example/en/e0m1", 1, "exact", 1.0)],
        MEMBERSHIPS,
    )
    return fps, memberships, compute_stats(fps, memberships)


def test_check_pass_and_fail(spark, fixture_corpus):
    fps, memberships, stats = _stats(spark, fixture_corpus)
    cfg = PipelineConfig()
    ok = run_check(stats, cfg)  # no thresholds configured -> pass
    assert ok.passed and ok.exit_code == EXIT_PASS

    fail = run_check(stats, cfg, max_exact_groups=0)
    assert not fail.passed and fail.exit_code == EXIT_FAILED
    assert any("exact group count" in f for f in fail.failures)

    # explicit arg overrides config (cli.rs:311-314)
    cfg2 = PipelineConfig(max_exact_groups=0)
    assert not run_check(stats, cfg2).passed
    assert run_check(stats, cfg2, max_exact_groups=10).passed


def test_reports(spark, fixture_corpus):
    fps, memberships, stats = _stats(spark, fixture_corpus)
    groups = assemble_groups(memberships, fps)
    txt = text_report(groups, stats)
    assert "Duplication Report" in txt
    assert "Exact Duplicates" in txt
    assert "Near Duplicates" not in txt  # empty sections omitted
    payload = json.loads(json_report(groups, stats))
    assert payload["stats"]["total_docs"] > 0
    assert len(payload["groups"]) == 1
    g = payload["groups"][0]
    assert g["n_members"] == 2 and len(g["fingerprint"]) == 16


def test_assembled_stats_row_equals_compute_stats(spark, fixture_corpus):
    """The fixed-latency-regime stats path (one groupBy-tier pass +
    driver-side assembly with HALF_UP rounding) must produce the EXACT row
    the reference crossJoin plan produces — schema and values."""
    from cargo_dupes_spark.operators.stats import (
        assemble_stats_row,
        stats_totals,
        tier_aggregates,
    )

    fps, memberships, stats = _stats(spark, fixture_corpus)
    assembled = assemble_stats_row(
        spark,
        stats_totals(fps).collect()[0],
        tier_aggregates(fps, memberships).collect(),
    )
    assert assembled.columns == stats.columns
    assert assembled.collect() == stats.collect()


def test_assembled_stats_row_empty_memberships(spark, fixture_corpus):
    from cargo_dupes_spark.operators.stats import (
        assemble_stats_row,
        stats_totals,
        tier_aggregates,
    )

    fps, _, _ = _stats(spark, fixture_corpus)
    empty = spark.createDataFrame([], MEMBERSHIPS)
    assembled = assemble_stats_row(
        spark,
        stats_totals(fps).collect()[0],
        tier_aggregates(fps, empty).collect(),
    )
    row = assembled.collect()[0]
    expected = compute_stats(fps, empty).collect()[0]
    assert row == expected
    assert row["exact_groups"] == 0 and row["near_token_percent"] == 0.0
