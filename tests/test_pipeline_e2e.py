"""End-to-end pipeline tests on the seeded fixture corpus — the analog of the
reference's CLI-vs-fixture integration tests (cargo-dupes/tests/report.rs).

The authoritative near-dup oracle is brute-force exact Jaccard over all
same-lang representative pairs (computed with the same normalize/shingle
code — mirroring the reference's hand-computed Dice expectations). Recall of
the LSH path against this oracle is the BASELINE.json >=0.99 gate.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cargo_dupes_spark.config import PipelineConfig
from cargo_dupes_spark.functions.shingles import jaccard_col, with_shingles
from cargo_dupes_spark.operators.exact import exact_representatives, prepare
from cargo_dupes_spark.plans.pipeline import Pipeline
from cargo_dupes_spark.sources.web_pages import generate_web_pages


def _brute_force_near_pairs(fps, cfg):
    """Oracle: all same-lang rep pairs with exact Jaccard >= threshold."""
    sh = with_shingles(
        fps.select("url", "lang", "norm_text"),
        "norm_text",
        cfg.shingle_k,
        cfg.shingle_seed,
        out="sh",
    ).drop("norm_text")
    a, b = sh.alias("a"), sh.alias("b")
    return (
        a.join(
            b,
            (F.col("a.url") < F.col("b.url"))
            & (F.col("a.lang") == F.col("b.lang")),
        )
        .select(
            F.col("a.url").alias("url_a"),
            F.col("b.url").alias("url_b"),
            jaccard_col(F.col("a.sh"), F.col("b.sh")).alias("j"),
        )
        .filter(F.col("j") >= cfg.jaccard_threshold)
    )


@pytest.fixture(scope="module")
def pipeline_run(spark, tmp_path_factory):
    wh = tmp_path_factory.mktemp("wh_e2e")
    cfg = PipelineConfig(warehouse=str(wh))
    df, corpus = generate_web_pages(spark, skew_rows=12)
    pipe = Pipeline(
        spark, cfg, detectors=("minhash", "simhash", "substring")
    )
    out = pipe.run(df)
    return cfg, df, corpus, out


def test_exact_groups_match_planted(pipeline_run):
    cfg, df, corpus, out = pipeline_run
    got_groups = (
        out["exact_memberships"]
        .groupBy("group_fp")
        .agg(F.sort_array(F.collect_list("url")).alias("members"))
        .collect()
    )
    got = {tuple(r.members) for r in got_groups}
    want = {tuple(sorted(urls)) for urls in corpus.exact_families.values()}
    # boilerplate docs are excluded by default, so planted exact families
    # are exactly the exact groups
    assert got == want


def test_near_recall_against_brute_force(spark, pipeline_run):
    """dup-pair recall >= 0.99 at identical shingle/signature config — the
    BASELINE.json gate, measured vs the exact-Jaccard oracle."""
    cfg, df, corpus, out = pipeline_run
    fps = prepare(df, cfg)
    reps = exact_representatives(fps)
    oracle = {
        (r.url_a, r.url_b)
        for r in _brute_force_near_pairs(reps, cfg).collect()
    }
    got = {
        (min(r.url_a, r.url_b), max(r.url_a, r.url_b))
        for r in out["verified_edges"].filter(F.col("tier") == "near").collect()
    }
    assert oracle, "oracle must find the planted near pairs"
    recall = len(got & oracle) / len(oracle)
    assert recall >= 0.99, f"recall {recall:.4f} < 0.99 ({len(oracle)} oracle pairs)"
    # and no false positives: every emitted edge is in the oracle (verify
    # is exact Jaccard, so the sets must match exactly)
    assert got <= oracle


def test_negative_controls_not_clustered(pipeline_run):
    cfg, df, corpus, out = pipeline_run
    near_urls = {
        r.url
        for r in out["memberships"].filter(F.col("tier") == "near").collect()
    }
    for fam, negs in corpus.near_negative.items():
        for url in negs:
            assert url not in near_urls, f"negative control clustered: {url}"


def test_cross_lang_never_pairs(pipeline_run):
    cfg, df, corpus, out = pipeline_run
    langs = {r.url: r.lang for r in df.select("url", "lang").collect()}
    for r in out["verified_edges"].collect():
        assert langs[r.url_a] == langs[r.url_b]


def test_boilerplate_excluded_by_default(pipeline_run):
    cfg, df, corpus, out = pipeline_run
    fp_urls = {r.url for r in out["fingerprints"].select("url").collect()}
    assert not fp_urls & set(corpus.boilerplate_urls)


def test_boilerplate_groups_when_included(spark, tmp_path):
    cfg = PipelineConfig(
        warehouse=str(tmp_path / "wh_bp"), exclude_boilerplate=False
    )
    df, corpus = generate_web_pages(spark)
    out = Pipeline(spark, cfg, detectors=("minhash",)).run(df)
    exact_urls = {r.url for r in out["exact_memberships"].collect()}
    # identical boilerplate pages group in the exact tier when included
    assert set(corpus.boilerplate_urls) <= exact_urls


def test_stats_consistency(pipeline_run):
    cfg, df, corpus, out = pipeline_run
    s = out["stats"].first().asDict()
    assert s["total_docs"] == out["fingerprints"].count()
    assert s["exact_docs"] == out["exact_memberships"].count()
    assert 0.0 <= s["exact_token_percent"] <= 100.0


def test_resume_skips_and_matches(spark, tmp_path):
    cfg = PipelineConfig(warehouse=str(tmp_path / "wh_resume"))
    df, _ = generate_web_pages(spark, n_unique=20, n_near_families=3)
    p1 = Pipeline(spark, cfg, detectors=("minhash",), resume=True)
    out1 = p1.run(df)
    n1 = out1["memberships"].count()
    p2 = Pipeline(spark, cfg, detectors=("minhash",), resume=True)
    out2 = p2.run(df)
    assert all(s.startswith("skip:") for s in p2.stage_log)
    assert out2["memberships"].count() == n1


def test_lineage_and_metrics_written(spark, pipeline_run):
    cfg, df, corpus, out = pipeline_run

    # the pipeline's catalog wrote lineage/metrics parquet into the warehouse
    import glob

    assert glob.glob(f"{cfg.warehouse}/lineage/*.parquet")
    assert glob.glob(f"{cfg.warehouse}/metrics/*.parquet")

    lineage = spark.read.parquet(f"{cfg.warehouse}/lineage")
    # per-partition rows: n_out sums to the summary row's total per stage
    fp = lineage.filter(F.col("stage") == "fingerprints")
    summary = fp.filter(F.col("partition_id") == -1).collect()
    assert len(summary) == 1
    parts_total = (
        fp.filter(F.col("partition_id") >= 0).agg(F.sum("n_out")).collect()[0][0]
    )
    assert summary[0]["n_out"] == parts_total == df.count()
    assert summary[0]["n_failed"] == 0  # clean corpus
    # n_in chains the previous stage's committed count
    exact_summary = lineage.filter(
        (F.col("stage") == "exact_memberships") & (F.col("partition_id") == -1)
    ).collect()[0]
    assert exact_summary["n_in"] == summary[0]["n_out"]


def test_corrupt_html_counted_in_lineage(spark, tmp_path):
    """The reference never drops a file silently (warning channel,
    lib.rs:50-66): a corrupt html row is extracted best-effort AND counted
    with an error sample in the fingerprints stage's lineage summary."""
    cfg = PipelineConfig(warehouse=str(tmp_path / "wh_corrupt"))
    df, _ = generate_web_pages(spark, n_unique=20, n_near_families=2)
    corrupt = spark.createDataFrame(
        [("http://bad.example/x", None, b"<p>broken \xff\xfe bytes</p>", None, "en")],
        df.schema,
    )
    out = Pipeline(spark, cfg, detectors=("minhash",)).run(
        df.unionByName(corrupt)
    )
    summary = (
        spark.read.parquet(f"{cfg.warehouse}/lineage")
        .filter((F.col("stage") == "fingerprints") & (F.col("partition_id") == -1))
        .collect()[0]
    )
    assert summary["n_failed"] == 1
    assert "utf8 decode" in summary["error_sample"]
    # the row itself was NOT dropped by extraction (it's in the stage output)
    fps = spark.read.parquet(f"{cfg.warehouse}/fingerprints")
    row = fps.filter(F.col("url") == "http://bad.example/x").collect()
    assert len(row) == 1 and "utf8 decode" in row[0]["extract_error"]


def test_wide_fingerprints_same_grouping(spark, tmp_path, pipeline_run):
    """fingerprint_bits=128 (the 10^12-doc upgrade path): identical group
    STRUCTURE to the 64-bit run on the fixture corpus — same member url
    sets per tier — with every fp-typed column widened to 32-char hex
    strings (exact group_fp, composite group_fp, CC cluster labels), and
    the 128-bit ignore list round-trips through the same anti-join."""
    cfg64, _, corpus, out64 = pipeline_run
    cfg = PipelineConfig(warehouse=str(tmp_path / "wh128"), fingerprint_bits=128)
    df, _ = generate_web_pages(spark, skew_rows=12)
    out = Pipeline(
        spark, cfg, detectors=("minhash", "simhash", "substring")
    ).run(df)

    def members_by_tier(memberships):
        rows = memberships.select("url", "tier", "group_fp").collect()
        out: dict[str, dict] = {}
        for r in rows:
            out.setdefault(r.tier, {}).setdefault(r.group_fp, set()).add(r.url)
        # group ids differ across widths; compare the SET of member-sets
        return {
            t: {frozenset(v) for v in groups.values()}
            for t, groups in out.items()
        }

    assert members_by_tier(out["memberships"]) == members_by_tier(
        out64["memberships"]
    )
    assert dict(out["memberships"].dtypes)["group_fp"] == "string"
    assert dict(out["fingerprints"].dtypes)["fingerprint"] == "string"
    fp = out["memberships"].first().group_fp
    assert len(fp) == 32 and int(fp, 16) >= 0

    # 128-bit ignore round-trip: ignoring one group's hex fp drops exactly
    # that group's members through the broadcast anti-join
    from cargo_dupes_spark.operators.groups import filter_ignored
    from cargo_dupes_spark.sources.catalog import Catalog
    from cargo_dupes_spark.sources.ignore import add_ignore, load_ignore

    catalog = Catalog(spark, cfg.warehouse, cfg.config_hash())
    before = out["memberships"].count()
    in_group = out["memberships"].filter(F.col("group_fp") == fp).count()
    assert add_ignore(catalog, fp, "planted 128-bit ignore")
    filtered = filter_ignored(
        out["memberships"], load_ignore(catalog, bits=128)
    )
    assert filtered.count() == before - in_group
    assert filtered.filter(F.col("group_fp") == fp).count() == 0
