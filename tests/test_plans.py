"""Physical-plan shape assertions — the scale contract, pinned.

The correctness suite proves the operators compute the right rows; these
tests pin the properties that make them survive a 100x scale-up (SURVEY §4):
gates must reach the parquet scan as pushed filters, the ignore anti-join
must broadcast its tiny side, the candidate stage must scan only the 8-byte
band keys (never the KB-scale minhash/shingle payloads), and no composed
dedup plan may degrade to a cartesian/nested-loop join. Plan regressions
that keep answers right but shapes wrong fail HERE, not at 100 TB.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from cargo_dupes_spark.operators.exact import apply_gates, prepare_columns
from cargo_dupes_spark.operators.groups import filter_ignored
from cargo_dupes_spark.operators.lsh import minhash_bands, pairs_from_buckets
from cargo_dupes_spark.operators.verify import verify_pairs


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_gates_push_into_parquet_scan(spark, tmp_path, tmp_cfg, fixture_corpus):
    """apply_gates over the materialized fingerprints checkpoint must land
    in the scan's PushedFilters (the pipeline's gate-after-checkpoint
    design, operators/exact.py:35-46) — not as a post-scan Filter only."""
    df, _ = fixture_corpus
    path = str(tmp_path / "fps")
    prepare_columns(df, tmp_cfg).write.mode("overwrite").parquet(path)
    gated = apply_gates(spark.read.parquet(path), tmp_cfg)
    plan = _plan(gated)
    pushed = plan.split("PushedFilters:", 1)
    assert len(pushed) == 2, plan
    head = pushed[1][:400]
    assert "n_tokens" in head and "GreaterThanOrEqual" in head, head
    assert gated.count() > 0


def test_candidate_band_scan_prunes_heavy_columns(spark, tmp_path, tmp_cfg):
    """minhash_bands over a parquet signatures table must read ONLY
    (url, band_keys) — the 1 KB minhash and the shingle arrays must be
    pruned out of ReadSchema (operators/lsh.py:57-72; the candidate stage
    scans this table twice, so an unpruned scan doubles its IO)."""
    rows = [
        ("u%d" % i, list(range(i, i + 8)), [i] * 4, i * 7, [i, i + 1])
        for i in range(20)
    ]
    spark.createDataFrame(
        rows, "url string, shingles array<bigint>, minhash array<bigint>, "
        "simhash bigint, band_keys array<bigint>"
    ).write.mode("overwrite").parquet(str(tmp_path / "sigs"))
    bands = minhash_bands(spark.read.parquet(str(tmp_path / "sigs")), tmp_cfg)
    plan = _plan(bands)
    schema_part = plan.split("ReadSchema:", 1)
    assert len(schema_part) == 2, plan
    head = schema_part[1].splitlines()[0]
    assert "band_keys" in head and "url" in head, head
    assert "minhash" not in head and "shingles" not in head, head


def test_ignore_anti_join_broadcasts(spark):
    """filter_ignored must be a broadcast LEFT ANTI join — the big
    memberships side must not shuffle for a tiny ignore list
    (operators/groups.py:94-110)."""
    memberships = spark.range(0, 1000).select(
        (F.col("id") % 37).alias("group_fp"),
        F.concat(F.lit("u"), F.col("id")).alias("url"),
    )
    ignore = spark.createDataFrame(
        [(3, "known"), (11, "known")], "fingerprint bigint, reason string"
    )
    out = filter_ignored(memberships, ignore)
    plan = _plan(out)
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert out.count() < 1000


def test_candidate_verify_plan_has_no_cartesian(spark, tmp_cfg):
    """The composed candidate→verify plan (the near tier's whole join
    topology) must contain no CartesianProduct / BroadcastNestedLoopJoin —
    every join is an equi-join by construction (lsh.py, verify.py)."""
    docs = [("u%d" % i, list(range(i % 5, i % 5 + 10))) for i in range(30)]
    sigs = spark.createDataFrame(
        docs, "url string, shingles array<bigint>"
    ).withColumn("simhash", F.lit(0))
    bucketed = sigs.select(
        "url",
        F.lit(0).alias("band_id"),
        F.xxhash64(F.col("shingles")[0]).alias("band_key"),
    )
    pairs, _ = pairs_from_buckets(bucketed, tmp_cfg, "near", urls=sigs)
    verified = verify_pairs(pairs, sigs, tmp_cfg)
    for plan in (_plan(pairs), _plan(verified)):
        assert "CartesianProduct" not in plan, plan
        assert "BroadcastNestedLoopJoin" not in plan, plan
    # and the plan actually executes: same-bucket docs verify as dups
    assert verified.count() > 0


def test_verify_joins_signatures_once(spark, tmp_cfg):
    """verify_pairs must shuffle the heavy shingle payload through exactly
    ONE join (the round-4 restructure: pairs explode to light (pair, nid,
    side) rows -> one inner join on signatures -> groupBy reassembly). The
    former two-aliased-join shape scanned the signatures table twice and
    moved the array bytes through two exchanges — the measured cause of
    verified_edges scaling 1.4-1.9x instead of ~3x (BASELINE.md round 4).
    A regression back to per-side joins doubles both and fails here."""
    pairs = spark.createDataFrame(
        [("u1", "u2", "near"), ("u1", "u3", "near")],
        "url_a string, url_b string, tier string",
    )
    sigs = spark.createDataFrame(
        [("u%d" % i, list(range(10)), 0) for i in range(1, 4)],
        "url string, shingles array<bigint>, simhash bigint",
    )
    plan = _plan(verify_pairs(pairs, sigs, tmp_cfg))
    assert "CartesianProduct" not in plan, plan
    assert "NestedLoopJoin" not in plan, plan
    # exactly one equi-join node in the whole verify subplan (each physical
    # operator appears once in executedPlan().toString())
    join_nodes = re.findall(
        r"\b(SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin)\b", plan
    )
    assert len(join_nodes) == 1, plan


def test_ann_rerank_joins_embeddings_once(spark):
    """The ANN re-rank must shuffle the vector payload through exactly ONE
    join (_pair_vectors — the verify_pairs restructure applied to the
    embedding tiers): the former shape joined the embeddings table twice
    (qv + cv aliases), scanning it twice and moving the vectors through two
    exchanges, and the top-k variant additionally scored every cosine twice
    by directing pairs before the join. A regression fails here."""
    from cargo_dupes_spark.operators.similarity import _pair_vectors

    pairs = spark.createDataFrame(
        [(1, 2), (1, 3)], "nid_a bigint, nid_b bigint"
    )
    emb = spark.createDataFrame(
        [(i, [float(i)] * 4) for i in range(1, 4)],
        "vec_id bigint, embedding array<double>",
    )
    out = _pair_vectors(pairs, emb, "vec_id", "embedding")
    plan = _plan(out)
    assert "CartesianProduct" not in plan, plan
    assert "NestedLoopJoin" not in plan, plan
    join_nodes = re.findall(
        r"\b(SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin)\b", plan
    )
    assert len(join_nodes) == 1, plan
    rows = {(r.nid_a, r.nid_b) for r in out.collect()}
    assert rows == {(1, 2), (1, 3)}


def test_substring_verify_joins_texts_once(spark, tmp_cfg):
    """verify_substring_pairs must shuffle norm_text — the heaviest payload
    in the pipeline (full document text) — through exactly ONE join: the
    same explode/reassemble restructure as verify_pairs. The former shape
    joined the fingerprints table twice (text_a + text_b aliases)."""
    from cargo_dupes_spark.operators.substring import verify_substring_pairs

    pairs = spark.createDataFrame(
        [("u1", "u2", "substring")], "url_a string, url_b string, tier string"
    )
    text_a = "the quick brown fox jumps over the lazy dog " * 4
    fps = spark.createDataFrame(
        # u2 is a 100-char contiguous substring of u1 (> min_substring_len)
        [("u1", text_a), ("u2", "zz " + text_a[10:110] + " yy")],
        "url string, norm_text string",
    )
    out = verify_substring_pairs(pairs, fps, tmp_cfg)
    plan = _plan(out)
    assert "CartesianProduct" not in plan, plan
    assert "NestedLoopJoin" not in plan, plan
    join_nodes = re.findall(
        r"\b(SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin)\b", plan
    )
    assert len(join_nodes) == 1, plan
    assert out.count() == 1
