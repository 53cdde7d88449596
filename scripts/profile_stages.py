#!/usr/bin/env python
"""Stage micro-profiler: time signature-stage sub-parts at a parallelism level.

Usage: python scripts/profile_stages.py --cpus 32 --docs 300000
Materializes the synthetic corpus to parquet first (gen cost excluded), then
times each sub-plan with a noop write.
"""
import argparse
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cpus", type=int, default=32)
    p.add_argument("--docs", type=int, default=300000)
    args = p.parse_args()

    from pyspark.sql import functions as F

    from cargo_dupes_spark.config import PipelineConfig
    from cargo_dupes_spark.functions.shingles import with_shingles
    from cargo_dupes_spark.functions.signatures import signature_udf
    from cargo_dupes_spark.operators.exact import prepare_columns
    from cargo_dupes_spark.session import build_session
    from cargo_dupes_spark.sources.web_pages import synthetic_web_pages_at_scale

    cfg = PipelineConfig()
    tmp = tempfile.mkdtemp(prefix=f"prof_{args.cpus}_")
    spark = build_session(app_name="profile", parallelism=args.cpus,
                          shuffle_partitions=max(args.cpus, 8))
    timings = {}

    def bench(name, df):
        t0 = time.monotonic()
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.monotonic() - t0, 2)
        print(f"  {name}: {timings[name]}s", file=sys.stderr)

    try:
        web = synthetic_web_pages_at_scale(
            spark, args.docs, num_partitions=64,
            min_doc_tokens=140, token_spread=120)
        t0 = time.monotonic()
        web.write.mode("overwrite").parquet(f"{tmp}/web")
        timings["gen_write"] = round(time.monotonic() - t0, 2)
        web = spark.read.parquet(f"{tmp}/web")

        bench("read_only", web)
        prepared = prepare_columns(web, cfg)
        bench("prepare_columns", prepared)
        t0 = time.monotonic()
        prepared.write.mode("overwrite").parquet(f"{tmp}/prepared")
        timings["prepared_write"] = round(time.monotonic() - t0, 2)
        prepared = spark.read.parquet(f"{tmp}/prepared")

        sh = with_shingles(
            prepared.select("url", "lang", "norm_text"),
            "norm_text", cfg.shingle_k, cfg.shingle_seed,
        ).drop("norm_text")
        bench("shingles_only", sh)
        t0 = time.monotonic()
        sh.write.mode("overwrite").parquet(f"{tmp}/sh")
        timings["shingles_write"] = round(time.monotonic() - t0, 2)
        shp = spark.read.parquet(f"{tmp}/sh")

        sig = signature_udf(cfg.num_perm, cfg.minhash_seed)
        bench("fused_sig_from_parquet", shp.withColumn(
            "_sig", sig(F.col("shingles"))).select(
            "url", F.col("_sig.minhash"), F.col("_sig.simhash")))
        # the full signature plan as the pipeline builds it
        full = sh.withColumn("_sig", sig(F.col("shingles"))).select(
            "url", "lang", "shingles",
            F.col("_sig.minhash").alias("minhash"),
            F.col("_sig.simhash").alias("simhash"))
        bench("full_sig_plan", full)
        t0 = time.monotonic()
        full.write.mode("overwrite").parquet(f"{tmp}/sig")
        timings["sig_write"] = round(time.monotonic() - t0, 2)
        print(json.dumps({"cpus": args.cpus, "docs": args.docs, **timings}))
    finally:
        spark.stop()
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
