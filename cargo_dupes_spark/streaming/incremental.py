"""Structured Streaming ingest: incremental dedup of arriving web pages.

The reference is a batch CLI (one ``analyze()`` per invocation,
``dupes-core/src/lib.rs:41-70``); a 100 TB training-data pipeline instead
sees web pages ARRIVE (new WARC drops land as files in a table location) and
must dedup each increment against everything already ingested without
re-scanning the corpus. This module is that incremental path:

  * ``read_web_pages_stream`` — file-source ``readStream`` over the same
    WEB_PAGES schema the batch pipeline uses (on a real cluster: Iceberg /
    Kafka source, identical downstream code).
  * ``incremental_exact_dedup`` — foreachBatch: fingerprint the micro-batch
    (the batch tier's own prepare_columns UDFs), probe the accumulated
    fingerprint state table for hits, append new fingerprints to state and
    dup memberships to the output table. State lives in the Catalog
    (Iceberg/parquet), NOT in executor memory: state size is
    corpus-bounded, so it belongs in a table joined per-batch. The state
    table is PARTITIONED by fp_bucket = pmod(fingerprint, N)
    (cfg.stream_fp_buckets): the probe reads only the partitions the
    batch's own fingerprints can live in (``pruned_state`` — partition
    pruning, not a full-state scan), so per-batch probe IO is bounded by
    |batch's buckets| / N of the state, not O(corpus).
  * ``windowed_doc_stats`` — watermark + windowed aggregation (late-data
    tolerant ingest monitoring: docs/tokens per lang per window).

Exactly-once notes: the streaming checkpoint (``checkpointLocation``) makes
the file source replay a failed batch; the state/membership appends are
at-least-once under replay. Replays are no-ops by construction: a replayed
batch's first-seen urls are already in state, so (a) the self-match filter
(url != matched_url) keeps them out of the dup stream and (b) the anti-join
against state keeps them out of the state append — the re-append is
provably EMPTY, so state stays one row per url without any read-time window
dedup. Residual insurance (a crash between the two appends re-committing
identical rows) is a full-row dropDuplicates at read: replayed rows carry
the SAME batch_id, so duplicates are exact-row duplicates and the dedup is
deterministic. ``load_stream_dups`` likewise dedups on (url, matched_url).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import PipelineConfig
from ..operators.exact import apply_gates, prepare_columns
from ..schemas import WEB_PAGES
from ..sources.catalog import Catalog

STATE_TABLE = "stream_fps"
DUPS_TABLE = "stream_dups"


def read_web_pages_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    """File-source stream of web_pages parquet drops (schema fixed, never
    inferred — a corrupt drop fails loudly instead of widening the schema).

    maxFilesPerTrigger bounds micro-batch size so one giant WARC drop cannot
    blow executor memory; at real scale this is the knob that shapes
    batch-size vs latency.
    """
    return (
        spark.readStream.schema(WEB_PAGES)
        .option("maxFilesPerTrigger", 64)
        .parquet(input_dir)
    )


def _fingerprint_batch(batch: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """Micro-batch -> (url, fingerprint, n_tokens): the batch tier's own
    normalize/fingerprint UDFs (byte-identical norm_text contract), gated
    the same way so boilerplate/tiny docs never enter dedup state."""
    return apply_gates(prepare_columns(batch, cfg), cfg).select(
        "url", "fingerprint", "n_tokens"
    )


def incremental_exact_dedup(
    stream: DataFrame,
    catalog: Catalog,
    cfg: PipelineConfig,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Start the incremental exact-dedup query; returns the StreamingQuery.

    Per micro-batch (foreachBatch — the sink is two table appends, which is
    not expressible as a single streaming sink):
      1. fingerprint the batch with the batch-tier UDFs,
      2. hits against STATE = rows whose fingerprint already exists in
         ``stream_fps`` (earlier batches) -> appended to ``stream_dups``
         with the earliest known url as ``matched_url``,
      3. in-batch dups (same fp arriving twice in one batch) -> also dups,
         matched to the batch's own first-seen url,
      4. batch's first-seen (url, fp) rows appended to ``stream_fps``.

    With ``available_now`` the query drains everything currently in the
    directory and stops — the deterministic test/backfill mode; without it
    the query runs continuously (production tail -f of the drop dir).
    """
    spark = stream.sparkSession

    def _process(batch: DataFrame, batch_id: int) -> None:
        # localCheckpoint: the fingerprint UDF chain is referenced by four
        # downstream plans (first-seen, dups, state probe, bucket collect) —
        # materialize the batch-sized frame once instead of re-normalizing
        # the batch per consumer
        fps = _fingerprint_batch(batch, cfg).localCheckpoint()
        # one canonical row per fp within the batch (earliest url wins,
        # deterministic ordering)
        in_batch_first = fps.groupBy("fingerprint").agg(
            F.min("url").alias("first_url")
        )
        state_exists = catalog.exists(STATE_TABLE)
        if state_exists:
            # the fp partitions this batch can possibly hit — bounded by
            # min(|batch distinct fps|, stream_fp_buckets), tiny driver-side
            batch_buckets = [
                r[0]
                for r in in_batch_first.select(
                    _fp_bucket_col(cfg)
                ).distinct().collect()
            ]
            state = pruned_state(catalog, cfg, batch_buckets).select(
                "fingerprint", F.col("url").alias("state_url")
            )
            # earliest prior owner per fp (state holds one row per fp;
            # min() is cheap insurance against partial-commit residue)
            state_first = state.groupBy("fingerprint").agg(
                F.min("state_url").alias("matched_url")
            )
        else:
            state_first = None

        # in-batch dups: same fp, not the batch's first-seen url
        dups = fps.join(in_batch_first, "fingerprint").filter(
            F.col("url") != F.col("first_url")
        ).select("fingerprint", "url", F.col("first_url").alias("matched_url"))

        new_fps = fps.join(in_batch_first, "fingerprint").filter(
            F.col("url") == F.col("first_url")
        ).select("url", "fingerprint", "n_tokens")

        if state_first is not None:
            # url != matched_url: a batch REPLAYED after a crash (state
            # append committed, streaming checkpoint not) finds its own
            # first-seen urls in state — without the filter each would be
            # recorded as a duplicate of itself
            hits = (
                new_fps.join(state_first, "fingerprint", "inner")
                .filter(F.col("url") != F.col("matched_url"))
                .select("fingerprint", "url", "matched_url")
            )
            dups = dups.unionByName(hits)
            new_fps = new_fps.join(
                state_first.select("fingerprint"), "fingerprint", "left_anti"
            )

        batch_col = F.lit(int(batch_id)).alias("batch_id")
        catalog.append(
            new_fps.select(
                "url", "fingerprint", "n_tokens", batch_col, _fp_bucket_col(cfg)
            ),
            STATE_TABLE,
            partition_by=["fp_bucket"],
        )
        catalog.append(
            dups.select("fingerprint", "url", "matched_url", batch_col),
            DUPS_TABLE,
        )

    writer = (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _fp_bucket_col(cfg: PipelineConfig):
    # pmod over a re-hash (not the raw fp) so the SAME expression buckets
    # 64-bit BIGINT and 128-bit hex-string fingerprints alike
    return (
        F.pmod(F.xxhash64("fingerprint"), F.lit(cfg.stream_fp_buckets))
        .cast("int")
        .alias("fp_bucket")
    )


def pruned_state(
    catalog: Catalog, cfg: PipelineConfig, buckets: list[int]
) -> DataFrame:
    """State rows living in the given fp_bucket partitions — the isin filter
    lands as a PartitionFilter on the scan (hive layout under the parquet
    fallback, identity partition spec under Iceberg), so every other
    partition's files are never opened. This is what keeps the per-batch
    probe O(|batch's buckets| / N of state) instead of O(state)."""
    return catalog.read(STATE_TABLE).filter(
        F.col("fp_bucket").isin([int(b) for b in buckets])
    )


def load_stream_state(catalog: Catalog) -> DataFrame:
    """Accumulated (url, fingerprint, n_tokens, batch_id, fp_bucket) state.

    Replays re-append NOTHING (the probe anti-join sees the first commit's
    rows — module docstring), so this is a plain read; the full-row
    dropDuplicates only defends against a crash between the state and dup
    appends re-committing identical rows (same batch_id -> exact-row dups,
    deterministic dedup). No window, no sort — an O(state) shuffle-free
    hash-dedup instead of the previous row_number over the entire table."""
    return catalog.read(STATE_TABLE).dropDuplicates()


def load_stream_dups(catalog: Catalog) -> DataFrame:
    """Detected duplicate arrivals, replay-safe (one row per url+match)."""
    if not catalog.exists(DUPS_TABLE):
        from pyspark.sql import types as T

        schema = T.StructType(
            [
                T.StructField("fingerprint", T.LongType()),
                T.StructField("url", T.StringType()),
                T.StructField("matched_url", T.StringType()),
                T.StructField("batch_id", T.LongType()),
            ]
        )
        return catalog.spark.createDataFrame([], schema)
    return catalog.read(DUPS_TABLE).dropDuplicates(["url", "matched_url"])


def windowed_doc_stats(
    stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "15 minutes",
) -> DataFrame:
    """Watermarked windowed ingest stats: docs + token-ish volume per
    (event-time window, lang). Late pages inside the watermark update their
    window; older ones are dropped by the engine (bounded state — the whole
    point of the watermark at 10^12-doc scale).
    """
    return (
        stream.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length("text")).alias("n_chars"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "lang",
            "n_docs",
            "n_chars",
        )
    )
