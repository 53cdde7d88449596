"""Pipeline orchestration [O1/O2] — the `analyze()` stage graph.

Reference flow (``dupes-core/src/lib.rs:41-154``): read → parse → filter →
exact groups → near groups → sub-units → ignore filter → stats. Here each
stage commits its output through the Catalog (checkpoint = Iceberg snapshot
or parquet + meta sidecar) and a resumed run SKIPS stages whose output
already exists under the same config hash — the north_rule "resumes
mid-run" contract. Per-stage lineage and wall-clock metrics are appended as
they complete.

Detector composition: 'minhash' and 'simhash' are interchangeable
candidate generators for the near tier (both verified by exact Jaccard);
'substring' is its own tier with its own clustering (the reference keeps
sub-unit groups separate from near groups, lib.rs:89-118).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from ..config import PipelineConfig
from ..functions.shingles import with_shingles
from ..functions.signatures import signature_udf
from ..operators.connected_components import connected_components
from ..operators.exact import (
    apply_gates,
    exact_memberships,
    exact_representatives,
    prepare_columns,
)
from ..operators.groups import cluster_memberships, filter_ignored
from ..operators.lsh import minhash_bands, pairs_from_buckets, simhash_buckets
from ..operators.connected_components import DRIVER_CC_THRESHOLD
from ..operators.stats import assemble_stats_row, stats_totals, tier_aggregates
from ..operators.substring import substring_candidates, verify_substring_pairs
from ..operators.verify import verify_pairs
from ..schemas import CANDIDATE_PAIRS, CLUSTERS, VERIFIED_EDGES
from ..sources.catalog import Catalog
from ..sources.ignore import load_ignore

ALL_DETECTORS = ("minhash", "simhash", "substring")


class Pipeline:
    def __init__(
        self,
        spark: SparkSession,
        cfg: PipelineConfig,
        catalog: Catalog | None = None,
        detectors: tuple[str, ...] = ("minhash", "substring"),
        resume: bool = False,
    ):
        unknown = set(detectors) - set(ALL_DETECTORS)
        if unknown:
            raise ValueError(f"unknown detectors: {sorted(unknown)}")
        self.spark = spark
        self.cfg = cfg
        self.catalog = catalog or Catalog(
            spark, cfg.warehouse, cfg.config_hash()
        )
        self.detectors = detectors
        self.resume = resume
        self.stage_log: list[str] = []  # executed vs skipped, for tests
        self._prev_rows: int | None = None  # lineage n_in chain
        self.stage_rows: dict[str, int | None] = {}  # committed row counts
        self._accounting_thread = None  # concurrent flagged accounting
        self._accounting_error: BaseException | None = None

    _CHAIN = object()  # sentinel: n_in = previous stage's count

    # ------------------------------------------------------------------
    def _stage(self, name: str, build, n_in=_CHAIN) -> DataFrame:
        """Run-or-resume one stage: skip if committed under this config.

        Lineage contract (O6): per-partition n_out comes from the committed
        parquet footers (no extra job); failure totals (n_failed +
        error_sample) ride a write-time Observation over the stage's
        ``extract_error`` column when present — the reference's warning
        channel (lib.rs:50-66), computed INSIDE the write job so failure
        accounting costs zero additional Spark jobs. n_in chains the
        previous stage's committed row count by default; concurrent stages
        pass their shared upstream count explicitly (and do NOT advance the
        chain — the caller does, from whichever branch feeds the next
        serial stage).
        """
        chained = n_in is Pipeline._CHAIN
        if chained:
            n_in = self._prev_rows
        if self.resume and self.catalog.is_complete(name):
            self.stage_log.append(f"skip:{name}")
            out = self.catalog.read(name)
            self.stage_rows[name] = None
            if chained:
                self._prev_rows = None  # chain broken by skip; n_in unknown
            return out
        t0 = time.monotonic()
        # label the stage's jobs in the UI/REST metrics (guide §1.5);
        # thread-local, so concurrent stage commits stay labeled correctly
        self.spark.sparkContext.setJobDescription(f"stage:{name}")
        df = build()
        obs = None
        if "extract_error" in df.columns:
            obs = Observation()
            df = df.observe(
                obs,
                F.sum(
                    F.when(F.col("extract_error").isNotNull(), 1).otherwise(0)
                ).alias("n_failed"),
                F.max("extract_error").alias("error_sample"),
            )
        out = self.catalog.checkpoint(df, name)
        failed = obs.get if obs is not None else {}
        n_rows = self.catalog.record_lineage(
            out,
            name,
            n_in=n_in,
            n_failed=failed.get("n_failed"),
            error_sample=failed.get("error_sample"),
        )
        self.catalog.record_metrics(
            name,
            {
                "rows": n_rows,
                "wall_seconds": time.monotonic() - t0,
            },
        )
        self.spark.sparkContext.setJobDescription(None)
        self.stage_log.append(f"run:{name}")
        self.stage_rows[name] = n_rows
        if chained:
            self._prev_rows = n_rows
        return out

    def _stages_concurrent(self, *specs) -> list[DataFrame]:
        """Run INDEPENDENT stages' jobs concurrently from driver threads
        (Spark's scheduler interleaves their tasks; concurrent job
        submission is a supported pattern). The stage DAG has genuine
        branches — exact_memberships and representatives both depend only
        on fingerprints — and running them serially adds one full stage of
        fixed commit latency to the critical path per branch: pure
        non-scaling cost at every cluster size. Resume, lineage and metrics
        are per-stage as ever (both branches record the same upstream n_in);
        the n_in chain continues from the LAST spec, which by convention is
        the branch the next serial stage consumes."""
        from concurrent.futures import ThreadPoolExecutor

        upstream = self._prev_rows
        with ThreadPoolExecutor(max_workers=len(specs)) as ex:
            futs = [
                ex.submit(self._stage, name, build, upstream)
                for name, build in specs
            ]
            outs = [f.result() for f in futs]
        self._prev_rows = self.stage_rows.get(specs[-1][0])
        return outs

    def _fan_out_input(self, web_pages: DataFrame) -> DataFrame:
        """Parallelize an under-partitioned input before the fingerprints
        stage (guide §2.5: one huge unsplittable file -> repartition right
        after the read). The driver corpora arrive as a single one-row-group
        parquet file (or a lazy expansion of one), so the scan — and the
        whole normalize/fingerprint projection chained onto it — would run
        as ONE task at any core count. A well-partitioned input (the scaling
        protocol's 64-file synthetic corpus, any real multi-file table) is
        left untouched: the condition is partitions < cores, both taken
        from the session, so this is a no-op at cluster scale."""
        sc = self.spark.sparkContext
        try:
            cur = web_pages.rdd.getNumPartitions()
        except Exception:  # pragma: no cover - exotic plans; keep input as-is
            return web_pages
        if cur >= sc.defaultParallelism:
            return web_pages
        # hash on the unique url, not round-robin: keyless repartition
        # locally SORTS its input first (SPARK-23207 retry determinism),
        # which is pure serial cost inside the one upstream task this
        # helper exists to relieve; hashing a deterministic key is
        # retry-safe without the sort and spreads evenly (urls unique)
        if "url" in web_pages.columns:
            return web_pages.repartition(
                2 * sc.defaultParallelism, F.col("url")
            )
        return web_pages.repartition(2 * sc.defaultParallelism)

    # ------------------------------------------------------------------
    def run(self, web_pages: DataFrame) -> dict[str, DataFrame]:
        cfg = self.cfg
        web_pages = self._fan_out_input(web_pages)

        # checkpoint UNGATED columns, gate the materialized read: the gates
        # become parquet-scan predicates instead of forcing the normalize
        # chain to be re-evaluated per filter conjunct (see prepare_columns)
        fingerprints = apply_gates(
            self._stage("fingerprints", lambda: prepare_columns(web_pages, cfg)),
            cfg,
        )

        # exact tier and representatives are independent branches off the
        # fingerprints table — their stage commits run concurrently.
        # representatives last: the next serial stage (signatures) chains
        # its n_in from it. (J1 pre-exclusion: near/substring tiers operate
        # on one representative per distinct fingerprint, grouper.rs:100-108)
        exact, reps = self._stages_concurrent(
            ("exact_memberships", lambda: exact_memberships(fingerprints)),
            ("representatives", lambda: exact_representatives(fingerprints)),
        )

        def build_signatures() -> DataFrame:
            base = with_shingles(
                reps.select("url", "lang", "norm_text"),
                "norm_text",
                cfg.shingle_k,
                cfg.shingle_seed,
            ).drop("norm_text")
            # fused UDF: one Arrow transfer + one flatten computes both
            # sketches; simhash is always kept (verify's Hamming prefilter
            # and the interchangeable-detector contract both read it)
            sig = signature_udf(
                cfg.num_perm,
                cfg.minhash_seed,
                want_minhash="minhash" in self.detectors,
                want_simhash=True,
            )
            from ..operators.lsh import (
                minhash_band_keys_col,
                simhash_chunk_keys_col,
            )

            out = base.withColumn("_sig", sig(F.col("shingles"))).select(
                "url",
                "lang",
                "shingles",
                F.col("_sig.minhash").alias("minhash"),
                F.col("_sig.simhash").alias("simhash"),
            )
            # store the LSH keys (32+4 x 8 B) next to the sketches: the
            # candidate stage scans this table TWICE (bucket sizing + pair
            # expansion) and needs only the keys — pruning the scan to
            # band_keys instead of the 1 KB minhash column cuts its input
            # bytes ~4x at every scale
            if "minhash" in self.detectors:
                out = out.withColumn("band_keys", minhash_band_keys_col(cfg))
            # the raw minhash exists only to derive band_keys (banding reads
            # band_keys; verify reads shingles + simhash) — committing it
            # wrote ~1 KB/doc of incompressible hashes that NOTHING ever
            # read back. Dropping it cuts the signatures stage's write
            # volume ~35-40% — the stage is DRAM-bound at high core counts
            # (measured 2.89x over 4x cores at 2.24M docs), so fewer bytes
            # through the memory bus is a direct strong-scaling win, and at
            # 100 TB it is ~1 TB of storage per 10^9 docs not written.
            out = out.drop("minhash")
            return out.withColumn("chunk_keys", simhash_chunk_keys_col(cfg))

        signatures = self._stage("signatures", build_signatures)

        def build_candidates() -> DataFrame:
            # collect_flagged=True (eager PASS 1): the pipeline CONSUMES the
            # mega-bucket accounting, so the sizing aggregation must run
            # somewhere — lazy mode ran it TWICE (once as the broadcast
            # adjustment subtree inside the commit job, once on the
            # accounting thread: ~16 executor-CPU-s duplicated at bench
            # scale, REST stages 106/107), and on a saturated host the
            # duplicate contends with the commit instead of hiding under
            # it. Interleaved A/B at 400k docs: eager candidate stage
            # 2.5-2.8 s vs lazy 2.8-3.1 s, every adjacent pair. Callers
            # that DISCARD the accounting (the driver-oracle slice queries)
            # keep collect_flagged=False — for them lazy runs the sizing
            # once and saves a serial job.
            parts, flagged_parts = [], []
            if "minhash" in self.detectors:
                pairs, flagged = pairs_from_buckets(
                    minhash_bands(signatures, cfg), cfg, "near",
                    urls=signatures, collect_flagged=True,
                )
                parts.append(pairs)
                flagged_parts.append(flagged)
            if "simhash" in self.detectors:
                pairs, flagged = pairs_from_buckets(
                    simhash_buckets(signatures, cfg), cfg, "simhash",
                    urls=signatures, collect_flagged=True,
                )
                parts.append(pairs)
                flagged_parts.append(flagged)
            if "substring" in self.detectors:
                pairs, flagged = substring_candidates(
                    reps, cfg, collect_flagged=True
                )
                parts.append(pairs)
                flagged_parts.append(flagged)

            # never silent: salted and dropped mega-buckets are first-class
            # metrics (SURVEY §7.4 risk 4) — recorded from a concurrent
            # driver thread (with eager PASS 1 the rows are already local,
            # so the thread costs no Spark job; the lazy fallback below
            # keeps externally-built flagged frames working); run() joins
            # the thread (and re-raises any failure) before returning, so
            # callers always see the metric
            def _account() -> None:
                self.spark.sparkContext.setJobDescription(
                    "stage:candidate_pairs (flagged accounting)"
                )
                counts = {"salted_buckets": 0.0, "dropped_buckets": 0.0}
                for flagged in flagged_parts:
                    rows = getattr(flagged, "_cds_local_rows", None)
                    if rows is None:  # lazily-built flagged frame: one job
                        rows = flagged.select("action").collect()
                    for row in rows:
                        counts[f"{row['action']}_buckets"] += 1.0
                self.catalog.record_metrics("candidates", counts)

            import threading

            def _account_guarded() -> None:
                try:
                    _account()
                except BaseException as exc:  # pragma: no cover - loud path
                    self._accounting_error = exc

            self._accounting_thread = threading.Thread(
                target=_account_guarded, name="cds-flagged-accounting"
            )
            self._accounting_thread.start()

            if not parts:
                return self.spark.createDataFrame([], CANDIDATE_PAIRS)
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
            return out

        candidates = self._stage("candidate_pairs", build_candidates)

        def build_edges() -> DataFrame:
            parts = []
            near_detectors = {"minhash", "simhash"} & set(self.detectors)
            if near_detectors:
                near_cand = candidates.filter(
                    F.col("tier").isin("near", "simhash")
                )
                # a pair found by both detectors verifies once. With a
                # SINGLE near detector the pairs are already distinct
                # (pairs_from_buckets dedups at the nid level), so the
                # cross-detector groupBy would be a pure extra shuffle of
                # the candidate set — skip it (guide §2.4).
                if len(near_detectors) > 1:
                    near_cand = (
                        near_cand.groupBy("url_a", "url_b")
                        .agg(F.min("tier").alias("tier"))  # 'near' < 'simhash'
                    )
                parts.append(
                    verify_pairs(near_cand, signatures, cfg).withColumn(
                        "tier", F.lit("near")
                    )
                )
            if "substring" in self.detectors:
                sub_cand = candidates.filter(F.col("tier") == "substring")
                # substring edges carry span offsets (X3); near edges get
                # NULL spans via allowMissingColumns
                parts.append(verify_substring_pairs(sub_cand, reps, cfg))
            if not parts:
                return self.spark.createDataFrame([], VERIFIED_EDGES)
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p, allowMissingColumns=True)
            return out

        edges = self._stage("verified_edges", build_edges)

        # tiers with no active detector produce NO edges — running the CC
        # iteration loop and the membership joins over provably-empty frames
        # still costs real Spark jobs per tier (a measured fixed cost that
        # never scales with cores), so inactive tiers are skipped outright
        active_tiers = tuple(
            t
            for t, on in (
                ("near", {"minhash", "simhash"} & set(self.detectors)),
                ("substring", "substring" in self.detectors),
            )
            if on
        )

        def build_clusters() -> DataFrame:
            outs = []
            for tier in active_tiers:
                tier_edges = edges.filter(F.col("tier") == tier)
                outs.append(
                    connected_components(
                        tier_edges, id_bits=cfg.fingerprint_bits
                    ).withColumn("tier", F.lit(tier))
                )
            if not outs:
                return self.spark.createDataFrame([], CLUSTERS)
            out = outs[0]
            for p in outs[1:]:
                out = out.unionByName(p)
            return out

        # ------------------------------------------------------------------
        # trailing stages (clusters -> memberships -> stats) are the
        # FIXED-LATENCY regime: each processes a few MB yet costs a serial
        # Spark job at ANY core count (BASELINE.md cap #1, VERDICT r4 #2a).
        # Three structural cuts:
        #   * the stats corpus-totals aggregate depends only on fingerprints
        #     — it runs on a driver thread UNDER the clusters/memberships
        #     commits instead of serially after them;
        #   * in the small-edge regime (edge count <= the CC driver
        #     threshold, where connected_components returned a driver-backed
        #     frame and re-deriving cluster labels is two tiny joins) the
        #     clusters COMMIT runs on a thread while memberships consumes
        #     the in-memory frame — one full stage of commit latency off the
        #     critical path. Large edge sets keep the committed-read chain
        #     (re-executing a corpus-sized cluster join to dodge a parquet
        #     scan would be a bad trade at 100 TB);
        #   * stats itself becomes ONE groupBy-tier pass + a driver-side
        #     assembly (operators/stats.py) instead of the 4-branch
        #     crossJoin job. Identical row, pinned by test.
        # Resume contract unchanged: every stage still commits its table;
        # a crash between the concurrent commits resumes whichever is
        # missing (same config + inputs -> same output).
        # ------------------------------------------------------------------
        from concurrent.futures import ThreadPoolExecutor

        edges_rows = self.stage_rows.get("verified_edges")
        with ThreadPoolExecutor(max_workers=2) as ex:
            totals_fut = ex.submit(
                lambda: stats_totals(fingerprints).collect()[0]
            )

            clusters_fut = None
            if self.resume and self.catalog.is_complete("clusters"):
                clusters = self._stage("clusters", build_clusters)  # skip
                mem_clusters = clusters
            elif edges_rows is not None and edges_rows <= DRIVER_CC_THRESHOLD:
                # eager CC work happens here; localCheckpoint pins the frame
                # so its 3+ consumers (clusters commit, per-tier membership
                # joins) don't re-run the label joins per job
                mem_clusters = build_clusters().localCheckpoint(eager=False)
                clusters_fut = ex.submit(
                    self._stage, "clusters", lambda: mem_clusters, edges_rows
                )
            else:
                clusters = self._stage("clusters", build_clusters)
                mem_clusters = clusters

            def build_memberships() -> DataFrame:
                parts = [exact]
                for tier in active_tiers:
                    tier_clusters = mem_clusters.filter(
                        F.col("tier") == tier
                    ).select("url", "cluster_id")
                    tier_edges = edges.filter(F.col("tier") == tier)
                    parts.append(
                        cluster_memberships(
                            tier_clusters, tier_edges, fingerprints, tier
                        )
                    )
                out = parts[0]
                for p in parts[1:]:
                    out = out.unionByName(p)
                return filter_ignored(
                    out, load_ignore(self.catalog, bits=cfg.fingerprint_bits)
                )

            memberships = self._stage(
                "memberships", build_memberships,
                n_in=edges_rows if clusters_fut is not None else Pipeline._CHAIN,
            )
            if clusters_fut is not None:
                clusters = clusters_fut.result()
                self._prev_rows = self.stage_rows.get("memberships")

            stats = self._stage(
                "stats",
                lambda: assemble_stats_row(
                    self.spark,
                    totals_fut.result(),
                    tier_aggregates(fingerprints, memberships).collect(),
                ),
            )

        # the flagged-accounting thread (candidate_pairs stage) must land
        # before run() returns: callers read the metric right after, and a
        # failed accounting must fail the run, not vanish
        if self._accounting_thread is not None:
            self._accounting_thread.join()
            self._accounting_thread = None
            err, self._accounting_error = self._accounting_error, None
            if err is not None:
                raise err

        return {
            "fingerprints": fingerprints,
            "signatures": signatures,
            "candidate_pairs": candidates,
            "verified_edges": edges,
            "clusters": clusters,
            "exact_memberships": exact,
            "memberships": memberships,
            "stats": stats,
        }
