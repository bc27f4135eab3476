"""The resumable dedup pipeline DAG (SURVEY.md §3.1 Spark lifecycle).

Stage graph (each ``->`` a committed, resumable checkpoint; the exact
collapse is a slim recomputed view over ``normalized``, not a commit):

    files (Iceberg/parquet)
      -> normalized      file_id = xxhash64(repo,path,commit), sha256 invariant
      ·· exact collapse  group identical sha256 -> one representative
                         (kills quadratic LSH buckets from boilerplate BEFORE
                         they exist; the removed members rejoin via star edges)
      -> signatures      shingles (JVM) + MinHash-128 / SimHash-64 (pandas UDFs)
      -> candidate_pairs MinHash banding ∪ SimHash blocking ∪ winnowed
                         substring fingerprints (skew-capped bucket joins)
      -> verified_pairs  sha fast path / exact Jaccard (JVM) / InDel kernel
                         (gated pandas UDF); best-ratio per pair (M4 semantics)
      -> components      large-star/small-star CC + final assignment with
                         provenance (M5/M9 semantics)

Scale notes (10^12-file design):
- every stage output is partitioned/bucketable by file_id (stable hash id);
  on Iceberg the tables are bucket(file_id) so verify-joins and CC
  iterations co-locate.
- the only all-to-all exchanges are the LSH bucket joins (keyed on band
  hash, capped per bucket) and the pair-verification content join; both run
  under AQE with skew-join splitting.
- nothing ever collects to the driver except per-stage counters.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.signatures import normalize, with_fused_signatures
from ..operators.components import attach_components, connected_components
from ..operators.lsh import minhash_candidates, simhash_candidates
from ..operators.substring import substring_candidates, verify_substring_pairs
from ..operators.verify import verify_pairs
from ..sources.catalog import CheckpointCatalog
from .config import DedupConfig

__all__ = ["DedupPipeline", "recommended_session"]


def recommended_session(
    app: str = "spaczz-dedup",
    master: str = "local[32]",
    shuffle_partitions: int = 32,
) -> SparkSession:
    """SparkSession with the engine's recommended scale configuration."""
    return (
        SparkSession.builder.appName(app)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # local/small-SF tuning: stage outputs are tens of MB; the 128MB
        # default packs them into 1 read partition and serializes UDF
        # stages. openCost >= maxPartitionBytes => one file per partition.
        # (On a real cluster with TB inputs leave these at defaults.)
        .config("spark.sql.files.maxPartitionBytes", "8m")
        .config("spark.sql.files.openCostInBytes", "8m")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1024")
        # the grouped pair enumeration (operators/lsh.py) aggregates the
        # banded table into per-bucket member arrays; Spark's default
        # ObjectHashAggregate fallback threshold (128 keys per partition)
        # would immediately demote that to sort-based aggregation and
        # re-pay the sort the plan exists to avoid. Buckets are capped
        # (star tier), so per-group state is tiny; 4M keys/partition is
        # ~100MB worst case.
        .config(
            "spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
            "4000000",
        )
        # local mode: driver == executor. 16g is right for sf<=0.1 workloads;
        # a bigger heap (24g) only pays off on the 280k-file scaling corpus,
        # where GC pressure on the pair-verify join breaks wall-clock scaling
        # — and it measurably REGRESSES small/JVM-heavy queries 2-4x. So the
        # default stays 16g and the scaling harness (scripts/run_scaling.sh)
        # opts into 24g via SPARK_GRAFT_DRIVER_MEM.
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
        )
        .getOrCreate()
    )


class DedupPipeline:
    def __init__(
        self,
        spark: SparkSession,
        config: DedupConfig,
        checkpoint_root: str,
        use_iceberg: bool = False,
    ):
        self.spark = spark
        self.config = config
        self.catalog = CheckpointCatalog(spark, checkpoint_root, use_iceberg)
        self.metrics: dict[str, int | float | str] = {}
        self._input_fp = ""

    # -- stages ---------------------------------------------------------------

    @staticmethod
    def input_fingerprint(files: DataFrame) -> str:
        """Identity of the input dataset, folded into every checkpoint
        manifest: resuming with the same config but a *different* input must
        rebuild (metadata-only — file listing + per-file (size, mtime) +
        schema; for in-memory inputs the analyzed logical plan stands in
        for the file list).

        Size/mtime are included so rewriting data IN PLACE under identical
        file names (external table update, manual fixture edit) changes the
        fingerprint and forces a rebuild instead of a silent stale resume.
        Statting goes through the Hadoop FileSystem API (works for any
        scheme Spark can read); a path that cannot be statted contributes
        its name only.
        """
        import hashlib

        paths = sorted(files.inputFiles())
        if paths:
            spark = files.sparkSession
            jvm = spark.sparkContext._jvm
            hconf = spark.sparkContext._jsc.hadoopConfiguration()
            lines = []
            for p in paths:
                try:
                    jpath = jvm.org.apache.hadoop.fs.Path(p)
                    st = jpath.getFileSystem(hconf).getFileStatus(jpath)
                    lines.append(
                        f"{p}\t{st.getLen()}\t{st.getModificationTime()}"
                    )
                except Exception:
                    lines.append(p)
            basis = "\n".join(lines)
        else:
            basis = files._jdf.queryExecution().analyzed().toString()
        basis += "\n" + files.schema.simpleString()
        return hashlib.sha256(basis.encode()).hexdigest()[:16]

    def _stage(self, name: str, build, **write_kwargs) -> DataFrame:
        """Resume-or-build one checkpointed stage."""
        import time

        h = self.config.config_hash()
        cached = self.catalog.read_if_valid(name, h, self._input_fp)
        if cached is not None:
            self.metrics[f"{name}_resumed"] = 1
            return cached
        t0 = time.time()
        # label every job of this stage (guide §1.5) — eager jobs inside
        # build() (localCheckpoints) and the write job all carry the stage
        # name in the UI / REST API, which is what the profiling harness
        # groups wall time by
        self.spark.sparkContext.setJobDescription(f"stage:{name}")
        try:
            df = build()
            committed = self.catalog.write(
                name, df, h, input_fingerprint=self._input_fp, **write_kwargs
            )
        finally:
            self.spark.sparkContext.setJobDescription(None)
        manifest = self.catalog.manifest(name) or {}
        self.metrics[f"{name}_rows"] = manifest.get("rows", -1)
        self.metrics[f"{name}_sec"] = round(time.time() - t0, 2)
        return committed

    def run(self, files: DataFrame) -> DataFrame:
        """Execute (or resume) the full pipeline; returns the final
        (repo, path, commit, lang, file_id, content_sha256, component_id,
        stage provenance) assignment table."""
        cfg = self.config
        _, min_r2, _ = cfg.resolved_ratios()
        self._input_fp = self.input_fingerprint(files)

        norm = self._stage("normalized", lambda: normalize(files))

        # ---- exact collapse (sha256 groups -> representatives) -------------
        # narrow shuffle: only (sha, file_id) ever crosses the exchange;
        # content stays in place until the signature join. NOT a separate
        # checkpoint: it is a cheap slim aggregate over the committed
        # `normalized` table, recomputed on resume — one fewer commit/read
        # round-trip per run (the per-run orchestration constant is what
        # bounds scaling efficiency at small corpus sizes).
        rep_map = (
            norm.select("content_sha256", "file_id")
            .groupBy("content_sha256")
            .agg(F.min("file_id").alias("rep_id"))
        )
        with_rep = norm.select("content_sha256", "file_id").join(
            rep_map, "content_sha256"
        ).select("file_id", "rep_id")
        reps = norm.join(
            with_rep.where(F.col("file_id") == F.col("rep_id")).select("file_id"),
            "file_id",
            "left_semi",
        )
        exact_edges = (
            with_rep.where(F.col("file_id") != F.col("rep_id"))
            .select(
                F.col("rep_id").alias("a_id"),
                F.col("file_id").alias("b_id"),
                F.lit("exact").alias("stage"),
                F.lit(1.0).alias("jaccard"),
                F.lit(100).alias("edit_ratio"),
                F.lit("sha").alias("verified_by"),
            )
            # lazily persisted (r7): referenced by BOTH the CC edge union
            # and the provenance union in the components stage — computed
            # once on first use (the CC input checkpoint job), read back
            # by the stage write job
            .localCheckpoint(eager=False)
        )

        # ---- signatures -----------------------------------------------------
        def build_signatures():
            # ONE Arrow pass over content for every per-row signature
            # (shingles + winnowed fingerprints + MinHash + SimHash): a
            # single ArrowEvalPython node, so content serializes to Python
            # once, shingles cross the boundary once, the candidate stage
            # downstream is pure JVM explode/join work — and the chained
            # two-runner deadlock the composed shape could hit at scale
            # cannot form (see make_fused_signature_udf).
            #
            # Layout (r7, guide §2.3 "shuffle keys and metadata instead of
            # payloads"): the file_id repartition happens HERE, on the slim
            # input (sha + content), and the checkpoint write skips its own
            # exchange (prepartitioned=True) — previously the catalog
            # repartitioned the 3-5x fatter UDF OUTPUT (shingles + minhash
            # + fingerprints + a second copy of content: 169 MB shuffled
            # for a 31 MB corpus at bench size). `content` itself is no
            # longer checkpointed twice: the verify stages join text from
            # the committed `normalized` table instead (content_df below).
            pre = reps.select(
                "file_id", "content_sha256", "content", "n_bytes"
            ).repartition(self.spark.sparkContext.defaultParallelism, "file_id")
            return with_fused_signatures(
                pre, cfg.shingle_k, cfg.num_perm, cfg.seed,
                cfg.substring_k, cfg.substring_w, cfg.substring_min_len,
            ).select(
                "file_id", "content_sha256", "n_bytes",
                "shingles", "n_shingles", "fingerprints", "fp_positions",
                "minhash", "simhash",
            )

        signatures = self._stage(
            "signatures", build_signatures, prepartitioned=True
        )
        # slim content source for the verify stages' kernel/phase-B joins
        # (pair ids are rep ids, a subset of normalized's file_ids)
        content_df = norm.select("file_id", "content")

        # ---- candidates (three sources, ONE resumable checkpoint) ----------
        def build_candidates():
            # The three bucket sources each materialize their sized table
            # eagerly (operators/lsh.py); building them from a small thread
            # pool overlaps those independent jobs so one source's shuffle
            # tail back-fills cores for the next (guide §2.6) instead of
            # running three materializations end-to-end.
            from concurrent.futures import ThreadPoolExecutor

            def labeled(fn, *args, **kwargs):
                # job-group properties are per-Python-thread under pinned
                # thread mode, so the label must be (re)set INSIDE the
                # pool thread or the eager materialization jobs — exactly
                # where this stage's wall time goes — show unlabeled
                def run():
                    self.spark.sparkContext.setJobDescription(
                        "stage:candidate_pairs"
                    )
                    return fn(*args, **kwargs)

                return run

            with ThreadPoolExecutor(max_workers=3) as pool:
                f_mh = pool.submit(labeled(
                    minhash_candidates, signatures, cfg.bands, cfg.rows,
                    cfg.bucket_cap, dedup=False,
                ))
                f_sh = pool.submit(labeled(
                    simhash_candidates, signatures, cfg.max_hamming,
                    cfg.bucket_cap, dedup=False,
                ))
                # NOTE: substring candidates are NOT anti-joined against the
                # set-similarity candidates — a pair can band-collide in
                # MinHash (likely even at Jaccard ~0.25), fail Jaccard/edit
                # verification there, and still be a true verbatim-
                # containment duplicate that only the containment verifier
                # can accept. Both rows survive; the verified union keeps
                # the best record per pair.
                f_sub = pool.submit(labeled(
                    substring_candidates, signatures,
                    k=cfg.substring_k, w=cfg.substring_w,
                    bucket_cap=cfg.bucket_cap,
                    min_bytes=cfg.substring_min_len,
                ))
                mh, sh, sub = f_mh.result(), f_sh.result(), f_sub.result()
            # one row per (pair, source-stage); set-similarity pairs deduped
            # with minhash taking precedence (M4: union of match sources)
            sim = (
                mh.unionByName(sh)
                .groupBy("a_id", "b_id")
                .agg(F.min("stage").alias("stage"))
            )
            return sim.unionByName(sub)

        # prepartitioned: both union branches end in a hash exchange
        # ((a_id, b_id) groupBy / distinct), so the catalog's write-side
        # repartition would re-shuffle an already-laid-out table (r7:
        # fewer exchanges == fewer jobs; at bench size the stage wall is
        # job-count-bound, at scale the saved exchange is real bytes)
        candidates = self._stage(
            "candidate_pairs", build_candidates, prepartitioned=True
        )

        # ---- verification ---------------------------------------------------
        def build_verified():
            # COMPOSITION CHOICE (measured, round 6): v1 and v2 are evaluated
            # FUSED — one union job behind one write barrier — not as two
            # localCheckpoint'ed jobs. The A/B on scale4
            # (BENCH/ab_verify_composition_r6.json, interleaved min-of-2,
            # identical 127,056-row outputs): fused 143.7s vs split 159.8s at
            # local[4] (split pays two extra materialization barriers that
            # parallel execution otherwise overlaps), and fused scales 4.17x
            # (1->4 cores) vs split's 2.81x. Split's one win is the serial
            # case (449s vs 600s at local[1] — memory-pressure relief), which
            # production never runs.
            sim_cand = candidates.where(F.col("stage") != "substring")
            sub_cand = candidates.where(F.col("stage") == "substring")
            v1 = verify_pairs(
                sim_cand,
                signatures,
                min_r2=min_r2,
                jaccard_min=cfg.jaccard_min,
                jaccard_floor=cfg.jaccard_floor,
                ratio_func=cfg.ratio_func,
                content_df=content_df,
            )
            v2 = verify_substring_pairs(
                sub_cand,
                signatures,
                min_len=cfg.substring_min_len,
                # S2 semantics: edited near-containment scores like the
                # reference's partial_ratio, gated at min_r2; the
                # oracle-exact config disables it (not SQL-expressible)
                min_partial=min_r2 if cfg.substring_partial else None,
                k=cfg.substring_k,
                content_df=content_df,
            )
            allv = v1.unionByName(v2)
            # best record per pair (reference M4: keep max-ratio entry per key)
            w = Window.partitionBy("a_id", "b_id").orderBy(
                F.desc_nulls_last("edit_ratio"), F.desc_nulls_last("jaccard")
            )
            return (
                allv.withColumn("rn", F.row_number().over(w))
                .where(F.col("rn") == 1)
                .drop("rn")
            )

        # prepartitioned: the best-per-pair window establishes an
        # (a_id, b_id) hash layout right before the write
        verified = self._stage(
            "verified_pairs", build_verified, prepartitioned=True
        )

        # ---- components ------------------------------------------------------
        def build_components():
            edges = verified.select("a_id", "b_id").unionByName(
                exact_edges.select("a_id", "b_id")
            )
            labels, iters = connected_components(edges)
            self.metrics["cc_iterations"] = iters
            assigned = attach_components(
                norm.select("repo", "path", "commit", "lang", "file_id",
                            "content_sha256"),
                labels,
            )
            # provenance (M9): which stages joined this component, best ratios
            prov = (
                verified.unionByName(exact_edges)
                .select(
                    F.explode(F.array("a_id", "b_id")).alias("file_id"),
                    "stage", "jaccard", "edit_ratio",
                )
                .groupBy("file_id")
                .agg(
                    F.collect_set("stage").alias("stages"),
                    F.max("jaccard").alias("max_jaccard"),
                    F.max("edit_ratio").alias("max_edit_ratio"),
                )
            )
            return assigned.join(prov, "file_id", "left")

        # prepartitioned: the provenance left-join leaves the table hash
        # partitioned by file_id already
        return self._stage("components", build_components, prepartitioned=True)

    # -- metrics (M8) ----------------------------------------------------------

    def pair_recall(
        self, components: DataFrame, truth_pairs: DataFrame
    ) -> float:
        """Fraction of planted duplicate pairs assigned to one component.

        ``truth_pairs`` has (a_key, b_key) where key = repo\\x1f path\\x1f commit.
        """
        keyed = components.withColumn(
            "file_key",
            F.concat_ws("\x1f", "repo", "path", "commit"),
        ).select("file_key", "component_id")
        t = (
            truth_pairs.join(
                keyed.withColumnsRenamed(
                    {"file_key": "a_key", "component_id": "a_comp"}
                ),
                "a_key",
            )
            .join(
                keyed.withColumnsRenamed(
                    {"file_key": "b_key", "component_id": "b_comp"}
                ),
                "b_key",
            )
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(
                    F.when(F.col("a_comp") == F.col("b_comp"), 1).otherwise(0)
                ).alias("hit"),
            )
            .collect()[0]
        )
        n, hit = int(t["n"]), int(t["hit"] or 0)
        recall = hit / n if n else 1.0
        self.metrics["truth_pairs"] = n
        self.metrics["truth_pairs_recalled"] = hit
        self.metrics["pair_recall"] = recall
        return recall

    def pair_prf(
        self,
        components: DataFrame,
        truth_pairs: DataFrame,
        truth_components: DataFrame,
    ) -> dict[str, float]:
        """Precision/recall/F1 of predicted same-component pairs vs planted
        truth (M8 analog of the reference's ``get_ner_prf`` scoring,
        reference: ``pipeline/spaczzruler.py:50-64``).

        Recall is over the directly planted pairs; precision judges every
        predicted co-clustered pair against truth *component* co-membership
        (transitively implied pairs inside a planted cluster are correct).
        Predicted pairs are enumerated per component (bounded by the
        largest cluster).
        """
        keyed = components.withColumn(
            "file_key", F.concat_ws("\x1f", "repo", "path", "commit")
        ).select("file_key", "component_id")
        grouped = keyed.groupBy("component_id").agg(
            F.sort_array(F.collect_list("file_key")).alias("members")
        ).where(F.size("members") > 1)
        pred = grouped.select(
            F.explode(
                F.flatten(
                    F.transform(
                        "members",
                        lambda x, i: F.transform(
                            F.slice("members", i + 2, F.size("members")),
                            lambda y: F.struct(
                                x.alias("a_key"), y.alias("b_key")
                            ),
                        ),
                    )
                )
            ).alias("p")
        ).select("p.a_key", "p.b_key")
        tc = truth_components.select("file_key", "component_key")
        pred_judged = (
            pred.join(
                tc.withColumnsRenamed(
                    {"file_key": "a_key", "component_key": "a_tc"}
                ),
                "a_key",
            )
            .join(
                tc.withColumnsRenamed(
                    {"file_key": "b_key", "component_key": "b_tc"}
                ),
                "b_key",
            )
        )
        n_pred = pred.count()
        n_correct = pred_judged.where(F.col("a_tc") == F.col("b_tc")).count()
        precision = n_correct / n_pred if n_pred else 1.0
        recall = self.pair_recall(components, truth_pairs)
        f1 = (
            2 * precision * recall / (precision + recall)
            if precision + recall
            else 0.0
        )
        out = {"precision": precision, "recall": recall, "f1": f1,
               "predicted_pairs": n_pred, "correct_pairs": n_correct}
        self.metrics.update({f"pair_{k}": v for k, v in out.items()})
        return out

    def sha_invariant_holds(self, files: DataFrame, components: DataFrame) -> bool:
        """Per-row invariant: sha256(content) of the input equals the
        sha256 carried through every stage into the final assignment."""
        lhs = normalize(files).select("file_id", "content_sha256")
        mismatches = (
            lhs.join(
                components.select(
                    "file_id", F.col("content_sha256").alias("out_sha")
                ),
                "file_id",
            )
            .where(F.col("content_sha256") != F.col("out_sha"))
            .count()
        )
        missing = lhs.count() - components.count()
        self.metrics["sha_mismatches"] = mismatches
        self.metrics["rows_missing"] = missing
        return mismatches == 0 and missing == 0
