"""Incremental (streaming) near-duplicate detection.

The reference is strictly batch (one Doc per call); the engine's streaming
analog answers "a new batch of files arrived — which are duplicates of the
existing corpus (or of each other)?" without recomputing the corpus:

- the **signature store** (checkpointed signatures table) is the streaming
  state; it only ever appends.
- each micro-batch runs inside ``foreachBatch``: normalize -> exact-dup
  probe (sha join against the store) -> signatures -> LSH bucket join
  against store + within-batch -> exact verify -> append verified pairs and
  the batch's signatures.

This is the Iceberg incremental-read pattern (new snapshot -> process delta)
expressed with Structured Streaming's file source in the sandbox. State is
bounded by the signature store, not executor memory — no
``applyInPandasWithState`` needed because the join state is a table, which
is what survives at 10^12-file scale.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.signatures import normalize, with_fused_signatures
from ..operators.lsh import minhash_candidates
from ..operators.verify import verify_pairs
from ..plans.config import DedupConfig

__all__ = ["IncrementalDedup"]


class IncrementalDedup:
    """foreachBatch incremental dedup against an append-only signature store."""

    def __init__(self, spark: SparkSession, config: DedupConfig, store_root: str):
        self.spark = spark
        self.config = config
        self.store_root = store_root
        self.sig_path = os.path.join(store_root, "signatures")
        self.pairs_path = os.path.join(store_root, "verified_pairs")
        os.makedirs(store_root, exist_ok=True)

    # -- state ---------------------------------------------------------------
    def _existing_signatures(self) -> DataFrame | None:
        try:
            return self.spark.read.parquet(self.sig_path)
        except Exception:
            return None

    def _signature_cols(self, files: DataFrame) -> DataFrame:
        cfg = self.config
        # fused single-pass signature UDF — same kernels (bit-identical
        # signatures) as the batch pipeline, one ArrowEvalPython node
        return with_fused_signatures(
            normalize(files), cfg.shingle_k, cfg.num_perm, cfg.seed
        ).select(
            "file_id", "content_sha256", "content", "n_bytes",
            "shingles", "n_shingles", "minhash", "simhash",
        )

    # -- core ----------------------------------------------------------------
    def process_batch(self, batch: DataFrame, batch_id: int = 0) -> DataFrame:
        """Process one micro-batch of new files; returns new verified pairs."""
        cfg = self.config
        _, min_r2, _ = cfg.resolved_ratios()
        # materialized once (r7): referenced by the candidate join, the
        # verify joins, the new-id semi-join and the final append — each
        # reference re-ran the Arrow signature UDF over the batch (the
        # nondeterministic marker blocks subtree reuse)
        new_sigs = self._signature_cols(batch).localCheckpoint()
        existing = self._existing_signatures()
        corpus = (
            new_sigs if existing is None else existing.unionByName(new_sigs)
        )
        # candidates restricted to pairs touching the new batch: bucket join
        # over the union, then semi-join on new file ids.
        new_ids = new_sigs.select("file_id").distinct()
        cand = minhash_candidates(
            corpus, cfg.bands, cfg.rows, cfg.bucket_cap
        )
        touching = cand.join(
            new_ids.withColumnsRenamed({"file_id": "a_id"}), "a_id", "left_semi"
        ).unionByName(
            cand.join(
                new_ids.withColumnsRenamed({"file_id": "b_id"}), "b_id",
                "left_semi",
            )
        ).distinct()
        verified = verify_pairs(
            touching, corpus,
            min_r2=min_r2, jaccard_min=cfg.jaccard_min,
            jaccard_floor=cfg.jaccard_floor, ratio_func=cfg.ratio_func,
        )
        # Materialize `verified` BEFORE appending the batch signatures:
        # `corpus` lazily reads sig_path, so appending first double-counts
        # the batch if the parquet read re-lists files (task retry, metadata
        # refresh) — the join would then see each new file on both sides.
        verified = verified.localCheckpoint()
        # append state + results
        verified.write.mode("append").parquet(self.pairs_path)
        new_sigs.write.mode("append").parquet(self.sig_path)
        return verified

    # -- streaming wiring ------------------------------------------------------
    def start(self, input_path: str, schema, checkpoint: str, **reader_opts):
        """Start a file-source stream over ``input_path`` (new parquet files
        are micro-batches) feeding :meth:`process_batch`."""
        stream = (
            self.spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", reader_opts.pop("maxFilesPerTrigger", 4))
            .parquet(input_path)
        )
        return (
            stream.writeStream.foreachBatch(
                lambda df, bid: self.process_batch(df, bid) and None
            )
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
