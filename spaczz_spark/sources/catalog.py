"""Checkpoint catalog: committed stage tables with resume semantics.

Production path: an Iceberg catalog — each stage is
``df.writeTo(f"{ns}.{name}").createOrReplace()`` and resume reads the last
committed snapshot (config-hash match checked against snapshot summary
properties). This sandbox has no Iceberg runtime jar, so the same contract
is implemented over partitioned Parquet plus an atomic JSON manifest:

    write temp dir -> write manifest.tmp -> os.replace (atomic rename)

A stage table is valid iff its manifest exists AND the recorded config hash
matches the current run config — config changes invalidate downstream
checkpoints automatically (the hash covers every semantic knob: shingle k,
permutations, bands/rows, thresholds, seeds).

The manifest also records per-stage lineage counters (rows in/out,
candidates, verified pairs — the north rule's metrics requirement), so a
resumed run can report the full pipeline history without recomputation.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession

__all__ = ["CheckpointCatalog"]


class CheckpointCatalog:
    def __init__(self, spark: SparkSession, root: str, use_iceberg: bool = False,
                 namespace: str = "dedup"):
        self.spark = spark
        self.root = root
        self.use_iceberg = use_iceberg
        self.namespace = namespace
        os.makedirs(root, exist_ok=True)

    # -- paths ---------------------------------------------------------------
    def _dir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _manifest(self, name: str) -> str:
        return os.path.join(self.root, f"{name}.manifest.json")

    # -- API -----------------------------------------------------------------
    def write(
        self,
        name: str,
        df: DataFrame,
        config_hash: str,
        *,
        input_fingerprint: str = "",
        partition_by: list[str] | None = None,
        metrics: dict | None = None,
        prepartitioned: bool = False,
    ) -> DataFrame:
        """Commit a stage table; returns a reader over the committed data
        (so downstream stages consume the checkpoint, truncating lineage)."""
        if self.use_iceberg:  # pragma: no cover - needs Iceberg runtime jar
            writer = (
                df.writeTo(f"{self.namespace}.{name}")
                .tableProperty("spaczz.config_hash", config_hash)
                .tableProperty("spaczz.input_fingerprint", input_fingerprint)
            )
            writer.createOrReplace()
            return self.spark.read.table(f"{self.namespace}.{name}")

        path = self._dir(name)
        tmp = path + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        # Write N files so downstream scans parallelize: small stage outputs
        # (tens of MB) would otherwise collapse to 1-2 read partitions under
        # maxPartitionBytes and serialize every UDF stage that follows. On
        # the Iceberg path this is bucket(file_id) table layout instead.
        #
        # ``prepartitioned=True`` skips the exchange: the builder already
        # established the layout BEFORE its widening computation (e.g. the
        # signatures stage repartitions the slim input by file_id and only
        # then runs the Arrow UDF), so repartitioning here would shuffle
        # the 3-5x fatter output a second time for nothing (guide §2.3:
        # shuffle the lightweight proxy, not the payload).
        #
        # Trade-off, accepted deliberately: a prepartitioned stage whose
        # final exchange AQE coalesced may commit as 1-2 files at bench
        # sizes. That is only safe for tables whose downstream consumers
        # immediately re-shuffle (pair tables feed joins; components feeds
        # aggregates) — a stage feeding a UDF directly (normalized ->
        # signatures) must keep the explicit N-way repartition, which is
        # why `normalized` does not pass prepartitioned.
        n_out = self.spark.sparkContext.defaultParallelism
        if not prepartitioned:
            if "file_id" in df.columns:
                df = df.repartition(n_out, "file_id")
            elif "a_id" in df.columns:
                # pair tables: hash layout on a_id — equivalent spread (ids
                # are xxhash64 values) without round-robin repartition's
                # mandatory local sort (sortBeforeRepartition, guide §2.5)
                df = df.repartition(n_out, "a_id")
            else:
                df = df.repartition(n_out)

        # Lineage counters ride the write job itself via observe() — no
        # extra count pass over the committed table (north rule: per-stage
        # rows in/out recorded alongside every checkpoint).
        from pyspark.sql import Observation
        from pyspark.sql import functions as F

        obs = Observation()
        df = df.observe(obs, F.count(F.lit(1)).alias("rows"))

        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(tmp)
        shutil.rmtree(path, ignore_errors=True)
        os.replace(tmp, path)

        committed = self.spark.read.parquet(path)
        manifest = {
            "name": name,
            "config_hash": config_hash,
            "input_fingerprint": input_fingerprint,
            "rows": int(obs.get["rows"]),
            "n_files": len(
                [f for f in os.listdir(path) if f.endswith(".parquet")]
            ),
            "schema": committed.schema.simpleString(),
            "metrics": metrics or {},
        }
        mtmp = self._manifest(name) + ".tmp"
        with open(mtmp, "w") as f:
            json.dump(manifest, f, indent=2, sort_keys=True)
        os.replace(mtmp, self._manifest(name))
        return committed

    def read_if_valid(
        self, name: str, config_hash: str, input_fingerprint: str = ""
    ) -> DataFrame | None:
        """Read a committed stage table iff its manifest matches the config
        AND the input dataset identity — a re-run over a *different* input
        with the same config must rebuild, not silently resume the previous
        corpus's stage outputs."""
        if self.use_iceberg:  # pragma: no cover - needs Iceberg runtime jar
            try:
                props = {
                    r["key"]: r["value"]
                    for r in self.spark.sql(
                        f"SHOW TBLPROPERTIES {self.namespace}.{name}"
                    ).collect()
                }
            except Exception:
                return None
            if props.get("spaczz.config_hash") != config_hash:
                return None
            if props.get("spaczz.input_fingerprint", "") != input_fingerprint:
                return None
            return self.spark.read.table(f"{self.namespace}.{name}")

        meta = self.manifest(name)
        if not meta or meta.get("config_hash") != config_hash:
            return None
        if meta.get("input_fingerprint", "") != input_fingerprint:
            return None
        path = self._dir(name)
        if not os.path.isdir(path):
            return None
        return self.spark.read.parquet(path)

    def manifest(self, name: str) -> dict | None:
        try:
            with open(self._manifest(name)) as f:
                return json.load(f)
        except (FileNotFoundError, json.JSONDecodeError):
            return None

    def invalidate(self, name: str) -> None:
        try:
            os.remove(self._manifest(name))
        except FileNotFoundError:
            pass
        shutil.rmtree(self._dir(name), ignore_errors=True)
