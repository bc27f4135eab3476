"""Connected components over verified pairs (SURVEY.md §2.3 M6 analog).

The reference propagates shared identity through ``ent_id`` plumbing
(reference: ``pipeline/spaczzruler.py:884-921``); at corpus scale the analog
is graph connectivity over the verified-pair edge set. Spark has no native
CC, so this implements the alternating **large-star / small-star** algorithm
(Kiveris et al., "Connected Components in MapReduce and Beyond"), which
converges in O(log n) rounds of hash joins and — unlike naive min-label
propagation — does not depend on graph diameter.

Every iteration:
- ``localCheckpoint()`` truncates lineage (plans otherwise grow
  exponentially across iterations), matching the per-iteration Iceberg
  checkpoint the production path would commit. (Measured round 4: the
  persist-instead-of-checkpoint alternative for small edge sets is ~7x
  SLOWER — without lineage truncation each iteration re-analyzes a
  growing plan and the observe() wrapper defeats cache reuse — so
  localCheckpoint stays at every size.)
- convergence is detected by an order-insensitive edge-set checksum
  (count + sum of pair hashes) — cheap aggregations, no exceptAll shuffle.

Result: (file_id, component_id) where component_id is the component's
minimum file_id — deterministic, resume-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components", "attach_components"]


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every larger neighbor of u to u's minimum neighborhood label.

    Tolerates (and may emit) duplicate edge rows: the groupBy/min is
    multiplicity-insensitive and :func:`_small_star`'s trailing
    ``distinct`` dedupes each full iteration — dropping the intermediate
    distinct here removes one shuffle per iteration, which matters because
    small-corpus CC cost is pure per-job orchestration (see
    ``connected_components``)."""
    sym = edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    mins = sym.groupBy("u").agg(F.min("v").alias("mn"))
    mins = mins.withColumn("m", F.least("u", "mn")).select("u", "m")
    return (
        sym.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .where(F.col("u") != F.col("v"))
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Within each node's smaller-or-equal neighborhood, restar onto the min."""
    directed = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    )
    mins = directed.groupBy("u").agg(F.min("v").alias("m"))
    joined = directed.join(mins, "u")
    restar = joined.where(F.col("v") != F.col("m")).select(
        F.col("v").alias("u"), F.col("m").alias("v")
    )
    self_edge = mins.select(F.col("u"), F.col("m").alias("v"))
    return restar.unionByName(self_edge).where(F.col("u") != F.col("v")).distinct()


def _checkpoint_with_checksum(edges: DataFrame) -> tuple[DataFrame, tuple[int, int]]:
    """localCheckpoint + order-insensitive edge checksum in ONE job.

    The convergence checksum (count + bit_xor of pair hashes — bit_xor, not
    sum: sum over xxhash64 longs overflows under ANSI mode) rides the
    checkpoint materialization via ``observe``, so each CC iteration costs a
    single Spark job instead of a materialize + a separate aggregate pass.
    """
    from pyspark.sql import Observation

    obs = Observation()
    observed = edges.observe(
        obs,
        F.count(F.lit(1)).alias("n"),
        F.expr("bit_xor(xxhash64(u, v))").alias("x"),
    )
    checkpointed = observed.localCheckpoint()
    got = obs.get
    return checkpointed, (int(got["n"]), int(got["x"] or 0))


def connected_components(
    pairs: DataFrame, max_iter: int = 25, metrics: dict | None = None
) -> tuple[DataFrame, int]:
    """Compute components from an (a_id, b_id) edge table.

    Returns (labels, iterations) where labels is (file_id, component_id)
    for every node that appears in an edge; isolated files are handled by
    :func:`attach_components`. Pass a ``metrics`` dict to receive
    ``iteration_walls`` (seconds per large-star/small-star round — the CC
    stress test asserts these stay flat while edges shrink).
    """
    import time

    # The input IS materialized (checkpoint + checksum, one observe-fused
    # job): _large_star references `edges` twice (sym = e ∪ swap(e)), so an
    # unmaterialized input subtree — which in the pipeline includes the
    # exact-collapse join over the whole normalized table — would
    # re-evaluate per reference (measured +14s on the 280k scaling corpus
    # when round 4 briefly dropped this). The input `.distinct()` IS
    # dropped, though: _large_star is multiplicity-insensitive and
    # iteration 1's trailing distinct dedupes, so the extra shuffle bought
    # nothing.
    edges, prev = _checkpoint_with_checksum(
        pairs.select(F.col("a_id").alias("u"), F.col("b_id").alias("v"))
        .where(F.col("u") != F.col("v"))
    )
    iterations = 0
    walls: list[float] = []
    converged = False
    for _ in range(max_iter):
        t0 = time.time()
        edges, cur = _checkpoint_with_checksum(_small_star(_large_star(edges)))
        walls.append(round(time.time() - t0, 3))
        iterations += 1
        if cur == prev:
            converged = True
            break
        prev = cur
    if not converged:
        # The root extraction below assumes the checksum fixed point (the
        # star graph): on a NON-converged edge set, distinct(v) would label
        # v-side nodes as their own roots, yielding duplicate file_id rows
        # that multiply through attach_components' join — silent data
        # corruption. Alternating star rounds converge in O(log^2 n)
        # (Kiveris et al.), so 25 rounds covers any realistic graph; hitting
        # the cap means something is broken, and failing loudly beats
        # returning corrupt labels (round-5 ADVICE).
        raise RuntimeError(
            f"connected_components did not converge within max_iter="
            f"{max_iter} rounds; the star-graph assumption behind root "
            "extraction does not hold — raise max_iter"
        )
    if metrics is not None:
        metrics["iteration_walls"] = walls
    # Converged: the checksum fixed point of small∘large star IS the star
    # graph (Kiveris et al. Thm 4.1) — every edge is (member -> component
    # min) with members and roots disjoint and one edge per member. Roots
    # are therefore exactly distinct(v): one partial-agg distinct, replacing
    # round 4's distinct(v) ⟕̸ distinct(u) anti-join + trailing
    # union-distinct (3 extra jobs on a stage whose small-corpus cost is
    # pure job count — round-5 ask #4).
    labels = edges.select(F.col("u").alias("file_id"), F.col("v").alias("component_id"))
    roots = edges.select(
        F.col("v").alias("file_id"), F.col("v").alias("component_id")
    ).distinct()
    return labels.unionByName(roots), iterations


def attach_components(files_ids: DataFrame, labels: DataFrame) -> DataFrame:
    """Left-join labels onto the full corpus; isolated files become their own
    singleton component (component_id = file_id)."""
    return (
        files_ids.join(labels, "file_id", "left")
        .withColumn("component_id", F.coalesce("component_id", "file_id"))
    )
