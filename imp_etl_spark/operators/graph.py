"""Graph operators: connected components over pair edges.

The near-dup tier (MinHash-LSH, SimHash, embedding buckets) emits PAIRS,
but dedup at corpus scale needs CLUSTERS: near-duplication is transitive
in practice (a~b, b~c usually means a, b, c are versions of one page),
and pair-at-a-time survivor selection can drop both endpoints of a chain
or keep two docs that are near-dups of a common third. Connected
components turns the pair graph into (node, cluster_id) with
``cluster_id = min(doc_id in component)`` — the canonical survivor — so
cluster-aware dedup keeps exactly one doc per component.

The reference has no graph surface (its dedup is MySQL PK upserts,
``services/etlService.js:47-52``); this is part of the SURVEY.md §7.8
training-data tier.

Algorithm: min-label propagation with pointer jumping. Each round every
node adopts the minimum of (its label, its neighbors' labels, its
label's label). The neighbor step alone moves the component min one hop
per round (O(diameter) rounds); the label-of-label shortcut halves the
remaining pointer chains each round, giving O(log n) total — the same
idea as the shortcutting step in Rastogi et al., "Finding Connected
Components in Map-Reduce in Logarithmic Rounds" (ICDE 2013). Near-dup
clusters typically converge in 2-3 rounds; the cap exists for
pathological graphs and convergence is verified by an exact
changed-label count, never assumed.

Scale notes:
- State per round is one (node, label) row per node — 16 bytes — never
  the neighborhood lists themselves.
- Lineage is truncated each round (without it the iterated join plan
  grows exponentially and re-executes prior rounds): reliable
  ``checkpoint`` when the session has a checkpoint dir configured
  (``spark.sparkContext.setCheckpointDir`` — the cluster mode, where
  localCheckpoint would pin executors against decommission and lose
  rounds on executor failure), falling back to ``localCheckpoint``
  when none is set (local/test mode).
- The convergence probe is an ``observe`` metric (exact DECIMAL(38,0)
  label sum — labels are pointwise monotone, so an unchanged sum means
  an unchanged labeling) collected by the round's own checkpoint job:
  zero extra jobs, no recomputation of the round's join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def _truncate_lineage(df: DataFrame) -> DataFrame:
    """Materialize ``df`` and cut its lineage: reliable ``checkpoint``
    if the session has a checkpoint dir (cluster mode — survives
    executor loss, allows decommission), else ``localCheckpoint``."""
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is not None:
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)


def _truncate_with_sum(df: DataFrame, col: str) -> tuple[DataFrame, int]:
    """Checkpoint ``df`` AND return the exact DECIMAL(38,0) sum of
    ``col``, collected as an ``observe`` metric riding the checkpoint's
    own materialization job — the convergence probe costs zero extra
    jobs (verified to fire on both localCheckpoint and reliable
    checkpoint)."""
    obs = Observation()
    out = _truncate_lineage(df.observe(
        obs, F.sum(F.col(col).cast("decimal(38,0)")).alias("s")))
    return out, obs.get["s"]


def connected_components(edges: DataFrame, src: str = "id_a",
                         dst: str = "id_b", max_iter: int = 20,
                         dedupe_edges: bool = False) -> DataFrame:
    """Connected components of the undirected graph given by pair rows.

    Returns (node, cluster_id) for every node that appears in ``edges``,
    where cluster_id is the minimum node id of the component. Raises if
    ``max_iter`` rounds don't converge (component diameter > max_iter —
    at that point use the large-star/small-star variant, not a bigger
    cap).

    ``dedupe_edges``: min-propagation is idempotent to duplicate edges
    (the per-node MIN sees the same label twice), so the symmetrized
    edge list is NOT distinct'd by default — LSH-verified pair streams
    are canonical (id_a < id_b, unique) and the distinct would be a
    full extra shuffle of the largest frame here. Set True only when
    the pair stream carries heavy duplication; then one up-front
    distinct shrinks every round's join probe.
    """
    sym = (
        edges.select(F.col(src).alias("node"), F.col(dst).alias("nbr"))
        .unionByName(
            edges.select(F.col(dst).alias("node"), F.col(src).alias("nbr")))
    )
    if dedupe_edges:
        sym = sym.distinct()
    sym = _truncate_lineage(sym)
    labels = (
        sym.groupBy("node").agg(F.min("nbr").alias("__mn"))
        .select("node", F.least(F.col("node"), F.col("__mn")).alias("label"))
    )
    # Convergence probe: labels are pointwise monotone non-increasing
    # (every update is a MIN that includes the node's own label), so the
    # label SUM strictly decreases iff ANY label changed — one exact
    # DECIMAL(38,0) observe metric per round, riding the checkpoint job,
    # replaces carrying an old-label column through an extra join plus a
    # separate probe scan.
    labels, prev_sum = _truncate_with_sum(labels, "label")
    for _ in range(max_iter):
        # label(v) <- min(label(v), min_{u in N(v)} label(u)):
        # the node's own label rides the same groupBy as a union leg,
        # fusing what was a separate (labels JOIN nbr_min) exchange.
        cand = (
            sym.join(labels.withColumnsRenamed(
                {"node": "nbr", "label": "nbr_label"}), on="nbr")
            .select("node", "nbr_label")
            .unionByName(labels.select(
                "node", F.col("label").alias("nbr_label")))
            .groupBy("node").agg(F.min("nbr_label").alias("cl"))
        )
        # pointer jump: label(v) <- label(label(v)); labels are monotone
        # (label(u) <= u), so the parent's label can only be smaller
        new_labels = (
            cand.join(labels.withColumnsRenamed(
                {"node": "cl", "label": "plabel"}), on="cl", how="left")
            .select(
                "node",
                F.least(F.col("cl"),
                        F.coalesce(F.col("plabel"), F.col("cl")))
                .alias("label"),
            )
        )
        # materializes the round's joins and cuts lineage; the probe
        # metric rides the same job
        labels, cur_sum = _truncate_with_sum(new_labels, "label")
        if cur_sum == prev_sum:
            return labels.withColumnRenamed("label", "cluster_id")
        prev_sum = cur_sum
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds")


def cluster_assignments(docs: DataFrame, pairs: DataFrame,
                        id_col: str = "doc_id",
                        src: str = "id_a", dst: str = "id_b",
                        broadcast_map: bool = True) -> DataFrame:
    """(doc, cluster_id) for EVERY doc: component min for paired docs,
    the doc's own id for singletons.

    ``broadcast_map=True`` (default) hints the component map to the
    build side — it holds only near-dup members, 16 bytes each, and at
    typical crawl dup rates fits comfortably (measured: dropping the
    hint costs ~30% locally because the static planner picks a
    sort-merge join that shuffles the full corpus). Pass False for a
    high-dup-rate corpus (30-60% paired) where the map is a constant
    fraction of the corpus and must shuffle instead of broadcast."""
    comp = connected_components(pairs, src=src, dst=dst)
    comp = comp.withColumnRenamed("node", id_col)
    if broadcast_map:
        comp = F.broadcast(comp)
    return (
        docs.join(comp, on=id_col, how="left")
        .select(
            id_col,
            F.coalesce(F.col("cluster_id"), F.col(id_col)).alias("cluster_id"))
    )
