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
- The convergence probe is a ``sum`` over the changed-flag column of the
  ALREADY-checkpointed label frame — a scan of 16-byte rows, no
  recomputation of the round's join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _truncate_lineage(df: DataFrame) -> DataFrame:
    """Materialize ``df`` and cut its lineage: reliable ``checkpoint``
    if the session has a checkpoint dir (cluster mode — survives
    executor loss, allows decommission), else ``localCheckpoint``."""
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is not None:
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)


def connected_components(edges: DataFrame, src: str = "id_a",
                         dst: str = "id_b", max_iter: int = 20) -> DataFrame:
    """Connected components of the undirected graph given by pair rows.

    Returns (node, cluster_id) for every node that appears in ``edges``,
    where cluster_id is the minimum node id of the component. Raises if
    ``max_iter`` rounds don't converge (component diameter > max_iter —
    at that point use the large-star/small-star variant, not a bigger
    cap).
    """
    sym = (
        edges.select(F.col(src).alias("node"), F.col(dst).alias("nbr"))
        .unionByName(
            edges.select(F.col(dst).alias("node"), F.col(src).alias("nbr")))
        .distinct()
    )
    sym = _truncate_lineage(sym)
    labels = (
        sym.groupBy("node").agg(F.min("nbr").alias("__mn"))
        .select("node", F.least(F.col("node"), F.col("__mn")).alias("label"))
    )
    labels = _truncate_lineage(labels)
    for _ in range(max_iter):
        # label(v) <- min(label(v), min_{u in N(v)} label(u))
        nbr_min = (
            sym.join(labels.withColumnsRenamed(
                {"node": "nbr", "label": "nbr_label"}), on="nbr")
            .groupBy("node").agg(F.min("nbr_label").alias("nbr_min"))
        )
        cand = (
            labels.join(nbr_min, on="node", how="left")
            .select(
                "node", F.col("label").alias("old"),
                F.least(F.col("label"),
                        F.coalesce(F.col("nbr_min"), F.col("label")))
                .alias("cl"),
            )
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
                (F.least(F.col("cl"),
                         F.coalesce(F.col("plabel"), F.col("cl")))
                 < F.col("old")).cast("int").alias("__chg"),
            )
        )
        # materializes the round's joins and cuts lineage
        new_labels = _truncate_lineage(new_labels)
        changed = new_labels.agg(F.sum("__chg")).first()[0] or 0
        labels = new_labels.drop("__chg")
        if not changed:
            return labels.withColumnRenamed("label", "cluster_id")
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds")


def cluster_assignments(docs: DataFrame, pairs: DataFrame,
                        id_col: str = "doc_id",
                        src: str = "id_a", dst: str = "id_b") -> DataFrame:
    """(doc, cluster_id) for EVERY doc: component min for paired docs,
    the doc's own id for singletons. The component map is tiny relative
    to the corpus (only near-dup members), so it broadcasts."""
    comp = connected_components(pairs, src=src, dst=dst)
    return (
        docs.join(
            F.broadcast(comp.withColumnRenamed("node", id_col)),
            on=id_col, how="left")
        .select(
            id_col,
            F.coalesce(F.col("cluster_id"), F.col(id_col)).alias("cluster_id"))
    )
