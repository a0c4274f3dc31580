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
clusters typically converge in 2-3 rounds; convergence is verified by
an exact label-sum probe, never assumed, and a component that outruns
the round cap falls back to alternating large-star/small-star
contraction (Kiveris et al., SoCC 2014) — O(log² n) rounds regardless
of diameter — instead of aborting the job.

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


def _symmetrize(canon: DataFrame) -> DataFrame:
    """(a, b) canonical pairs -> (node, nbr) both directions."""
    return (
        canon.select(F.col("a").alias("node"), F.col("b").alias("nbr"))
        .unionByName(
            canon.select(F.col("b").alias("node"), F.col("a").alias("nbr")))
    )


def _canon_with_probe(canon: DataFrame) -> tuple[DataFrame, tuple[int, int]]:
    """Checkpoint the canonical (a < b) edge frame and return an exact
    (count, xxhash64-sum) fingerprint riding the materialization job —
    the star loop's convergence probe, same zero-extra-jobs pattern as
    ``_truncate_with_sum``."""
    obs = Observation()
    out = _truncate_lineage(canon.observe(
        obs,
        F.count(F.lit(1)).alias("n"),
        F.sum(F.xxhash64("a", "b").cast("decimal(38,0)")).alias("h")))
    return out, (obs.get["n"], obs.get["h"])


def _star_components(sym: DataFrame, max_rounds: int = 100) -> DataFrame:
    """Connected components via alternating large-star / small-star
    contraction (Kiveris et al., "Connected Components in MapReduce and
    Beyond", SoCC 2014) — the deep-graph fallback behind the min-label
    fast path. Converges in O(log² n) rounds REGARDLESS of component
    diameter, so a pathological chain component (templated pagination in
    a crawl) contracts instead of aborting the dedup job.

    Per round, on the symmetric adjacency:
    - large-star: every node points its STRICTLY LARGER neighbors at
      m = min(N(u) ∪ {u}); emitted pairs are (m, v), m < v by
      construction — already canonical.
    - small-star: every node with smaller neighbors S points S ∪ {u}
      at m = min(S); again (m, v) with m < v.
    Both phases preserve the node set and connectivity; the fixpoint is
    the star forest rooted at each component's minimum, from which the
    labeling reads off directly. State per round is the canonical edge
    frame (two 8-byte ids per edge, shrinking monotonically in
    diameter); every shuffle is a groupBy/join on node id.

    Returns (node, label) for every node in ``sym``.
    """
    # both phases preserve the node set of the edge frame, but nodes
    # whose only pairs are self-loops never enter it — keep the universe
    # so they come back labeled with their own id
    universe = sym.select("node").distinct()
    canon = (
        sym.filter(F.col("node") != F.col("nbr"))
        .select(F.least("node", "nbr").alias("a"),
                F.greatest("node", "nbr").alias("b"))
        .distinct()
    )
    canon, prev = _canon_with_probe(canon)
    for _ in range(max_rounds):
        if prev[0] == 0:
            break  # edgeless: only self-pairs existed
        s = _symmetrize(canon)
        # large-star: m(u) = min over N(u) ∪ {u}; pairs (m, v) for v > u
        mins = (
            s.groupBy("node").agg(F.min("nbr").alias("__mn"))
            .select("node", F.least("node", "__mn").alias("m"))
        )
        ls = (
            s.join(mins, on="node")
            .filter(F.col("nbr") > F.col("node"))
            .select(F.col("m").alias("a"), F.col("nbr").alias("b"))
            .distinct()
        )
        # small-star over the large-star output: for u with smaller
        # neighbors S, m = min(S); pairs (m, u) and (m, v) for v ∈ S\{m}
        s2 = _symmetrize(ls)
        smaller = s2.filter(F.col("nbr") < F.col("node"))
        mins2 = smaller.groupBy("node").agg(F.min("nbr").alias("m"))
        ss = (
            mins2.select(F.col("m").alias("a"), F.col("node").alias("b"))
            .unionByName(
                smaller.join(mins2, on="node")
                .filter(F.col("nbr") != F.col("m"))
                .select(F.col("m").alias("a"), F.col("nbr").alias("b")))
            .distinct()
        )
        canon, cur = _canon_with_probe(ss)
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(
            f"star contraction did not converge in {max_rounds} rounds")
    # fixpoint is a star forest: every (a, b) has a = component min
    labels = (
        _symmetrize(canon)
        .groupBy("node").agg(F.min("nbr").alias("__mn"))
        .select("node", F.least(F.col("node"), F.col("__mn")).alias("label"))
    )
    return (
        universe.join(labels, on="node", how="left")
        .select("node",
                F.coalesce(F.col("label"), F.col("node")).alias("label"))
    )


def connected_components(edges: DataFrame, src: str = "id_a",
                         dst: str = "id_b", max_iter: int = 20,
                         dedupe_edges: bool = False,
                         algorithm: str = "auto") -> DataFrame:
    """Connected components of the undirected graph given by pair rows.

    Returns (node, cluster_id) for every node that appears in ``edges``,
    where cluster_id is the minimum node id of the component.

    ``algorithm``:
    - ``"auto"`` (default): min-label propagation with pointer jumping —
      O(log diameter) rounds, the fast path for near-dup graphs — and,
      if ``max_iter`` rounds don't converge (a component deeper than
      pointer jumping can close, ~2^max_iter hops), an automatic switch
      to large-star/small-star contraction SEEDED with the propagated
      labels, so the job degrades to O(log² n) extra rounds instead of
      aborting.
    - ``"label"``: fast path only; raises on non-convergence (the
      pre-r5 behavior, for callers that want the abort).
    - ``"star"``: two-phase star contraction only (deterministic round
      bound regardless of graph shape).

    ``dedupe_edges``: min-propagation is idempotent to duplicate edges
    (the per-node MIN sees the same label twice), so the symmetrized
    edge list is NOT distinct'd by default — LSH-verified pair streams
    are canonical (id_a < id_b, unique) and the distinct would be a
    full extra shuffle of the largest frame here. Set True only when
    the pair stream carries heavy duplication; then one up-front
    distinct shrinks every round's join probe.
    """
    if algorithm not in ("auto", "label", "star"):
        raise ValueError(f"unknown algorithm: {algorithm!r}")
    sym = (
        edges.select(F.col(src).alias("node"), F.col(dst).alias("nbr"))
        .unionByName(
            edges.select(F.col(dst).alias("node"), F.col(src).alias("nbr")))
    )
    if dedupe_edges:
        sym = sym.distinct()
    sym = _truncate_lineage(sym)
    if algorithm == "star":
        return _star_components(sym).withColumnRenamed("label", "cluster_id")
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
    if algorithm == "label":
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds")
    # auto fallback: a component outran pointer jumping — hand off to
    # star contraction SEEDED with the propagated labels. Each (node,
    # label) row is an intra-component edge (labels only ever move to
    # ids inside the component), so the log-many rounds already paid
    # carry over instead of restarting from the raw graph.
    seeded = sym.unionByName(
        labels.select("node", F.col("label").alias("nbr")))
    return _star_components(seeded).withColumnRenamed("label", "cluster_id")


def cluster_assignments(docs: DataFrame, pairs: DataFrame,
                        id_col: str = "doc_id",
                        src: str = "id_a", dst: str = "id_b",
                        broadcast_map: bool = True,
                        **cc_kwargs) -> DataFrame:
    """(doc, cluster_id) for EVERY doc: component min for paired docs,
    the doc's own id for singletons.

    ``broadcast_map=True`` (default) hints the component map to the
    build side — it holds only near-dup members, 16 bytes each, and at
    typical crawl dup rates fits comfortably (measured: dropping the
    hint costs ~30% locally because the static planner picks a
    sort-merge join that shuffles the full corpus). Pass False for a
    high-dup-rate corpus (30-60% paired) where the map is a constant
    fraction of the corpus and must shuffle instead of broadcast.
    Extra keyword args (``max_iter``, ``algorithm``, ``dedupe_edges``)
    forward to :func:`connected_components`."""
    comp = connected_components(pairs, src=src, dst=dst, **cc_kwargs)
    comp = comp.withColumnRenamed("node", id_col)
    if broadcast_map:
        comp = F.broadcast(comp)
    return (
        docs.join(comp, on=id_col, how="left")
        .select(
            id_col,
            F.coalesce(F.col("cluster_id"), F.col(id_col)).alias("cluster_id"))
    )
