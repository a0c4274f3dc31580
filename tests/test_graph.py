"""connected_components / cluster_assignments unit + property tests."""

from __future__ import annotations

import random

import pytest

from imp_etl_spark.operators.graph import cluster_assignments, connected_components


def _cc_reference(edges):
    """Driver-side union-find for cross-checking."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    return {n: find(n) for n in parent}


def test_chain_and_islands(spark):
    # chain 1-2-3 (no 1-3 edge), pair 7-8, self-contained triangle 10-11-12
    edges = [(1, 2), (2, 3), (7, 8), (10, 11), (11, 12), (10, 12)]
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    got = {r["node"]: r["cluster_id"]
           for r in connected_components(df).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 7: 7, 8: 7, 10: 10, 11: 10, 12: 10}


def test_matches_union_find_on_random_graph(spark):
    rng = random.Random(1234)
    nodes = list(range(200))
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(120)]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    got = {r["node"]: r["cluster_id"]
           for r in connected_components(df).collect()}
    assert got == _cc_reference(edges)


def test_long_path_converges(spark):
    # a 201-node path: neighbor propagation alone would need 200 rounds;
    # pointer jumping must land it well inside the default max_iter=20
    edges = [(i, i + 1) for i in range(200)]
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    got = connected_components(df)
    assert got.filter("cluster_id <> 0").count() == 0
    assert got.count() == 201


def test_max_iter_raises_in_label_mode(spark):
    """algorithm='label' keeps the pre-r5 abort for callers that want
    it; the default now degrades instead (next test)."""
    edges = [(i, i + 1) for i in range(30)]
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_iter=2, algorithm="label")


def test_deep_path_falls_back_to_star_contraction(spark):
    """A path graph deeper than the min-label round cap must CONVERGE
    via the seeded large-star/small-star fallback, not raise — one
    component labeled with the path minimum (VERDICT r4 item 2)."""
    edges = [(i, i + 1) for i in range(30)]
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    got = connected_components(df, max_iter=2)  # forces the fallback
    assert got.count() == 31
    assert got.filter("cluster_id <> 0").count() == 0


def test_star_algorithm_matches_union_find(spark):
    """Pure star contraction against the driver-side union-find oracle
    on random graphs, including dup/reversed edges and self-loops."""
    rng = random.Random(99)
    for trial in range(3):
        nodes = list(range(80))
        edges = [(rng.choice(nodes), rng.choice(nodes))
                 for _ in range(60 + trial * 20)]
        df = spark.createDataFrame(edges, ["id_a", "id_b"])
        got = {r["node"]: r["cluster_id"]
               for r in connected_components(
                   df, algorithm="star").collect()}
        want = _cc_reference([(a, b) for a, b in edges if a != b])
        # self-loop-only nodes label themselves
        for a, b in edges:
            if a == b:
                want.setdefault(a, a)
        assert got == want, f"trial {trial}"


def test_star_matches_label_on_chain_and_islands(spark):
    edges = [(1, 2), (2, 3), (7, 8), (10, 11), (11, 12), (10, 12)]
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    want = {r["node"]: r["cluster_id"]
            for r in connected_components(df, algorithm="label").collect()}
    got = {r["node"]: r["cluster_id"]
           for r in connected_components(df, algorithm="star").collect()}
    assert got == want == {1: 1, 2: 1, 3: 1, 7: 7, 8: 7,
                           10: 10, 11: 10, 12: 10}


def test_cluster_assignments_covers_singletons(spark):
    docs = spark.createDataFrame([(i,) for i in range(10)], ["doc_id"])
    pairs = spark.createDataFrame([(3, 5), (5, 9)], ["id_a", "id_b"])
    got = {r["doc_id"]: r["cluster_id"]
           for r in cluster_assignments(docs, pairs).collect()}
    expect = {i: i for i in range(10)}
    expect.update({3: 3, 5: 3, 9: 3})
    assert got == expect


def test_cc_uses_reliable_checkpoint_when_dir_configured(spark, tmp_path):
    """With a checkpoint dir configured (the cluster deployment), CC
    truncates lineage via reliable checkpoint — files actually land in
    the configured dir — and the labels are unchanged."""
    import os

    sc = spark.sparkContext
    ckdir = str(tmp_path / "cc_ck")
    sc.setCheckpointDir(ckdir)
    try:
        edges = [(1, 2), (2, 3), (7, 8)]
        df = spark.createDataFrame(edges, ["id_a", "id_b"])
        got = {r["node"]: r["cluster_id"]
               for r in connected_components(df).collect()}
        assert got == {1: 1, 2: 1, 3: 1, 7: 7, 8: 7}
        # reliable checkpoints materialized under the configured dir
        entries = []
        for root, _dirs, files in os.walk(ckdir):
            entries += [os.path.join(root, f) for f in files]
        assert entries, "no reliable checkpoint files were written"
    finally:
        # unset: Option(null) -> None on the Scala side, restoring the
        # localCheckpoint fallback for the rest of the session
        sc._jsc.sc().setCheckpointDir(None)
        assert sc.getCheckpointDir() is None


def test_duplicate_and_reversed_edges_are_idempotent(spark):
    """Min-propagation must not depend on edge multiplicity: the default
    path skips the edge distinct, so duplicated and direction-flipped
    pairs have to yield the same components as the deduped run."""
    base = [(1, 2), (2, 3), (7, 8)]
    noisy = base + [(2, 1), (1, 2), (3, 2), (8, 7), (7, 8), (7, 8)]
    want = _cc_reference(base)
    for dedupe in (False, True):
        df = spark.createDataFrame(noisy, ["id_a", "id_b"])
        got = {r["node"]: r["cluster_id"]
               for r in connected_components(
                   df, dedupe_edges=dedupe).collect()}
        assert got == want, f"dedupe_edges={dedupe}"


def test_cluster_assignments_shuffled_path_matches_broadcast(spark):
    """broadcast_map=False (the high-dup-rate scale path, where the
    component map is too large to broadcast) must produce exactly the
    same assignment as the default broadcast join."""
    docs = spark.createDataFrame([(i,) for i in range(20)], ["doc_id"])
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], ["id_a", "id_b"])
    from imp_etl_spark.operators.graph import cluster_assignments
    want = sorted(map(tuple, cluster_assignments(
        docs, pairs, broadcast_map=True).collect()))
    got = sorted(map(tuple, cluster_assignments(
        docs, pairs, broadcast_map=False).collect()))
    assert got == want
    by_doc = dict(got)
    assert by_doc[2] == 1 and by_doc[3] == 1 and by_doc[11] == 10
    assert by_doc[5] == 5  # singleton keeps its own id


def test_cluster_assignments_forwards_cc_kwargs(spark):
    docs = spark.createDataFrame([(i,) for i in range(35)], ["doc_id"])
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], ["id_a", "id_b"])
    # a deep chain with a tiny cap: the forwarded algorithm knob decides
    # between the old raise and the star fallback
    with pytest.raises(RuntimeError, match="did not converge"):
        cluster_assignments(docs, pairs, max_iter=2,
                            algorithm="label").collect()
    got = {r["doc_id"]: r["cluster_id"]
           for r in cluster_assignments(docs, pairs, max_iter=2).collect()}
    assert all(got[i] == 0 for i in range(31))
    assert all(got[i] == i for i in range(31, 35))
