"""Deep-component benchmark for the connected-components fallback.

The min-label + pointer-jumping fast path closes ~2^k hops in k rounds,
so even a 200k-node path converges quickly — but a component deeper
than that budget used to ABORT the job. This measures the three
algorithm modes on adversarially deep graphs (pure paths — maximum
diameter per edge, zero near-dup realism, the worst case the fallback
exists for):

    PYTHONPATH=. python tools/star_bench.py

Graphs: one path of N nodes (diameter N-1) plus N/10 disjoint 3-cliques
(the realistic near-dup shape riding along to keep the label frame
honest). Modes: auto (fast path, falls back if the cap trips),
label with a tiny cap (exercises the seeded fallback), star (pure
contraction). Correctness: every mode must produce one component for
the path (min label 0) and per-clique labels elsewhere.
"""

from __future__ import annotations

import time

from imp_etl_spark.operators.graph import connected_components
from imp_etl_spark.session import get_spark


def run(n: int = 200_000) -> None:
    spark = get_spark("star-bench")
    spark.sparkContext.setLogLevel("ERROR")
    path_edges = spark.range(n - 1).selectExpr("id AS id_a", "id + 1 AS id_b")
    base = n * 10
    clique_edges = spark.range(n // 10).selectExpr(
        f"{base} + id * 3 AS a", f"{base} + id * 3 + 1 AS b",
        f"{base} + id * 3 + 2 AS c"
    ).selectExpr(
        "stack(3, a, b, b, c, a, c) AS (id_a, id_b)")
    edges = path_edges.unionByName(clique_edges)

    def check(labels) -> None:
        path_comp = labels.filter(f"node < {base}")
        assert path_comp.filter("cluster_id <> 0").count() == 0
        assert path_comp.count() == n

    for mode, kwargs in [
        ("auto (fast path)", {"algorithm": "auto"}),
        ("auto, cap=4 (seeded star fallback)",
         {"algorithm": "auto", "max_iter": 4}),
        ("star (pure contraction)", {"algorithm": "star"}),
    ]:
        t0 = time.time()
        labels = connected_components(edges, **kwargs)
        check(labels)
        print(f"| {mode} | {time.time() - t0:.2f} |")


if __name__ == "__main__":
    run()
