"""Measure recall@k of the approximate similarity tier against the exact
brute-force baseline, and near-dup pair recall vs the exact pair set.

Prints a markdown table (pasted into SCALING.md). Run:
    python tools/measure_recall.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

from imp_etl_spark.operators import similarity as sim
from imp_etl_spark.session import get_spark
from imp_etl_spark.sources.parquet import read_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("recall-measure")
    spark.sparkContext.setLogLevel("ERROR")
    emb = read_table(spark, sf_dir, "embeddings").cache()
    n = emb.count()
    dim = len(emb.select("embedding").head()["embedding"])
    queries = emb.filter(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding")
    nq = queries.count()
    k = 10

    exact = sim.brute_force_topk(emb, queries, k).cache()
    exact.count()
    print(f"corpus n={n} dim={dim} queries={nq} k={k} ({sf_dir})\n")
    print("| method | config | recall@10 | candidates/query |")
    print("|---|---|---|---|")

    for planes in (4, 6, 8):
        for probe_bits in (0, 1):
            approx = sim.srp_bucket_topk(emb, queries, k, dim=dim,
                                         planes=planes,
                                         probe_bits=probe_bits)
            r = sim.recall_at_k(approx, exact)
            # MEASURED candidates scored per query (pre-ranking bucket
            # collisions), not the theoretical (1+probes)/2^planes
            cb = emb.withColumn(
                "b", sim._srp_bucket(F.col("embedding"), planes, dim))
            qb = queries.select("query_id", F.explode(sim._probe_buckets(
                sim._srp_bucket(F.col("embedding"), planes, dim),
                planes, probe_bits)).alias("b"))
            cand = cb.join(qb, "b").count() / nq
            probes = 1 + (planes if probe_bits else 0)
            frac = probes / 2 ** planes
            print(f"| SRP | planes={planes} probe_bits={probe_bits} "
                  f"(~{frac:.1%} of corpus/query) | {r:.3f} | "
                  f"{cand:.1f} |")

    cents = sim.train_ivf_centroids(emb, nlist=16, kmeans_iters=2)
    sizes = sim.assign_ivf_lists(emb, cents).groupBy("__list").agg(
        F.count(F.lit(1)).alias("sz"))
    for nprobe in (1, 2, 4, 8):
        approx = sim.ivf_topk(emb, queries, k, nlist=16, nprobe=nprobe)
        r = sim.recall_at_k(approx, exact)
        qlists = queries.select("query_id", F.explode(sim._probe_lists(
            sim._cent_scores(F.col("embedding"), sim._lits(cents)),
            16, nprobe)).alias("__list"))
        cand = (qlists.join(sizes, "__list").agg(
            F.sum("sz")).collect()[0][0] or 0) / nq
        print(f"| IVF | nlist=16 nprobe={nprobe} "
              f"(~{nprobe/16:.0%} of corpus/query) | {r:.3f} | "
              f"{cand:.1f} |")

    # near-dup pair recall on PLANTED duplicates (the real use case: the
    # fixture vectors are near-random, so no organic pairs exist at high
    # cosine — we plant one slightly-perturbed copy per vector, cos≈0.999,
    # and measure how many planted pairs each config recovers)
    planted = emb.select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: x + 0.01 * F.when(
                i % 2 == 1, F.lit(1.0)).otherwise(F.lit(-1.0))
        ).alias("embedding"))
    corpus2 = emb.select("vec_id", "embedding").unionByName(planted).cache()
    n_pairs = emb.count()
    thr = 0.99
    for planes, probe_bits in ((8, 0), (8, 1), (12, 0), (12, 1)):
        got = sim.embedding_near_dup_pairs(corpus2, thr, dim=dim,
                                           planes=planes,
                                           probe_bits=probe_bits)
        hit = got.filter(F.col("id_b") - F.col("id_a") == 1_000_000).count()
        print(f"| planted near-dup | planes={planes} "
              f"probe_bits={probe_bits} thr={thr} | {hit/n_pairs:.3f} | "
              f"{n_pairs} planted pairs |")


if __name__ == "__main__":
    main()
