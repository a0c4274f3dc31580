"""High-dup-rate dedup scale point with the bucket cap ENGAGED.

The 5x experiment (scale_experiment.py) measures the dedup tier on the
planted sf0.1 corpus, where `max_bucket` never trips. A real crawl at
30-60 % duplication is the regime where degenerate buckets appear, so
this experiment builds one and measures what the cap actually costs:

Corpus (from sf0.1 documents, 5,000 base docs):
- every doc with doc_id % 10 < 4 gets 2 near-dup copies (one appended
  marker token each — token-5-gram Jaccard ~0.95 vs the base), putting
  the true near-dup rate at ~44 % of the 9,000-doc corpus;
- two "boilerplate" mega-groups: 400 near-identical variants of two
  base docs — the degenerate bucket (bucket size >> max_bucket=256)
  that motivates the cap. Variants differ by one marker token, so
  band-bucket collision is probabilistic (~0.96 per-pair) exactly as
  in production, not an artifact of byte-identical rows.

Measured (all on one warm local session, best-of-1 — the quantities of
interest are ratios and recalls, not microseconds):
1. wall for the two registry queries (`dedup_pipeline_survivors`,
   `dedup_cluster_assign`) on this corpus, cap at its default 256, and
   the Observation counters proving the cap engaged;
2. the same pipeline with the cap disabled (max_bucket = 1e9) — the
   ground truth AND the cost of not capping;
3. quality of the capped path vs uncapped ground truth:
   - verified-pair recall (capped pairs / uncapped pairs, both after
     exact-Jaccard verification) — the raw number, which is LOW by
     design: a star replaces O(k^2) intra-bucket pairs with O(k);
   - connectivity recall: fraction of uncapped-verified pairs whose
     endpoints land in the SAME capped cluster — the number that
     matters for dedup, because survivor selection only consumes
     components, not individual pairs;
   - survivor agreement: Jaccard of the capped vs uncapped survivor
     sets (cluster-min per component over the full corpus).

Run from the repo root:
    PYTHONPATH=. python tools/dup_cap_experiment.py
"""

from __future__ import annotations

import os
import shutil
import tempfile
import time

from pyspark.sql import DataFrame, functions as F
from pyspark.storagelevel import StorageLevel

from imp_etl_spark.operators.dedup import (
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
)
from imp_etl_spark.operators.graph import cluster_assignments
from imp_etl_spark.session import get_spark
from imp_etl_spark.sources.parquet import read_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CAP = 256
UNCAPPED = 1_000_000_000
MEGA_GROUPS = 2           # boilerplate groups ...
MEGA_COPIES = 400         # ... of this many near-identical variants
DUP_COPIES = 2            # copies per sampled ordinary doc
COPY_OFFSET = 10_000_000


def build_high_dup_corpus(spark, out_dir: str) -> None:
    base = read_table(spark, SF_DIR, "documents")
    mega_ids = [r["doc_id"] for r in
                base.orderBy("doc_id").limit(MEGA_GROUPS).collect()]

    parts = [base]
    # ~40 % ordinary near-dups: 2 perturbed copies for 40 % of docs
    sampled = base.filter(F.col("doc_id") % 10 < 4)
    for i in range(1, DUP_COPIES + 1):
        parts.append(sampled.select(
            (F.col("doc_id") + i * COPY_OFFSET).alias("doc_id"),
            F.concat(F.col("text"), F.lit(f" dupmarker{i}")).alias("text"),
            "lang", "source", "n_chars"))
    # boilerplate mega-groups: MEGA_COPIES variants of each seed doc
    seeds = base.filter(F.col("doc_id").isin(mega_ids))
    variants = seeds.crossJoin(
        spark.range(1, MEGA_COPIES + 1).withColumnRenamed("id", "__v"))
    parts.append(variants.select(
        (F.col("doc_id") + F.lit(100 * COPY_OFFSET)
         + F.col("__v") * F.lit(1000)).alias("doc_id"),
        F.concat(F.col("text"),
                 F.lit(" boiler"), F.col("__v").cast("string")).alias("text"),
        "lang", "source", "n_chars"))
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    df.write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")


def verified_pairs(spark, docs: DataFrame, max_bucket: int):
    """LSH candidates (at the given cap) -> exact-Jaccard verification.
    Returns (pairs_df, observation) — read the observation only after
    an action on the returned frame."""
    from pyspark.sql import Observation

    obs = Observation(f"cap_{max_bucket}")
    cands = minhash_lsh_candidates(
        docs, "text", "doc_id", shingle_k=5, num_hashes=12, bands=4,
        max_bucket=max_bucket, observation=obs,
    ).persist(StorageLevel.MEMORY_AND_DISK)
    ver = ngram_jaccard_pairs(docs, "text", "doc_id", n=5,
                              threshold=0.5, candidates=cands)
    return ver.select("id_a", "id_b"), obs


def main() -> None:
    from imp_etl_spark.queries import REGISTRY

    spark = get_spark("dup-cap-experiment")
    spark.sparkContext.setLogLevel("ERROR")
    big = tempfile.mkdtemp(prefix="dupcap_")
    build_high_dup_corpus(spark, big)
    docs = read_table(spark, big, "documents")
    n_docs = docs.count()
    print(f"corpus: {n_docs} docs "
          f"({MEGA_GROUPS} x {MEGA_COPIES}-variant boilerplate groups, "
          f"cap={CAP})\n")

    # 1. registry queries, cap at default: wall + cap-engagement proof
    print("| query (high-dup corpus) | wall (s) | rows |")
    print("|---|---|---|")
    for name in ("dedup_pipeline_survivors", "dedup_cluster_assign"):
        fn, _ = REGISTRY[name]
        t0 = time.perf_counter()
        rows = fn(spark, big).count()
        dt = time.perf_counter() - t0
        print(f"| {name} | {dt:.2f} | {rows} |")

    # 2+3. capped vs uncapped pair sets + clusters
    results = {}
    for label, cap in (("capped", CAP), ("uncapped", UNCAPPED)):
        t0 = time.perf_counter()
        pairs, obs = verified_pairs(spark, docs, cap)
        pairs = pairs.persist(StorageLevel.MEMORY_AND_DISK)
        n_pairs = pairs.count()
        t_pairs = time.perf_counter() - t0
        t0 = time.perf_counter()
        clusters = cluster_assignments(
            docs.select("doc_id"), pairs, id_col="doc_id"
        ).persist(StorageLevel.MEMORY_AND_DISK)
        clusters.count()
        t_cc = time.perf_counter() - t0
        results[label] = {"pairs": pairs, "n_pairs": n_pairs,
                          "clusters": clusters, "t_pairs": t_pairs,
                          "t_cc": t_cc, "obs": obs.get}
    print("\n| path | verified pairs | pair wall (s) | CC wall (s) "
          "| capped buckets | capped rows |")
    print("|---|---|---|---|---|---|")
    for label, r in results.items():
        o = r["obs"]
        print(f"| {label} | {r['n_pairs']} | {r['t_pairs']:.2f} "
              f"| {r['t_cc']:.2f} | {o.get('capped_buckets')} "
              f"| {o.get('capped_rows')} |")

    cap_p, unc_p = results["capped"]["pairs"], results["uncapped"]["pairs"]
    both = cap_p.join(unc_p, on=["id_a", "id_b"], how="left_semi").count()
    pair_recall = both / max(results["uncapped"]["n_pairs"], 1)

    # connectivity recall: uncapped TRUE pair -> same capped cluster?
    ccl = results["capped"]["clusters"]
    joined = (unc_p
              .join(ccl.withColumnsRenamed(
                  {"doc_id": "id_a", "cluster_id": "ca"}), on="id_a")
              .join(ccl.withColumnsRenamed(
                  {"doc_id": "id_b", "cluster_id": "cb"}), on="id_b"))
    conn = joined.select(
        F.avg((F.col("ca") == F.col("cb")).cast("double")).alias("r")
    ).collect()[0]["r"] or 0.0

    # survivor agreement: cluster-min sets, capped vs uncapped
    surv = {}
    for label in ("capped", "uncapped"):
        surv[label] = (results[label]["clusters"]
                       .groupBy("cluster_id")
                       .agg(F.min("doc_id").alias("doc_id"))
                       .select("doc_id")
                       .persist(StorageLevel.MEMORY_AND_DISK))
        surv[label].count()
    inter = surv["capped"].join(surv["uncapped"], on="doc_id",
                                how="left_semi").count()
    union = (surv["capped"].unionByName(surv["uncapped"])
             .distinct().count())
    n_cap = surv["capped"].count()
    n_unc = surv["uncapped"].count()

    print("\n| quality metric | value |")
    print("|---|---|")
    print(f"| verified-pair recall (capped/uncapped) | {pair_recall:.3f} |")
    print(f"| connectivity recall (true pair -> same capped cluster) "
          f"| {conn:.3f} |")
    print(f"| survivors capped / uncapped | {n_cap} / {n_unc} |")
    print(f"| survivor-set Jaccard | {inter / max(union, 1):.3f} |")

    # 4. the shuffled cluster-map path (broadcast_map=False): this
    # high-dup corpus is exactly the regime the knob exists for — the
    # component map covers most of the corpus. Verify identical output
    # and report the cost of forgoing the broadcast.
    t0 = time.perf_counter()
    shuffled = cluster_assignments(
        docs.select("doc_id"), cap_p, id_col="doc_id",
        broadcast_map=False).persist(StorageLevel.MEMORY_AND_DISK)
    shuffled.count()
    t_shuf = time.perf_counter() - t0
    mismatch = (shuffled
                .join(ccl.withColumnsRenamed({"cluster_id": "cb"}),
                      on="doc_id")
                .filter(F.col("cluster_id") != F.col("cb")).count())
    print(f"\n| cluster-map join path | wall (s) | mismatches |")
    print("|---|---|---|")
    print(f"| broadcast (default) | {results['capped']['t_cc']:.2f} | — |")
    print(f"| shuffled (broadcast_map=False) | {t_shuf:.2f} | {mismatch} |")

    shutil.rmtree(big, ignore_errors=True)


if __name__ == "__main__":
    main()
