"""Interleaved A/B harness for the r13 conf-gated changes.

Box-state-proof comparison: for each (query, confA, confB) experiment,
run A and B INTERLEAVED (A B A B ...) in one session with the bench's
exact timed region, reporting best and median per arm. Between arms the
dedup-tier caches are released so one arm's persists never serve the
other arm's reads.

Usage: PYTHONPATH=. python tools/r13_ab.py <experiment> [...]
Experiments are named in EXPERIMENTS below.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from imp_etl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROUNDS = int(os.environ.get("R13_AB_ROUNDS", "3"))

HUGE = "999999999999"

# experiment -> (query, {conf: (valueA, valueB)});  A = r13 default arm,
# B = comparison arm (r12 behavior or gate-off)
EXPERIMENTS = {
    "tok_tfidf": ("tfidf_top_term",
                  {"spark.imp_etl.persist.minTokenSourceRows": ("2048", HUGE)}),
    "tok_rarity": ("doc_token_rarity",
                   {"spark.imp_etl.persist.minTokenSourceRows": ("2048", HUGE)}),
    "tok_oov": ("oov_rate_docs",
                {"spark.imp_etl.persist.minTokenSourceRows": ("2048", HUGE)}),
    "stats_lsh": ("minhash_lsh_pairs",
                  {"spark.imp_etl.persist.minBandStatsSourceRows":
                   ("16384", HUGE)}),
    "stats_pipeline": ("dedup_pipeline_survivors",
                       {"spark.imp_etl.persist.minBandStatsSourceRows":
                        ("16384", HUGE)}),
    "verify_pipeline": ("dedup_pipeline_survivors",
                        {"spark.imp_etl.persist.minVerifySourceRows":
                         ("256", HUGE)}),
    "hll": ("hll_user_overlap_halves",
            {"spark.imp_etl.persist.minSketchSourceRows": ("0", "1048576")}),
    "funnel": ("funnel_signup_purchase",
               {"spark.imp_etl.persist.minFunnelSourceRows": ("0", HUGE)}),
    "psum_pct": ("agg_percentiles_disc",
                 {"spark.imp_etl.prefixSum.maxSingleSortRows":
                  ("1048576", "0")}),
    "psum_mad": ("outlier_events_mad",
                 {"spark.imp_etl.prefixSum.maxSingleSortRows":
                  ("1048576", "0")}),
    "psum_rfm": ("rfm_customer_segments",
                 {"spark.imp_etl.prefixSum.maxSingleSortRows":
                  ("1048576", "0")}),
    "psum_peak": ("peak_click_concurrency",
                  {"spark.imp_etl.prefixSum.maxSingleSortRows":
                   ("1048576", "0")}),
    "psum_quart": ("doc_length_quartile_bins",
                   {"spark.imp_etl.prefixSum.maxSingleSortRows":
                    ("1048576", "0")}),
    "control_q1": ("q1_pricing_summary", {}),
}


def main() -> None:
    names = sys.argv[1:] or list(EXPERIMENTS)
    spark = get_spark("r13-ab")
    spark.sparkContext.setLogLevel("ERROR")

    import bench
    from imp_etl_spark.queries import REGISTRY
    from imp_etl_spark.queries_llm import (
        _shared_minhash_stacked,
        release_dedup_caches,
    )
    from imp_etl_spark.sources.parquet import read_table

    # bench warmups
    read_table(spark, SF_DIR, "lineitem").limit(1000).write.format(
        "noop").mode("overwrite").save()
    read_table(spark, SF_DIR, "documents").write.format(
        "noop").mode("overwrite").save()
    if any("dedup" in EXPERIMENTS[n][0] or "minhash" in EXPERIMENTS[n][0]
           for n in names):
        _shared_minhash_stacked(spark, SF_DIR).write.format(
            "noop").mode("overwrite").save()

    out = {}
    for name in names:
        q, confs = EXPERIMENTS[name]
        fn, _ = REGISTRY[q]
        times: dict[str, list[float]] = {"A": [], "B": []}

        def run_arm(arm: str) -> None:
            # bench methodology per arm: clear caches, then best-of-2 —
            # attempt 1 pays persist materialization (like the bench's
            # first attempt), attempt 2 measures the steady state the
            # bench records. One arm never serves the other's caches.
            for k, (va, vb) in confs.items():
                spark.conf.set(k, va if arm == "A" else vb)
            release_dedup_caches(blocking=True)
            spark.catalog.clearCache()
            best = None
            for _attempt in range(2):
                t0 = time.perf_counter() if q in bench.EAGER_BUILD else None
                df = fn(spark, SF_DIR)
                if t0 is None:
                    t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            times[arm].append(best)

        spark.sparkContext.setJobDescription(f"ab:{name}")
        run_arm("A"); run_arm("B")  # joint warm-up round (JIT) — discarded
        times["A"].clear(); times["B"].clear()
        for _ in range(ROUNDS):
            run_arm("A")
            run_arm("B")
        spark.sparkContext.setJobDescription(None)
        rec = {
            "query": q,
            "A_best": round(min(times["A"]), 3),
            "B_best": round(min(times["B"]), 3),
            "A_med": round(statistics.median(times["A"]), 3),
            "B_med": round(statistics.median(times["B"]), 3),
            "A_all": [round(x, 3) for x in times["A"]],
            "B_all": [round(x, 3) for x in times["B"]],
        }
        out[name] = rec
        print(f"{name:16s} {q:28s} A_med={rec['A_med']:7.3f} "
              f"B_med={rec['B_med']:7.3f}", flush=True)
        # reset confs to session defaults for the next experiment
        for k in confs:
            spark.conf.unset(k)

    print(json.dumps({"sf_dir": SF_DIR, "rounds": ROUNDS, "results": out}))


if __name__ == "__main__":
    main()
