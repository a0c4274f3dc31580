"""Benchmark runner (driver contract: one JSON line on stdout).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS], timing each to a noop sink (measures full scan+
compute without driver-side row transfer), plus the end-to-end reference
ETL pipeline (queue->join->cleanse->dedup->upsert) whose wall time is the
honest comparison against BASELINE.md's 173 rec/s.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

from imp_etl_spark.session import get_spark

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q9_product_profit",
    "q18_large_volume",
    "dedup_latest_per_key",
    "dedup_pipeline_survivors",
    "win_topn_per_group",
    "events_session_10m",
    "minhash_lsh_pairs",
    "ann_cosine_topk",
    "text_stats",
    "word_counts_top50",
    "chunk_documents",
    # round-2/3 operator families (tracked round-over-round)
    "pii_redact_docs",
    "text_quality_gopher",
    "multimodal_features",
    "pack_sequences",
    "srp_bucket_topk",
    "simhash_near_dup",
    "doc_token_rarity",
    "tfidf_top_term",
    # round-3 additions: clustering, passage dedup, profiling stats
    "dedup_cluster_assign",
    "cross_corpus_survivors",
    "passage_dedup_docs",
    "agg_stats_moments",
    "agg_percentiles_disc",
    "events_value_histogram",
    # behavioral/fuzzy/statistical analytics tier
    "funnel_signup_purchase",
    "resample_ffill_hourly",
    "outlier_events_zscore",
    "shard_documents_balanced",
    "user_activity_streaks",
    "scd2_user_state",
    "rolling_24h_user_value",
    "doc_length_quartile_bins",
    "twap_user_value",
    "attribution_last_touch",
    "cap_docs_per_source",
    "outlier_events_mad",
    "snm_part_pairs",
    "top_event_paths",
    "peak_click_concurrency",
    # corpus tier 2 + layout/incremental batch
    "ngram_novelty",
    "bpe_pair_counts",
    "ewma_user_value",
    # r11 (VERDICT r10 item 1): the unbounded-EWMA rescaled-scan
    # consumer is benched in its SCALE configuration (default chunking
    # — bounded windows + C-compressed carry chain), not the chunk=1
    # oracle pin whose per-key sequential fold is the plan nobody runs
    # at 100x; the chunk=1 form stays registered (ewma_unbounded_user)
    # as the driver's bit-exact hash anchor
    "ewma_unbounded_scale",
    "incremental_agg_merge",
    "zorder_events_layout",
    "q12_priority_class",
    "q2_min_cost_supplier",
    "oov_rate_docs",
    "corpus_curation_funnel",
    "seasonal_anomaly_events",
    "rfm_customer_segments",
    # r11: mergeable HLL distinct sketches (shard -> union rollup)
    # + sketch set-algebra (inclusion-exclusion overlap)
    "hll_distinct_users_daily",
    "hll_user_overlap_halves",
]

# queries whose operator runs Spark jobs eagerly while BUILDING the frame
# (iterative convergence loops, global_index's partition-count pass) —
# timed from build, not just the write.
EAGER_BUILD = {"dedup_cluster_assign", "shard_documents_balanced",
               "doc_length_quartile_bins", "peak_click_concurrency",
               "rfm_customer_segments", "outlier_events_mad",
               "minhash_lsh_pairs", "dedup_pipeline_survivors",
               "cross_corpus_survivors",
               # r9: lag-class dispatch consumers run the 2-pass skew
               # probe (and, when it picks seq, seq_lag's range
               # exchange + boundary collect) at BUILD time
               "twap_user_value", "top_event_paths", "scd2_user_state",
               "win_lag_lead", "customer_order_gaps",
               # r10: dispatch-at-build consumers — at bench scale the
               # metadata row floor answers from parquet footers (no
               # jobs), but timing from build keeps that claim honest
               "ewma_unbounded_scale", "rolling_24h_user_value"}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("imp-etl-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    from imp_etl_spark.queries import REGISTRY
    from imp_etl_spark.sources.parquet import read_table

    # warm the session (JVM classloading, codegen paths, parquet footers)
    # so the first timed query isn't charged for startup. The second
    # warmup compiles the signature-pass expressions (tokenize/shingle/
    # md5/aggregate codegen) over a 64-doc slice, so the one-shot
    # minhash_index_build row below measures the build, not first-use
    # JIT — the same treatment best-of-2 gives every other row.
    read_table(spark, sf_dir, "lineitem").limit(1000).write.format(
        "noop").mode("overwrite").save()
    from imp_etl_spark.operators.dedup import minhash_stacked

    minhash_stacked(read_table(spark, sf_dir, "documents").limit(64)) \
        .write.format("noop").mode("overwrite").save()
    # warm the documents scan itself (OS page cache + footer metadata):
    # every best-of-2 row gets its input files warmed by its first
    # attempt, but the one-shot build row below reads documents exactly
    # once — without this, its number mixes storage cold-read cost into
    # the signature-pass cost and oscillates run-to-run (measured 4.75 s
    # cache-cold vs 3.14 s warm for an identical build).
    read_table(spark, sf_dir, "documents").write.format(
        "noop").mode("overwrite").save()

    # machine-state calibration (VERDICT r8 item 7): the recorded
    # totals swing ~6 s run-to-run on this box from background load
    # alone, so each bench sample carries (a) the 1-minute load average
    # at start and (b) a fixed CPU-bound reference job — 2e8 xxhash64
    # rows, no IO, no shuffle — timed best-of-2. Totals are comparable
    # across rounds only after checking these agree; a mover whose
    # round also moved the calibration number is machine state, not
    # code.
    from pyspark.sql import functions as F

    load_avg = round(os.getloadavg()[0], 2)
    cal = None
    for _ in range(2):
        t0 = time.perf_counter()
        # try_sum, not sum: 2e8 random 64-bit hashes overflow a signed
        # long almost surely, and ANSI mode (Spark 4 default) would
        # abort the whole bench for a job whose RESULT is discarded —
        # only its wall time matters
        spark.range(200_000_000).select(
            F.try_sum(F.xxhash64("id")).alias("h")).write.format(
            "noop").mode("overwrite").save()
        cal = min(cal or 9e9, time.perf_counter() - t0)
    calibration = round(cal, 3)

    timings: dict[str, float] = {}

    # The dedup tier's shared MinHash signature artifact is built ONCE
    # per corpus and consumed by four queries. Charging that one-time
    # build to whichever consumer happens to run first made their rows
    # oscillate round-over-round (r5: cross_corpus_survivors recorded
    # 2.71 s with the build inside vs 1.54 s warm), so the build is its
    # own bench row and every consumer below times against the WARM
    # artifact — the steady-state production shape (a 100 TB crawl
    # builds signatures once, then every dedup job reads them).
    from imp_etl_spark.queries_llm import _shared_minhash_stacked

    t0 = time.perf_counter()
    stacked = _shared_minhash_stacked(spark, sf_dir)  # builds eagerly
    timings["minhash_index_build"] = round(time.perf_counter() - t0, 3)
    # untimed read-back: warms the consumers' artifact-scan path (the
    # read cost shows up inside each consumer's own row)
    stacked.write.format("noop").mode("overwrite").save()

    for name in HEADLINE:
        fn, _ = REGISTRY[name]
        # best-of-2: the first execution of a query pays one-time codegen
        # compilation; the second measures the steady-state plan (the
        # number that scales). Both runs do full scan+compute.
        best = None
        for _attempt in range(2):
            # write-only timing (methodology-stable across rounds) —
            # EXCEPT for eager iterative ops, whose convergence loop runs
            # its jobs at build time and must be charged for them
            t0 = time.perf_counter() if name in EAGER_BUILD else None
            df = fn(spark, sf_dir)  # build (lazy unless EAGER_BUILD)
            if t0 is None:
                t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)

    # end-to-end ETL pipeline on the FIXTURES.md family-A mapping:
    # orders -> work queue, customer -> entity, lineitem -> detail
    from pyspark.sql import functions as F

    from imp_etl_spark.plans.runner import run_etl

    queue = read_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("log_id"),
        F.col("o_custkey").cast("string").alias("reference_no"),
        F.lit("voucher").alias("table"),
    )
    voucher = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("string").alias("voucher_id"),
        F.col("c_custkey").cast("string").alias("reference_no"),
        F.col("c_name").alias("first_name"),
        F.col("c_mktsegment").alias("voucher_status"),
        F.col("c_acctbal").cast("string").alias("farm_area"),
    )
    # detail rows carry the same reference key (custkey) as the entity —
    # derived via the lineitem->orders join, itself part of the workload
    txn = (
        read_table(spark, sf_dir, "lineitem")
        .join(read_table(spark, sf_dir, "orders")
              .select("o_orderkey", "o_custkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.concat_ws("-", "l_orderkey", "l_linenumber").alias("voucher_details_id"),
            F.col("o_custkey").cast("string").alias("reference_no"),
            F.col("l_quantity").cast("string").alias("quantity"),
            F.col("l_returnflag").alias("payout"),
            F.col("l_linestatus").alias("ishold"),
            F.col("l_shipdate").cast("string").alias("transac_date"),
        )
    )
    # best-of-2, same methodology as the queries above (round 4; earlier
    # rounds timed the ETL once, so their etl_pipeline rows carry ~2 s of
    # one-time codegen/broadcast warm-up on top of the steady-state wall)
    best = summary = None
    for _attempt in range(2):
        out = tempfile.mkdtemp(prefix="imp_etl_bench_")
        t0 = time.perf_counter()
        summary = run_etl(spark, queue, voucher, txn,
                          os.path.join(out, "voucher"),
                          os.path.join(out, "txn"))
        dt = time.perf_counter() - t0
        shutil.rmtree(out, ignore_errors=True)
        best = dt if best is None else min(best, dt)
    timings["etl_pipeline"] = round(best, 3)

    queue_records = summary["processedVoucherCount"] + summary[
        "processedTransactionCount"]
    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
        "etl_records": queue_records,
        "etl_rec_per_sec": round(queue_records / timings["etl_pipeline"], 1)
        if timings["etl_pipeline"] else None,
        # machine-state markers (see comment at the calibration block):
        # compare totals across rounds only when these agree
        "load_avg_1m": load_avg,
        "calibration_sec": calibration,
    }))


if __name__ == "__main__":
    sys.exit(main())
