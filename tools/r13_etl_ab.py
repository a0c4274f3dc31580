"""Interleaved A/B for the r13 ETL dedup↔bucket fusion.

Arm A = fused (run_etl as shipped); arm B = the r12 shape
(build_pipeline without sink_buckets + merge without the
pre-clustered promise), reconstructed by monkeypatching the runner's
imports. Bench methodology per arm (fresh tmp sink, best-of-2),
interleaved rounds, one session.

Usage: PYTHONPATH=. python tools/r13_etl_ab.py
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from imp_etl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROUNDS = int(os.environ.get("R13_AB_ROUNDS", "3"))


def main() -> None:
    spark = get_spark("r13-etl-ab")
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    import imp_etl_spark.plans.runner as runner
    from imp_etl_spark.plans.pipeline import build_pipeline
    from imp_etl_spark.sources.parquet import read_table

    queue = read_table(spark, SF_DIR, "orders").select(
        F.col("o_orderkey").alias("log_id"),
        F.col("o_custkey").cast("string").alias("reference_no"),
        F.lit("voucher").alias("table"))
    voucher = read_table(spark, SF_DIR, "customer").select(
        F.col("c_custkey").cast("string").alias("voucher_id"),
        F.col("c_custkey").cast("string").alias("reference_no"),
        F.col("c_name").alias("first_name"),
        F.col("c_mktsegment").alias("voucher_status"),
        F.col("c_acctbal").cast("string").alias("farm_area"))
    txn = (read_table(spark, SF_DIR, "lineitem")
           .join(read_table(spark, SF_DIR, "orders")
                 .select("o_orderkey", "o_custkey"),
                 F.col("l_orderkey") == F.col("o_orderkey"))
           .select(F.concat_ws("-", "l_orderkey", "l_linenumber")
                   .alias("voucher_details_id"),
                   F.col("o_custkey").cast("string").alias("reference_no"),
                   F.col("l_quantity").cast("string").alias("quantity"),
                   F.col("l_returnflag").alias("payout"),
                   F.col("l_linestatus").alias("ishold"),
                   F.col("l_shipdate").cast("string").alias("transac_date")))

    orig_build = runner.build_pipeline
    orig_merge = runner.merge_upsert

    def build_unfused(*a, **kw):
        kw["sink_buckets"] = None
        return build_pipeline(*a, **kw)

    def merge_unfused(*a, **kw):
        kw.pop("batch_pre_clustered", None)
        return orig_merge(*a, **kw)

    def run_arm(arm: str) -> float:
        if arm == "B":
            runner.build_pipeline = build_unfused
            runner.merge_upsert = merge_unfused
        else:
            runner.build_pipeline = orig_build
            runner.merge_upsert = orig_merge
        best = None
        for _ in range(2):
            out = tempfile.mkdtemp(prefix=f"etl_ab_{arm}_")
            t0 = time.perf_counter()
            s = runner.run_etl(spark, queue, voucher, txn,
                               os.path.join(out, "voucher"),
                               os.path.join(out, "txn"))
            dt = time.perf_counter() - t0
            shutil.rmtree(out, ignore_errors=True)
            best = dt if best is None else min(best, dt)
            counts = (s["processedVoucherCount"],
                      s["processedTransactionCount"])
        run_arm.counts = counts  # type: ignore[attr-defined]
        return best

    run_arm("A"); run_arm("B")  # joint JIT warm-up, discarded
    times = {"A": [], "B": []}
    for _ in range(ROUNDS):
        times["A"].append(run_arm("A"))
        ca = run_arm.counts
        times["B"].append(run_arm("B"))
        cb = run_arm.counts
        assert ca == cb, (ca, cb)
    runner.build_pipeline = orig_build
    runner.merge_upsert = orig_merge
    rec = {"A_med": round(statistics.median(times["A"]), 3),
           "B_med": round(statistics.median(times["B"]), 3),
           "A_all": [round(x, 3) for x in times["A"]],
           "B_all": [round(x, 3) for x in times["B"]],
           "counts": ca, "sf_dir": SF_DIR}
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
