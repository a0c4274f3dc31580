"""Round-13 optimization measurement harness.

For each headline query: capture ``explain("formatted")`` to
``plans/r13/<name>_<tag>.txt`` and time the noop-sink write best-of-N
(same timed region as bench.py, including EAGER_BUILD semantics), also
recording how many Spark jobs each build+write triggers (eager probes /
collects show up here).

Usage:
    PYTHONPATH=. python tools/r13_measure.py <tag> [query ...]

``tag`` is the plans/r13 suffix (``before`` / ``after``); with no query
names, runs the full bench HEADLINE list.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from imp_etl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPEATS = int(os.environ.get("R13_REPEATS", "4"))


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    spark = get_spark("r13-measure")
    spark.sparkContext.setLogLevel("ERROR")

    import bench
    from imp_etl_spark.queries import REGISTRY
    from imp_etl_spark.sources.parquet import read_table

    names = sys.argv[2:] or list(bench.HEADLINE)

    # same warmups as bench.py
    read_table(spark, SF_DIR, "lineitem").limit(1000).write.format(
        "noop").mode("overwrite").save()
    from imp_etl_spark.operators.dedup import minhash_stacked

    minhash_stacked(read_table(spark, SF_DIR, "documents").limit(64)) \
        .write.format("noop").mode("overwrite").save()
    read_table(spark, SF_DIR, "documents").write.format(
        "noop").mode("overwrite").save()
    if any(n in bench.EAGER_BUILD or n.startswith("minhash")
           or "dedup" in n or "cross_corpus" in n for n in names):
        from imp_etl_spark.queries_llm import _shared_minhash_stacked

        stacked = _shared_minhash_stacked(spark, SF_DIR)
        stacked.write.format("noop").mode("overwrite").save()

    plan_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r13")
    os.makedirs(plan_dir, exist_ok=True)

    tracker = spark.sparkContext.statusTracker()
    out: dict[str, dict] = {}
    for name in names:
        fn, _ = REGISTRY[name]
        spark.sparkContext.setJobDescription(f"r13:{name}")
        best, times, jobs = None, [], None
        for attempt in range(REPEATS):
            j0 = len(tracker.getJobIdsForGroup(None) or [])
            _j0 = j0
            t0 = time.perf_counter() if name in bench.EAGER_BUILD else None
            df = fn(spark, SF_DIR)
            if attempt == 0:
                with open(os.path.join(plan_dir, f"{name}_{tag}.txt"),
                          "w") as fh:
                    fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                        df._jdf.queryExecution(), "formatted"))
            if t0 is None:
                t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            times.append(round(dt, 3))
            jobs = len(tracker.getJobIdsForGroup(None) or []) - _j0
            best = dt if best is None else min(best, dt)
        out[name] = {"best": round(best, 3), "times": times,
                     "jobs_last_attempt": jobs}
        spark.sparkContext.setJobDescription(None)
        print(f"{name:32s} best={best:7.3f} jobs={jobs} times={times}", flush=True)

    print(json.dumps({"tag": tag, "sf_dir": SF_DIR, "results": out}))


if __name__ == "__main__":
    main()
