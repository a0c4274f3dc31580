"""Demonstrate (or retire) the events schema-cache claim (r13, VERDICT
r12 item 4).

The cache (sources/parquet.py) replaces a footer schema-INFERENCE pass
per ``read_table('events')`` call with a declared-schema read. This
probe measures exactly the thing the cache removes, in isolation, on
one session:

  1. N timed ``spark.read.parquet(events)`` reads (inference path —
     what every events read paid before r12),
  2. N timed ``spark.read.schema(s).parquet(events)`` reads (declared
     path — what a cache hit costs),

both timed to ``df.schema`` materialization (the driver-side work; no
job is run for the scan itself). The per-call delta times the
inference job the cache removes; multiplied by the events-read count
of one bench run it bounds the cache's whole-bench effect.

Usage: PYTHONPATH=. python tools/r13_schema_cache_probe.py [N]
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


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    spark = get_spark("r13-schema-cache-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = os.path.join(SF_DIR, "events.parquet")

    # warm-up: JVM classloading, filesystem metadata
    schema = spark.read.parquet(path).schema
    _ = spark.read.schema(schema).parquet(path).schema

    inferred, declared = [], []
    for _ in range(n):
        t0 = time.perf_counter()
        _ = spark.read.parquet(path).schema
        inferred.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        _ = spark.read.schema(schema).parquet(path).schema
        declared.append(time.perf_counter() - t0)

    med_i = statistics.median(inferred)
    med_d = statistics.median(declared)
    print(json.dumps({
        "sf_dir": SF_DIR,
        "n": n,
        "inferred_med_s": round(med_i, 4),
        "declared_med_s": round(med_d, 4),
        "delta_per_read_s": round(med_i - med_d, 4),
        "inferred_all": [round(x, 4) for x in inferred],
        "declared_all": [round(x, 4) for x in declared],
    }))


if __name__ == "__main__":
    main()
