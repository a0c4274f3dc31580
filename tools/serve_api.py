"""Run the ETL control-plane server (the reference's `node index.js`).

Usage:
    PYTHONPATH=. python tools/serve_api.py [--port 5006] [--sf-dir DIR]
                                           [--out-dir DIR]

Serves the full route surface of the reference's Express API
(/api/start-etl, /api/start-etl-force, /api/stop-etl, /api/etl-status,
/health, /api/logs [GET/DELETE], /api/logs/stream SSE) over the Spark
ETL pipeline, reading the TPC-H-ish fixture mapping (orders = work
queue, customer = voucher entity, lineitem+orders = transaction detail)
from --sf-dir and writing the bucketed snapshot sinks under --out-dir.
SIGINT/SIGTERM shut down gracefully: an in-flight epoch finishes, the
scheduler stops, the server closes (reference: index.js:374-390).
"""

from __future__ import annotations

import argparse
import os
import signal
import tempfile
import threading

from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--port", type=int,
                    default=int(os.environ.get("PORT", 5006)))
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--out-dir", default=None)
    args = ap.parse_args()
    out = args.out_dir or tempfile.mkdtemp(prefix="imp_etl_serve_")

    from imp_etl_spark.plans.control import EtlController
    from imp_etl_spark.plans.http_api import EtlHttpServer
    from imp_etl_spark.session import get_spark
    from imp_etl_spark.sources.parquet import read_table

    spark = get_spark("imp-etl-api")
    spark.sparkContext.setLogLevel("ERROR")
    sf = args.sf_dir

    def workload() -> dict:
        queue = read_table(spark, sf, "orders").select(
            F.col("o_orderkey").alias("log_id"),
            F.col("o_custkey").cast("string").alias("reference_no"),
            F.lit("voucher").alias("table"))
        voucher = read_table(spark, sf, "customer").select(
            F.col("c_custkey").cast("string").alias("voucher_id"),
            F.col("c_custkey").cast("string").alias("reference_no"),
            F.col("c_name").alias("first_name"),
            F.col("c_mktsegment").alias("voucher_status"),
            F.col("c_acctbal").cast("string").alias("farm_area"))
        txn = (read_table(spark, sf, "lineitem")
               .join(read_table(spark, sf, "orders")
                     .select("o_orderkey", "o_custkey"),
                     F.col("l_orderkey") == F.col("o_orderkey"))
               .select(F.concat_ws("-", "l_orderkey", "l_linenumber")
                       .alias("voucher_details_id"),
                       F.col("o_custkey").cast("string")
                       .alias("reference_no"),
                       F.col("l_quantity").cast("string").alias("quantity"),
                       F.col("l_returnflag").alias("payout"),
                       F.col("l_linestatus").alias("ishold"),
                       F.col("l_shipdate").cast("string")
                       .alias("transac_date")))
        qsrc = os.path.join(out, "queue_stream")
        if not os.path.isdir(qsrc):
            queue.coalesce(1).write.mode("overwrite").parquet(qsrc)
        stream = spark.readStream.schema(
            "log_id BIGINT, reference_no STRING, table STRING"
        ).parquet(qsrc)
        return {
            "queue": queue, "voucher": voucher, "transaction": txn,
            "queue_stream": stream,
            "voucher_path": os.path.join(out, "voucher"),
            "txn_path": os.path.join(out, "txn"),
            "checkpoint_dir": os.path.join(out, "checkpoint"),
        }

    srv = EtlHttpServer(EtlController(spark), workload,
                        log_path=os.path.join(out, "logs", "etl.log"),
                        host=args.host, port=args.port)
    done = threading.Event()
    signal.signal(signal.SIGINT, lambda *_: done.set())
    signal.signal(signal.SIGTERM, lambda *_: done.set())
    with srv:
        print(f"IMP ETL Control API running on {srv.address} "
              f"(sinks under {out}); Ctrl-C to stop")
        done.wait()
    print("Server closed successfully")


if __name__ == "__main__":
    main()
