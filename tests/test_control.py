"""Control-plane lifecycle (plans/control.py): run/schedule/stop/status."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from imp_etl_spark.plans.control import EtlController
from imp_etl_spark.sources.parquet import read_table
from tests.conftest import SF_DIR


def _frames(spark):
    queue = read_table(spark, SF_DIR, "orders").select(
        F.col("o_orderkey").alias("log_id"),
        F.col("o_custkey").cast("string").alias("reference_no"),
        F.lit("voucher").alias("table"))
    voucher = read_table(spark, SF_DIR, "customer").select(
        F.col("c_custkey").cast("string").alias("voucher_id"),
        F.col("c_custkey").cast("string").alias("reference_no"),
        F.col("c_name").alias("first_name"))
    txn = read_table(spark, SF_DIR, "lineitem").join(
        read_table(spark, SF_DIR, "orders").select("o_orderkey", "o_custkey"),
        F.col("l_orderkey") == F.col("o_orderkey")).select(
        F.concat_ws("-", "l_orderkey", "l_linenumber")
        .alias("voucher_details_id"),
        F.col("o_custkey").cast("string").alias("reference_no"),
        F.col("l_quantity").cast("string").alias("quantity"))
    return queue, voucher, txn


def test_run_once_returns_summary_and_status(spark, tmp_path):
    queue, voucher, txn = _frames(spark)
    ctl = EtlController(spark)
    assert ctl.status()["isRunning"] is False
    summary = ctl.run_once(queue, voucher, txn,
                           str(tmp_path / "v"), str(tmp_path / "t"))
    assert summary["processedVoucherCount"] > 0
    st = ctl.status()
    assert st["isRunning"] is False and st["lastSummary"] is summary


def test_schedule_fires_epochs_then_stop(spark, tmp_path):
    queue, voucher, txn = _frames(spark)
    src = str(tmp_path / "qstream")
    queue.coalesce(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(
        "log_id BIGINT, reference_no STRING, table STRING").parquet(src)

    ctl = EtlController(spark)
    ctl.schedule(stream, voucher, txn, str(tmp_path / "v"),
                 str(tmp_path / "t"), str(tmp_path / "ckpt"),
                 every="2 seconds")
    assert ctl.status()["isRunning"] is True
    with pytest.raises(RuntimeError, match="already"):
        ctl.schedule(stream, voucher, txn, "x", "y", "z")

    deadline = time.time() + 120
    while not ctl.epoch_summaries and time.time() < deadline:
        time.sleep(1)
    st = ctl.stop()
    assert st["epochsCompleted"] >= 1
    assert ctl.status()["isRunning"] is False
    assert ctl.epoch_summaries[0]["processedVoucherCount"] > 0
