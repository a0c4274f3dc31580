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


def test_stop_survives_a_failing_query_stop(spark):
    """A q.stop() that raises must leave the controller recoverable: the
    handle stays registered, so a retry stop() still lands and clears
    the running state (instead of stranding is_running=True forever)."""

    class _FlakyQuery:
        def __init__(self):
            self.stops = 0
            self.isActive = True

        def stop(self):
            self.stops += 1
            if self.stops == 1:
                raise RuntimeError("stream already dying")
            self.isActive = False

        def awaitTermination(self, timeout=None):
            return True

    ctl = EtlController(spark)
    ctl._query = _FlakyQuery()
    ctl._schedule = "2 seconds"
    ctl._started_at = time.time()

    with pytest.raises(RuntimeError, match="dying"):
        ctl.stop()
    # the failed stop must not have erased the handle or the claim
    assert ctl._query is not None
    assert ctl.is_running is True

    ctl.stop()  # retry succeeds and clears everything
    assert ctl._query is None
    assert ctl.is_running is False
    assert ctl.status()["schedule"] is None
