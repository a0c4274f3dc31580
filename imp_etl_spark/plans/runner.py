"""Batch run driver — parity with ``runEtlProcess``
(``services/etlService.js:526-583``) and the control-plane semantics the
Express API wraps around it (SURVEY.md §2.8).

One call = one ``Trigger.AvailableNow``-style run over the current work
queue: build the pipeline plan, upsert both branches, return the run
summary dict the reference returns (processed/skipped counts, durations,
warnings sample). Improvements kept from SURVEY §7.6:

- **High-watermark** on ``log_id`` (ST4): the reference re-processes the
  entire queue every run because nothing marks records consumed; we
  filter ``log_id > watermark`` and return the new watermark. Pass
  ``watermark=None`` for full-reprocess parity (idempotent sink makes
  both correct).
- Counters come from DataFrame aggregation (exact, distributed), not
  driver-side increments; the skipped side-outputs are returned as
  frames so callers can persist warnings instead of log-scraping.
"""

from __future__ import annotations

import time
from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from imp_etl_spark.plans.pipeline import build_pipeline
from imp_etl_spark.plans.upsert import merge_upsert

#: ST8 parity (services/etlService.js:13-14): 3 attempts, 1000 ms apart
RETRY_LIMIT = 3
RETRY_DELAY_S = 1.0


def retry_with_delay(fn: Callable[[], Any], label: str,
                     warnings_out: list[str],
                     limit: int = RETRY_LIMIT,
                     delay_s: float = RETRY_DELAY_S,
                     sleep: Callable[[float], None] = time.sleep,
                     ) -> tuple[int, Any | None, bool]:
    """ST8 — the reference's sink retry loop (etlService.js:78-99): up to
    ``limit`` attempts with a fixed ``delay_s`` between them; on final
    failure push the reference-shaped warning and return failure instead
    of raising (the run continues — rows get accounted as skipped by the
    caller). Returns (attempts_made, result, succeeded)."""
    attempts = 0
    while attempts < limit:
        try:
            result = fn()
            return attempts + 1, result, True
        except Exception as err:  # noqa: BLE001 — sink errors are data
            attempts += 1
            if attempts == limit:
                warnings_out.append(
                    f"Failed to process {label} after {limit} retries: {err}")
                return attempts, None, False
            sleep(delay_s)
    return attempts, None, False


def run_etl(spark: SparkSession, queue: DataFrame, voucher: DataFrame,
            transaction: DataFrame, voucher_path: str, txn_path: str,
            voucher_key: list[str] | None = None,
            transaction_key: list[str] | None = None,
            order_col: str = "reference_no",
            watermark: int | None = None,
            compat: bool = True,
            retry_limit: int = RETRY_LIMIT,
            retry_delay_s: float = RETRY_DELAY_S,
            sink: str = "manifest",
            jdbc_url: str | None = None,
            jdbc_options: dict[str, Any] | None = None,
            _sleep: Callable[[float], None] = time.sleep) -> dict[str, Any]:
    """Run one ETL epoch; returns the reference-shaped run summary
    (etlService.js:576-583) plus the new high-watermark.

    ``sink`` picks the write target (r11): ``"manifest"`` (default) is
    the engine's transactional bucketed-MERGE table at
    ``voucher_path``/``txn_path``; ``"jdbc"`` honors the reference's
    actual MySQL->MySQL deployment end-to-end — the two paths are then
    TABLE names and each branch upserts through
    :func:`~imp_etl_spark.sources.io.upsert_jdbc` (staging table + the
    database's own set-based keyed statement) against ``jdbc_url``
    with ``jdbc_options`` (driver, createTableColumnTypes, ...). Retry,
    counters, warnings and watermark semantics are identical in both
    modes.
    """
    started = time.time()
    if watermark is not None:
        queue = queue.filter(F.col("log_id") > F.lit(watermark))

    # fused dedup↔bucket layout (r13): the branches exchange ONCE on
    # the manifest sink's own bucket expression and the sink writes
    # them pre-clustered — see plans.pipeline._dedup_in_bucket_layout.
    # The JDBC sink ignores clustering (any layout is a valid batch),
    # so one fused shape serves both sinks. files_per_bucket keeps the
    # fused dedup sort scale-adaptive: 'auto' sub-splits each bucket so
    # the sort uses the session's full parallelism instead of funneling
    # a big epoch through n_buckets tasks (the bucket dirs then hold
    # files_per_bucket files each — the documented wide-bucket layout).
    from imp_etl_spark.plans.upsert import DEFAULT_BUCKETS

    fpb_raw = spark.conf.get("spark.imp_etl.etlSink.filesPerBucket", "auto")
    fpb = (max(1, spark.sparkContext.defaultParallelism // DEFAULT_BUCKETS)
           if fpb_raw == "auto" else max(1, int(fpb_raw)))
    result = build_pipeline(queue, voucher, transaction,
                            voucher_key=voucher_key,
                            transaction_key=transaction_key,
                            order_col=order_col, compat=compat,
                            sink_buckets=DEFAULT_BUCKETS,
                            sink_files_per_bucket=fpb)

    # MERGE first: the writes execute both branches, and the observe()
    # metrics attached in build_pipeline record the processed/skipped
    # counters during that same pass — zero dedicated count jobs (A2/A3).
    # The two branches are independent DAGs writing disjoint paths, so
    # submit them as concurrent Spark jobs: their scan/shuffle/write
    # phases interleave across the cluster instead of serializing (the
    # reference runs its two branch upserts sequentially per batch,
    # etlService.js:545-556).
    from concurrent.futures import ThreadPoolExecutor

    # The warning sample (J3 anti joins over the persisted branch
    # points) and the high-watermark scan are independent of the sink
    # writes — submit them into the same pool so their jobs overlap the
    # merges instead of serializing after them (the persisted cleansed
    # blocks are computed once whichever consumer gets there first;
    # BlockManager serializes per-block computation).
    warnings = (
        result.voucher.missing_refs.withColumn(
            "warning", F.concat(F.lit("No voucher data found for reference: "),
                                F.col("reference_no")))
        .unionByName(result.transaction.missing_refs.withColumn(
            "warning", F.concat(
                F.lit("No transaction data found for reference: "),
                F.col("reference_no"))))
    )
    retry_warnings: list[str] = []
    v_keys = voucher_key or ["voucher_id", "reference_no"]
    t_keys = transaction_key or ["voucher_details_id", "reference_no"]
    if sink == "jdbc":
        assert jdbc_url, "sink='jdbc' needs jdbc_url"
        from imp_etl_spark.sources.io import upsert_jdbc

        jopts = dict(jdbc_options or {})

        def v_write():
            return upsert_jdbc(result.voucher.valid, jdbc_url,
                               voucher_path, keys=v_keys, **jopts)

        def t_write():
            return upsert_jdbc(result.transaction.valid, jdbc_url,
                               txn_path, keys=t_keys, **jopts)
    elif sink == "manifest":
        def v_write():
            return merge_upsert(
                spark, voucher_path, result.voucher.valid, v_keys,
                order_col, batch_is_unique=True,
                files_per_bucket=fpb, batch_pre_clustered=True)

        def t_write():
            return merge_upsert(
                spark, txn_path, result.transaction.valid, t_keys,
                order_col, batch_is_unique=True,
                files_per_bucket=fpb, batch_pre_clustered=True)
    else:
        raise ValueError(f"unknown sink {sink!r}")
    with ThreadPoolExecutor(max_workers=4) as pool:
        fv = pool.submit(
            retry_with_delay, v_write,
            "voucher records", retry_warnings,
            limit=retry_limit, delay_s=retry_delay_s, sleep=_sleep)
        ft = pool.submit(
            retry_with_delay, t_write,
            "transaction records", retry_warnings,
            limit=retry_limit, delay_s=retry_delay_s, sleep=_sleep)
        # sample 5, as the reference logs slice(0,5) (etlService.js:499-510)
        fw = pool.submit(
            lambda: [r["warning"] for r in warnings.limit(5).collect()])
        fwm = pool.submit(
            lambda: queue.agg(F.max("log_id").alias("wm")).collect()[0])
        _, _, v_ok = fv.result()
        _, _, t_ok = ft.result()
        missing_warnings = fw.result()
        new_wm_row = fwm.result()
    # a successful merge executed the branch's observed plan — counter
    # reads are free; a failed branch falls back to one count() (needed
    # to account its rows as skipped, matching etlService.js:86-92)
    result.voucher.executed = v_ok
    result.transaction.executed = t_ok
    processed_voucher = result.voucher.processed_count()
    skipped_voucher = result.voucher.skipped_count()
    processed_txn = result.transaction.processed_count()
    skipped_txn = result.transaction.skipped_count()
    if not v_ok:
        # ST8 final-failure accounting: would-be-processed rows count as
        # skipped, nothing counts as processed
        skipped_voucher += processed_voucher
        processed_voucher = 0
    if not t_ok:
        skipped_txn += processed_txn
        processed_txn = 0

    # sink-retry failures (ST8) surface ahead of missing-ref warnings
    warning_sample = (retry_warnings + missing_warnings)[:5]

    for branch in (result.voucher, result.transaction):
        if branch.cleansed is not None:
            branch.cleansed.unpersist()

    # The watermark only advances when BOTH branches committed: a run
    # whose merge exhausted its retries must leave the failed rows
    # below the watermark so the next run reprocesses them (the
    # reference's full-queue rescan retries them on the next cron fire;
    # advancing here would silently drop them forever in watermark
    # mode — the idempotent sink makes the reprocess harmless).
    new_wm = new_wm_row["wm"] if new_wm_row["wm"] is not None else watermark
    summary = {
        "processedVoucherCount": processed_voucher,
        "processedTransactionCount": processed_txn,
        "skippedVoucherCount": skipped_voucher,
        "skippedTransactionCount": skipped_txn,
        "warningSample": warning_sample,
        "durationSec": round(time.time() - started, 3),
        "watermark": new_wm if (v_ok and t_ok) else watermark,
    }
    return summary
