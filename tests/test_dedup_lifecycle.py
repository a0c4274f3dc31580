"""Release lifecycle for the dedup tier's session-scoped persists
(VERDICT r5 item 4): the candidate-pair and verified-pair frames the
staged dedup queries cache are tracked in a module registry, and
``release_dedup_caches()`` unpersists every one of them — the explicit
hook a long-lived driver (controller / scheduled runs) calls between
runs, mirroring ``operators/window.global_index``'s ``release``
parameter. The shared MinHash signature artifact itself is a DISK
parquet memo (no block-manager footprint) and is governed by its
mtime-keyed invalidation instead.
"""

from __future__ import annotations

from imp_etl_spark import queries_llm
from imp_etl_spark.queries import REGISTRY
from tests.conftest import ORACLE_SF_DIR


def test_release_dedup_caches_unpersists_tracked_frames(spark):
    # start from a clean registry so the assertions are about THIS run
    queries_llm.release_dedup_caches(blocking=True)
    assert queries_llm._DEDUP_PERSISTS == []

    fn, _sql = REGISTRY["dedup_cluster_assign"]
    fn(spark, ORACLE_SF_DIR).count()

    tracked = list(queries_llm._DEDUP_PERSISTS)
    assert tracked, "dedup_cluster_assign should register its persists"
    # every tracked frame really is persisted (MEMORY_AND_DISK)
    assert all(d.storageLevel.useMemory or d.storageLevel.useDisk
               for d in tracked)

    released = queries_llm.release_dedup_caches(blocking=True)
    assert released == len(tracked)
    assert queries_llm._DEDUP_PERSISTS == []
    # unpersist really took: storage level reverts to NONE on each frame
    assert all(not (d.storageLevel.useMemory or d.storageLevel.useDisk)
               for d in tracked)


def test_release_is_idempotent_and_reentrant(spark):
    assert queries_llm.release_dedup_caches() == 0
    # a released tier can be rebuilt: the query still answers afterward
    fn, _sql = REGISTRY["dedup_pipeline_survivors"]
    assert fn(spark, ORACLE_SF_DIR).count() >= 0
    assert queries_llm.release_dedup_caches(blocking=True) >= 1


def test_controller_runs_hold_dedup_persists_bounded(spark, tmp_path):
    """VERDICT r6 item 3: a LONG-LIVED controller that interleaves dedup
    queries with scheduled runs must not grow ``_DEDUP_PERSISTS`` without
    bound — ``run_once`` releases the tier after every run (and the
    scheduled path after every epoch via ``on_epoch_end``), so the
    registry returns to empty between runs regardless of how many
    dedup queries ran since the last one."""
    from pyspark.sql import functions as F

    from imp_etl_spark.plans.control import EtlController
    from imp_etl_spark.sources.parquet import read_table

    queries_llm.release_dedup_caches(blocking=True)
    queue = read_table(spark, ORACLE_SF_DIR, "orders").limit(20).select(
        F.col("o_orderkey").alias("log_id"),
        F.col("o_custkey").cast("string").alias("reference_no"),
        F.lit("voucher").alias("table"))
    voucher = read_table(spark, ORACLE_SF_DIR, "customer").select(
        F.col("c_custkey").cast("string").alias("voucher_id"),
        F.col("c_custkey").cast("string").alias("reference_no"),
        F.col("c_name").alias("first_name"))
    txn = voucher.select(
        F.col("voucher_id").alias("voucher_details_id"),
        "reference_no",
        F.lit("1").alias("quantity"))

    ctl = EtlController(spark)
    fn, _sql = REGISTRY["dedup_cluster_assign"]
    sizes = []
    for epoch in range(3):
        fn(spark, ORACLE_SF_DIR).count()   # a dedup query between runs
        assert queries_llm._DEDUP_PERSISTS  # it really tracked persists
        ctl.run_once(queue, voucher, txn,
                     str(tmp_path / "v"), str(tmp_path / "t"))
        sizes.append(len(queries_llm._DEDUP_PERSISTS))
    # bounded = returns to EMPTY after every controller run, never grows
    assert sizes == [0, 0, 0]
