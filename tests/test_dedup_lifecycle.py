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
