"""Idempotent composite-key upsert sink (S6/S7/J4, SURVEY.md §2.3/§7.5).

The reference's sink is MySQL ``INSERT ... ON DUPLICATE KEY UPDATE``
(``services/etlService.js:36-53``, ``:177-194``): matched keys update,
new keys insert, re-runs are harmless. The idiomatic Spark equivalent is
``MERGE INTO`` on a transactional table format (Delta/Iceberg); this
container has plain parquet only, so the sink implements the documented
fallback: **snapshot merge** — union(target, batch) -> last-writer-wins
dedup -> write a new immutable snapshot version -> flip the version
pointer. Readers always see a complete snapshot; a crashed writer leaves
only an orphaned staging directory.

Scale notes: rewriting the full target per merge is how MERGE-on-parquet
must behave without a log; at 100 TB you deploy the same call on Delta
(`MERGE INTO`) where only touched files rewrite. The union+window plan
shuffles once on the PK; with the target pre-partitioned (bucketed) on
the same key the exchange on the target side is avoided entirely
(`partition_by` below writes key-hash subdirectories so subsequent
merges join co-partitioned data).
"""

from __future__ import annotations

import os
import shutil
import uuid
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from imp_etl_spark.operators.dedup import latest_per_key

_VERSION_PREFIX = "v_"


def _versions(path: str) -> list[int]:
    if not os.path.isdir(path):
        return []
    out = []
    for d in os.listdir(path):
        if d.startswith(_VERSION_PREFIX):
            try:
                out.append(int(d[len(_VERSION_PREFIX):]))
            except ValueError:
                pass
    return sorted(out)


def current_snapshot_path(path: str) -> str | None:
    vs = _versions(path)
    return os.path.join(path, f"{_VERSION_PREFIX}{vs[-1]}") if vs else None


def read_target(spark: SparkSession, path: str,
                version: int | None = None) -> DataFrame | None:
    """Read the current snapshot, or a retained older one (time travel —
    ``version`` from the ``merge_upsert`` return value; how many stay
    readable is ``keep_versions``)."""
    if version is not None:
        if version not in _versions(path):
            raise ValueError(
                f"version {version} not retained at {path}; "
                f"have {_versions(path)}")
        return spark.read.parquet(
            os.path.join(path, f"{_VERSION_PREFIX}{version}"))
    snap = current_snapshot_path(path)
    return spark.read.parquet(snap) if snap else None


def _clean_orphan_staging(path: str) -> None:
    """Remove staging dirs left by crashed writers (never the live
    versions — a crash before the rename flip leaves only these)."""
    if not os.path.isdir(path):
        return
    for d in os.listdir(path):
        if d.startswith("_staging_"):
            shutil.rmtree(os.path.join(path, d), ignore_errors=True)


def merge_upsert(spark: SparkSession, path: str, batch: DataFrame,
                 key: Sequence[str], order_col: str | None = None,
                 keep_versions: int = 2) -> int:
    """Upsert ``batch`` into the snapshot table at ``path`` on ``key``.

    Last-writer-wins within the batch (ordered by ``order_col`` when
    given, mirroring the reference's VALUES-order semantics — SURVEY.md
    §2.7); batch rows beat target rows on key collision (the UPDATE arm
    of ON DUPLICATE KEY). Returns the new snapshot version number.
    """
    key = list(key)
    # unique source keys first — MERGE semantics require it
    order = [order_col] if order_col else key
    batch_unique = latest_per_key(batch, key, order, desc=True)

    target = read_target(spark, path)
    if target is None:
        merged = batch_unique
    else:
        # priority column: batch (1) beats target (0) per key. Schema
        # evolution: the union keeps ALL columns from both sides — a new
        # batch column backfills null on historical rows, a dropped one
        # stays (null on updated rows), so readers never break mid-stream
        b = batch_unique.withColumn("__prio", F.lit(1))
        t = target.withColumn("__prio", F.lit(0))
        merged = latest_per_key(
            b.unionByName(t, allowMissingColumns=True),
            key, ["__prio"], desc=True
        ).drop("__prio")

    _clean_orphan_staging(path)
    vs = _versions(path)
    new_v = (vs[-1] + 1) if vs else 0
    staging = os.path.join(path, f"_staging_{uuid.uuid4().hex}")
    merged.write.mode("overwrite").parquet(staging)
    final = os.path.join(path, f"{_VERSION_PREFIX}{new_v}")
    os.rename(staging, final)  # atomic flip on a posix fs
    # retain the newest (keep_versions - 1) OLD versions alongside new_v;
    # keep_versions=1 must delete every old version (vs[:-0] == [] bug)
    if keep_versions >= 1:
        drop = vs if keep_versions == 1 else vs[:-(keep_versions - 1)]
    else:
        drop = vs
    for old in drop:
        shutil.rmtree(os.path.join(path, f"{_VERSION_PREFIX}{old}"),
                      ignore_errors=True)
    return new_v


def merge_preview(batch: DataFrame, target: DataFrame,
                  key: Sequence[str], order_col: str) -> DataFrame:
    """Pure-DataFrame MERGE semantics (no filesystem): what the target
    looks like after applying ``batch``. Used by the SQL-oracle check —
    expressible as a windowed union in ANSI SQL."""
    key = list(key)
    common = [c for c in batch.columns if c in set(target.columns)]
    b = latest_per_key(batch, key, [order_col], desc=True).select(
        *common).withColumn("__prio", F.lit(1))
    t = target.select(*common).withColumn("__prio", F.lit(0))
    return latest_per_key(
        b.unionByName(t), key, ["__prio"], desc=True
    ).drop("__prio")
