"""Idempotent composite-key upsert sink (S6/S7/J4, SURVEY.md §2.3/§7.5).

The reference's sink is MySQL ``INSERT ... ON DUPLICATE KEY UPDATE``
(``services/etlService.js:36-53``, ``:177-194``): matched keys update,
new keys insert, re-runs are harmless. The idiomatic Spark equivalent is
``MERGE INTO`` on a transactional table format (Delta/Iceberg); this
container has plain parquet only, so the sink implements the documented
fallback: **bucketed snapshot merge**.

Layout: each snapshot version is hash-bucketed on the merge key
(``__bucket = pmod(xxhash64(key), n_buckets)`` subdirectories). A merge
computes the set of buckets its batch touches, rewrites ONLY those
buckets (union touched-target + batch -> last-writer-wins dedup), and
HARD-LINKS every untouched bucket's files from the previous version into
the new one — no data copied, no rewrite. The new version directory is
staged and atomically renamed into place; readers always see a complete
snapshot; a crashed writer leaves only an orphaned staging directory.

Scale notes: this is the MERGE cost model that survives 100 TB — a batch
touching b of N buckets rewrites b/N of the table (plus the batch), not
100% of it, exactly like Delta/Iceberg rewrite only the files whose keys
match. The bucket scan is partition-PRUNED (``__bucket`` is a partition
column, so untouched buckets are never read), and the bucket id is a
pure function of the key, so the same exchange partitioning is reusable
across merges. Schema-evolving batches (new columns) fall back to one
full bucketed rewrite — mixing schemas across hard-linked buckets would
force mergeSchema on every read.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from imp_etl_spark.operators.dedup import latest_per_key

_VERSION_PREFIX = "v_"
_SPEC_FILE = "_bucketspec.json"
DEFAULT_BUCKETS = 16


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


def _read_spec(snap: str) -> dict | None:
    """Bucket spec of a snapshot dir ({n_buckets, key}), or None for
    legacy flat snapshots."""
    try:
        with open(os.path.join(snap, _SPEC_FILE)) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def read_target(spark: SparkSession, path: str,
                version: int | None = None) -> DataFrame | None:
    """Read the current snapshot, or a retained older one (time travel —
    ``version`` from the ``merge_upsert`` return value; how many stay
    readable is ``keep_versions``). The internal ``__bucket`` partition
    column is dropped — callers see exactly the table schema."""
    if version is not None:
        if version not in _versions(path):
            raise ValueError(
                f"version {version} not retained at {path}; "
                f"have {_versions(path)}")
        snap = os.path.join(path, f"{_VERSION_PREFIX}{version}")
    else:
        snap = current_snapshot_path(path)
        if snap is None:
            return None
    df = spark.read.parquet(snap)
    return df.drop("__bucket") if "__bucket" in df.columns else df


def _clean_orphan_staging(path: str) -> None:
    """Remove staging dirs left by crashed writers (never the live
    versions — a crash before the rename flip leaves only these)."""
    if not os.path.isdir(path):
        return
    for d in os.listdir(path):
        if d.startswith("_staging_"):
            shutil.rmtree(os.path.join(path, d), ignore_errors=True)


def _bucket_expr(key: Sequence[str], n_buckets: int):
    return F.pmod(F.xxhash64(*[F.col(k) for k in key]),
                  F.lit(n_buckets)).cast("int")


def _write_bucketed(df: DataFrame, key: Sequence[str], n_buckets: int,
                    staging: str) -> None:
    """Write a (partial or full) snapshot hash-bucketed on the key.
    One shuffle on the bucket id; each bucket lands as its own
    ``__bucket=k`` partition directory (partition-prunable on read)."""
    out = df.withColumn("__bucket", _bucket_expr(key, n_buckets))
    # co-locate each bucket into one task -> one file per bucket (at
    # 100 TB you'd widen this to hash(key) % files_per_bucket as well)
    out.repartition("__bucket").write.mode("overwrite") \
       .partitionBy("__bucket").parquet(staging)


def _write_spec(staging: str, key: Sequence[str], n_buckets: int) -> None:
    with open(os.path.join(staging, _SPEC_FILE), "w") as f:
        json.dump({"n_buckets": n_buckets, "key": list(key)}, f)


def _link_untouched_buckets(prev_snap: str, staging: str,
                            touched: set[int]) -> int:
    """Hard-link every untouched ``__bucket=k`` directory from the
    previous snapshot into the staging dir (same inodes — zero copy).
    Returns the number of linked buckets."""
    linked = 0
    for entry in os.listdir(prev_snap):
        if not entry.startswith("__bucket="):
            continue
        b = int(entry.split("=", 1)[1])
        if b in touched:
            continue
        src = os.path.join(prev_snap, entry)
        dst = os.path.join(staging, entry)
        os.makedirs(dst, exist_ok=True)
        for fn in os.listdir(src):
            s, t = os.path.join(src, fn), os.path.join(dst, fn)
            try:
                os.link(s, t)
            except OSError:        # cross-device or fs without links
                shutil.copy2(s, t)
        linked += 1
    return linked


def merge_upsert(spark: SparkSession, path: str, batch: DataFrame,
                 key: Sequence[str], order_col: str | None = None,
                 keep_versions: int = 2,
                 n_buckets: int = DEFAULT_BUCKETS) -> int:
    """Upsert ``batch`` into the bucketed snapshot table at ``path`` on
    ``key``.

    Last-writer-wins within the batch (ordered by ``order_col`` when
    given, mirroring the reference's VALUES-order semantics — SURVEY.md
    §2.7); batch rows beat target rows on key collision (the UPDATE arm
    of ON DUPLICATE KEY). Rewrites only the buckets the batch touches
    (see module doc); returns the new snapshot version number.
    """
    key = list(key)
    order = [order_col] if order_col else key
    batch_unique = latest_per_key(batch, key, order, desc=True)

    prev_snap = current_snapshot_path(path)
    _clean_orphan_staging(path)
    vs = _versions(path)
    new_v = (vs[-1] + 1) if vs else 0
    staging = os.path.join(path, f"_staging_{uuid.uuid4().hex}")

    if prev_snap is None:
        _write_bucketed(batch_unique, key, n_buckets, staging)
        _write_spec(staging, key, n_buckets)
    else:
        target = read_target(spark, path)
        spec = _read_spec(prev_snap)
        new_cols = set(batch.columns) - set(target.columns)
        partial_ok = (spec is not None
                      and spec.get("n_buckets") == n_buckets
                      and spec.get("key") == key
                      and not new_cols)
        b = batch_unique.withColumn("__prio", F.lit(1))
        if partial_ok:
            # touched buckets: tiny distinct over the (deduped) batch
            touched = {
                r["b"] for r in batch_unique.select(
                    _bucket_expr(key, n_buckets).alias("b"))
                .distinct().collect()
            }
            bucketed = spark.read.parquet(prev_snap)
            t = (bucketed.filter(F.col("__bucket").isin(*touched))
                 .drop("__bucket")          # partition-pruned scan
                 .withColumn("__prio", F.lit(0))) if touched else None
            merged = (b if t is None else latest_per_key(
                b.unionByName(t, allowMissingColumns=True),
                key, ["__prio"], desc=True)).drop("__prio")
            _write_bucketed(merged, key, n_buckets, staging)
            _write_spec(staging, key, n_buckets)
            _link_untouched_buckets(prev_snap, staging, touched)
        else:
            # legacy/flat snapshot, bucket-count change, or schema
            # evolution: one full rewrite into the bucketed layout.
            # Schema evolution keeps ALL columns from both sides — a new
            # batch column backfills null on historical rows, a dropped
            # one stays (null on updated rows), so readers never break.
            t = target.withColumn("__prio", F.lit(0))
            merged = latest_per_key(
                b.unionByName(t, allowMissingColumns=True),
                key, ["__prio"], desc=True).drop("__prio")
            _write_bucketed(merged, key, n_buckets, staging)
            _write_spec(staging, key, n_buckets)

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
