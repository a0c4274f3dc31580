"""Idempotent composite-key upsert sink (S6/S7/J4, SURVEY.md §2.3/§7.5).

The reference's sink is MySQL ``INSERT ... ON DUPLICATE KEY UPDATE``
(``services/etlService.js:36-53``, ``:177-194``): matched keys update,
new keys insert, re-runs are harmless. The idiomatic Spark equivalent is
``MERGE INTO`` on a transactional table format (Delta/Iceberg); this
container has plain parquet only, so the sink implements the documented
fallback: **bucketed snapshot merge with a manifest-pointer commit** —
the same shape those formats use internally.

Layout: each merge writes its new/rewritten buckets into a fresh
``data_<uuid>/__bucket=k`` directory (hash-bucketed on the merge key,
``__bucket = pmod(xxhash64(key), n_buckets)``). A snapshot version is a
MANIFEST file (``_manifest_v{N}.json``) mapping every bucket id to the
directory that holds its current files — untouched buckets are carried
into the new manifest BY REFERENCE (a path string), touched buckets
point at the freshly written directory. The commit is one atomic
single-file publish of ``_latest.json`` (written LAST via
write-temp-then-replace); readers resolve ``_latest.json`` ->
manifest -> bucket paths and always see a complete snapshot.

Why manifest-pointer instead of directory rename + hard links (the
round-2 design): object stores — the realistic 100 TB substrate — have
no atomic directory rename and no hard links, but a single-object PUT
*is* atomic, which is exactly what the ``_latest.json`` flip needs.
The protocol uses only (a) write new files, (b) overwrite one small
object last; both are portable to S3/GCS/HDFS. Crash at any point
before (b) leaves the previous version live; orphaned data dirs and
dangling manifests are swept on the next merge. Writers are serialized
by the scheduler's overlap guard (ST6, plans/control.py) — the
single-writer assumption the reference's cron loop also makes — and a
version CAS backstops it: the commit re-reads ``_latest.json``
immediately before the flip and, if another writer advanced it since
this merge began, discards the prepared snapshot and retries the whole
merge against the new version (optimistic concurrency, the portable
approximation of a conditional PUT; on S3/GCS the flip itself would be
an If-Match/generation-precondition PUT, making check+flip one atomic
request).

Exactly-once for streaming writers: a merge may carry a transaction
stamp (``txn_app_id``, ``txn_version`` — the shape of Delta's
txnAppId/txnVersion). The stamp rides IN the manifest, so it is
published by the same single-object ``_latest.json`` flip as the data
it describes: a foreachBatch replay of an epoch that already committed
sees its own stamp and becomes a no-op instead of double-applying.

Scale notes: this is the MERGE cost model that survives 100 TB — a
batch touching b of N buckets rewrites b/N of the table (plus the
batch), not 100% of it, exactly like Delta/Iceberg rewrite only the
files whose keys match. The merge reads ONLY the touched buckets'
directories (path-level pruning — stronger than a partition filter:
untouched dirs are never even listed), and the bucket id is a pure
function of the key, so the same exchange partitioning is reusable
across merges. Schema-evolving batches (added/removed/retyped columns
— the dtype check catches silent type drift, not just new names) fall
back to one full bucketed rewrite, so every directory a manifest
references carries the identical schema.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from imp_etl_spark.operators.dedup import latest_per_key

_LEGACY_PREFIX = "v_"            # round-2 dir-rename layout (read-only)
_LATEST = "_latest.json"
_MANIFEST_FMT = "_manifest_v{}.json"
_DATA_PREFIX = "data_"
DEFAULT_BUCKETS = 16


# ---------------------------------------------------------------------------
# manifest plumbing
# ---------------------------------------------------------------------------

def _atomic_write_json(dest: str, obj) -> None:
    """Single-file atomic publish: write a temp object, then one
    replace. On POSIX this is ``os.replace``; on an object store the
    equivalent is a single PUT — no directory rename, no links."""
    tmp = f"{dest}.tmp.{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump(obj, f)
    os.replace(tmp, dest)


def _create_exclusive_json(dest: str, obj) -> bool:
    """Create-if-absent publish: succeeds only if ``dest`` does not
    exist (POSIX O_EXCL; on S3/GCS the equivalent single request is a
    conditional PUT with If-None-Match:*/generation=0). Used for
    manifest files so two racing writers that picked the same version
    number can never clobber each other — exactly one wins the name,
    the other sees False and retries against the new snapshot."""
    try:
        fd = os.open(dest, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError:
        return False
    with os.fdopen(fd, "w") as f:
        json.dump(obj, f)
    return True


def _manifest_versions(path: str) -> list[int]:
    if not os.path.isdir(path):
        return []
    out = []
    for d in os.listdir(path):
        if d.startswith("_manifest_v") and d.endswith(".json"):
            try:
                out.append(int(d[len("_manifest_v"):-len(".json")]))
            except ValueError:
                pass
    return sorted(out)


def _latest_version(path: str) -> int | None:
    try:
        with open(os.path.join(path, _LATEST)) as f:
            return int(json.load(f)["version"])
    except (OSError, ValueError, KeyError, TypeError):
        return None


def _read_manifest(path: str, version: int) -> dict:
    with open(os.path.join(path, _MANIFEST_FMT.format(version))) as f:
        return json.load(f)


def last_txn_version(path: str, app_id: str) -> int | None:
    """Highest committed ``txn_version`` for ``app_id`` at this table,
    or None. Read from the CURRENT manifest — the stamp is republished
    with every commit, so it survives unrelated merges, compaction and
    re-bucketing."""
    latest = _latest_version(path)
    if latest is None:
        return None
    try:
        v = _read_manifest(path, latest).get("txn", {}).get(app_id)
    except (OSError, ValueError):
        return None
    return int(v) if v is not None else None


def current_n_buckets(path: str) -> int | None:
    """Bucket count of the current snapshot, or None if the table does
    not exist yet (callers adopt this instead of guessing, so a restart
    with a different default never degrades merges to full rewrites)."""
    latest = _latest_version(path)
    if latest is None:
        return None
    try:
        nb = _read_manifest(path, latest).get("n_buckets")
    except (OSError, ValueError):
        return None
    return int(nb) if nb else None


def _manifest_df(spark: SparkSession, path: str,
                 manifest: dict) -> DataFrame:
    """Resolve a manifest to a DataFrame (reads exactly the referenced
    bucket directories; an empty manifest yields an empty frame with
    the recorded schema)."""
    rels = list(manifest["buckets"].values())
    if not rels:
        ddl = ", ".join(f"`{c}` {t}"
                        for c, t in manifest.get("schema", {}).items())
        return spark.createDataFrame([], schema=ddl or "__empty STRING")
    df = spark.read.parquet(*[os.path.join(path, r) for r in rels])
    return df.drop("__bucket") if "__bucket" in df.columns else df


def _scan_bucket_dirs(path: str, data_rel: str) -> dict[str, str]:
    """Bucket dirs actually written under ``data_rel`` (absent buckets
    simply hold no rows), as {bucket_id: relative_path}."""
    out: dict[str, str] = {}
    d = os.path.join(path, data_rel)
    if not os.path.isdir(d):
        return out
    for entry in os.listdir(d):
        if entry.startswith("__bucket="):
            out[entry.split("=", 1)[1]] = f"{data_rel}/{entry}"
    return out


# ---------------------------------------------------------------------------
# legacy (round-2 dir-rename) layout — read + migrate only
# ---------------------------------------------------------------------------

def _legacy_versions(path: str) -> list[int]:
    if not os.path.isdir(path):
        return []
    out = []
    for d in os.listdir(path):
        if d.startswith(_LEGACY_PREFIX):
            try:
                out.append(int(d[len(_LEGACY_PREFIX):]))
            except ValueError:
                pass
    return sorted(out)


def _read_legacy(spark: SparkSession, path: str, version: int) -> DataFrame:
    df = spark.read.parquet(
        os.path.join(path, f"{_LEGACY_PREFIX}{version}"))
    return df.drop("__bucket") if "__bucket" in df.columns else df


# ---------------------------------------------------------------------------
# GC
# ---------------------------------------------------------------------------

def _referenced_data_dirs(path: str) -> set[str]:
    refs: set[str] = set()
    for v in _manifest_versions(path):
        try:
            man = _read_manifest(path, v)
        except (OSError, ValueError):
            continue
        refs |= {rel.split("/", 1)[0] for rel in man["buckets"].values()}
    return refs


#: Debris younger than this is spared by the GC sweeps. A racing
#: writer's snapshot passes through states that LOOK like crash debris
#: (data dirs written before their manifest exists; a manifest created
#: ahead of its ``_latest.json`` flip) — deleting those out from under
#: it would let the racer flip ``_latest`` onto a manifest/data dir
#: that no longer exists, bricking the table. Age-gating makes the
#: advertised CAS backstop real: genuine crash debris ages past the
#: threshold and is swept by a later writer, while anything younger is
#: presumed in-flight. (Same rule object-store table formats apply to
#: orphan-file cleanup.)
_GC_MIN_AGE_S = 300.0


def _older_than(p: str, min_age_s: float) -> bool:
    try:
        return (os.path.getmtime(p) + min_age_s) < time.time()
    except OSError:
        return False  # vanished mid-scan: nothing to sweep


def _gc_orphans(path: str, latest: int | None,
                min_age_s: float = _GC_MIN_AGE_S) -> None:
    """Sweep debris from crashed writers: legacy staging dirs, manifests
    written after the last successful ``_latest.json`` flip, and data
    dirs no manifest references — each only once older than
    ``min_age_s`` (see ``_GC_MIN_AGE_S``: younger entries may belong to
    a concurrent writer between its data write and its commit flip)."""
    if not os.path.isdir(path):
        return
    for d in os.listdir(path):
        if d.startswith("_staging_") and _older_than(
                os.path.join(path, d), min_age_s):
            shutil.rmtree(os.path.join(path, d), ignore_errors=True)
    for v in _manifest_versions(path):
        if latest is None or v > latest:
            mp = os.path.join(path, _MANIFEST_FMT.format(v))
            if _older_than(mp, min_age_s):
                try:
                    os.remove(mp)
                except OSError:
                    pass
    refs = _referenced_data_dirs(path)
    for d in os.listdir(path):
        if (d.startswith(_DATA_PREFIX) and d not in refs
                and _older_than(os.path.join(path, d), min_age_s)):
            shutil.rmtree(os.path.join(path, d), ignore_errors=True)


def _apply_retention(path: str, new_v: int, keep_versions: int,
                     legacy_vs: list[int]) -> None:
    """Keep the newest ``keep_versions`` snapshot versions (always
    including the one just committed), then drop the data dirs those
    removed manifests were the last to reference. The before/after
    reference diff removes EXACTLY the dirs this retention orphaned —
    never a dir some concurrent writer wrote but has not published a
    manifest for yet (that is presumed in flight; genuine crash debris
    is ``_gc_orphans``' job, age-gated)."""
    keep = keep_versions if keep_versions >= 1 else 1
    all_vs = sorted(set(_manifest_versions(path)) | set(legacy_vs)
                    | {new_v})
    retained = set(all_vs[-keep:]) | {new_v}
    refs_before = _referenced_data_dirs(path)
    for v in legacy_vs:
        if v not in retained:
            shutil.rmtree(os.path.join(path, f"{_LEGACY_PREFIX}{v}"),
                          ignore_errors=True)
    for v in _manifest_versions(path):
        if v not in retained:
            try:
                os.remove(os.path.join(path, _MANIFEST_FMT.format(v)))
            except OSError:
                pass
    for d in refs_before - _referenced_data_dirs(path):
        shutil.rmtree(os.path.join(path, d), ignore_errors=True)


# ---------------------------------------------------------------------------
# public surface
# ---------------------------------------------------------------------------

def bucket_paths(path: str, version: int | None = None) -> dict[int, str]:
    """Absolute bucket-id -> directory map of a snapshot (the current
    one by default). Exposed for plan tests and debugging."""
    v = _latest_version(path) if version is None else version
    if v is None:
        return {}
    man = _read_manifest(path, v)
    return {int(b): os.path.join(path, rel)
            for b, rel in man["buckets"].items()}


def read_target(spark: SparkSession, path: str,
                version: int | None = None) -> DataFrame | None:
    """Read the current snapshot, or a retained older one (time travel —
    ``version`` from the ``merge_upsert`` return value; how many stay
    readable is ``keep_versions``). The internal ``__bucket`` partition
    column never escapes — callers see exactly the table schema."""
    latest = _latest_version(path)
    mvs = set(_manifest_versions(path))
    legacy = _legacy_versions(path)
    if version is None:
        if latest is not None:
            return _manifest_df(spark, path, _read_manifest(path, latest))
        if legacy:
            return _read_legacy(spark, path, legacy[-1])
        return None
    if version in mvs and (latest is None or version <= latest):
        return _manifest_df(spark, path, _read_manifest(path, version))
    if version in legacy:
        return _read_legacy(spark, path, version)
    have = sorted(mvs | set(legacy))
    raise ValueError(
        f"version {version} not retained at {path}; have {have}")


def _bucket_expr(key: Sequence[str], n_buckets: int):
    return F.pmod(F.xxhash64(*[F.col(k) for k in key]),
                  F.lit(n_buckets)).cast("int")


def _write_bucketed(df: DataFrame, key: Sequence[str], n_buckets: int,
                    data_dir: str, files_per_bucket: int = 1,
                    pre_clustered: bool = False) -> None:
    """Write a (partial or full) snapshot hash-bucketed on the key.
    One shuffle on the bucket id; each bucket lands as its own
    ``__bucket=k`` directory (individually addressable by manifests).

    ``files_per_bucket > 1`` widens each bucket to that many writer
    tasks/files (sub-partitioned by a second key hash) — the knob that
    keeps task size bounded when a bucket holds gigabytes at 100 TB.
    Readers are unaffected (a bucket is a directory either way), and
    the merge cost model is unchanged: touched BUCKETS rewrite whole.

    ``pre_clustered`` (r13): the caller's promise that ``df`` is
    ALREADY exchanged on this exact bucket expression (the fused-dedup
    pipeline shape, ``plans.pipeline._dedup_in_bucket_layout``) — the
    write then skips its repartition, so one exchange serves both the
    dedup window and the layout. Correctness never depends on it (the
    dynamic partitioned write routes rows by the ``__bucket`` VALUE);
    a wrong promise only costs extra files per bucket directory.
    """
    out = df.withColumn("__bucket", _bucket_expr(key, n_buckets))
    if pre_clustered:
        pass  # caller already clustered on (bucket[, sub]) — any fpb
    elif files_per_bucket > 1:
        sub = F.pmod(F.xxhash64(*[F.col(k) for k in key], F.lit("sub")),
                     F.lit(files_per_bucket))
        out = (out.withColumn("__sub", sub)
               .repartition(n_buckets * files_per_bucket,
                            "__bucket", "__sub")
               .drop("__sub"))
    else:
        out = out.repartition("__bucket")
    out.write.mode("overwrite").partitionBy("__bucket").parquet(data_dir)


class ConcurrentWriteError(RuntimeError):
    """Another writer advanced ``_latest.json`` while a merge was in
    flight, and the merge exhausted its retry budget."""


# Test injection point: called once per commit attempt, right before the
# CAS check. Lets tests interleave a competing writer at the worst
# possible moment without threads. Never set in production code.
_pre_commit_hook = None


def merge_upsert(spark: SparkSession, path: str, batch: DataFrame,
                 key: Sequence[str], order_col: str | None = None,
                 keep_versions: int = 2,
                 n_buckets: int = DEFAULT_BUCKETS,
                 files_per_bucket: int = 1,
                 txn_app_id: str | None = None,
                 txn_version: int | None = None,
                 max_commit_retries: int = 3,
                 batch_replaces_touched_buckets: bool = False,
                 expected_version: int | None = None,
                 batch_is_unique: bool = False,
                 batch_pre_clustered: bool = False) -> int:
    """Upsert ``batch`` into the bucketed snapshot table at ``path`` on
    ``key``.

    Last-writer-wins within the batch (ordered by ``order_col`` when
    given, mirroring the reference's VALUES-order semantics — SURVEY.md
    §2.7); batch rows beat target rows on key collision (the UPDATE arm
    of ON DUPLICATE KEY). Rewrites only the buckets the batch touches;
    untouched buckets carry into the new manifest by reference (module
    doc). Partial merges additionally require the batch's column set
    AND dtypes to match the target exactly — a same-name column with a
    changed type would otherwise split the snapshot across two physical
    schemas. Returns the new snapshot version number.

    ``txn_app_id``/``txn_version`` (both or neither): idempotence stamp
    for at-least-once callers (foreachBatch epochs). If the current
    manifest already records ``txn_version`` (or newer) for this app
    id, the merge is a no-op returning the current version — the replay
    guard. The stamp commits atomically with the data (same
    ``_latest.json`` flip). ``max_commit_retries`` bounds the CAS retry
    loop (module doc, Concurrency); each retry re-reads the then-current
    snapshot and re-merges, so no committed writer's buckets are lost.

    ``batch_replaces_touched_buckets``: caller's promise that the batch
    holds EVERY surviving row of every bucket it touches (the
    read-modify-write shape: the caller already read those buckets back
    and folded them in). The merge then skips re-reading the touched
    buckets — each epoch reads them exactly once instead of twice — and
    rows absent from the batch are dropped from touched buckets (on the
    fallback full rewrite too). Meaningless without the schema/bucket
    preconditions of a partial merge holding OR a full rewrite.

    ``expected_version``: optimistic concurrency for read-modify-write
    callers — the snapshot version the caller's read was based on (-1
    for "table must not exist yet"). If the table has moved past it by
    commit time, the prepared snapshot would clobber a committed write
    the caller never read, so the merge raises ``ConcurrentWriteError``
    WITHOUT retrying (a blind re-merge can't help: the caller must
    re-read and recompute). Plain merges leave it None and keep the
    re-merge retry loop.

    ``batch_is_unique``: caller's promise that ``batch`` already holds
    at most one row per ``key`` (e.g. the ETL pipeline's branches end in
    their own ``latest_per_key``) — the merge then skips its defensive
    re-dedup, dropping one Window pass from every epoch's plan.

    ``batch_pre_clustered`` (r13): caller's promise that ``batch`` is
    already exchanged on THIS table's bucket expression
    (``pmod(xxhash64(*key), n_buckets)`` with this call's
    ``n_buckets`` — the fused-dedup pipeline shape). Writes that take
    the batch as-is (table creation; ``batch_replaces_touched_buckets``
    partial merges) then skip the layout repartition — one exchange
    per epoch serves dedup AND layout. Paths that union target rows in
    re-cluster as before. A wrong promise costs file fan-out, never
    correctness (the partitioned write routes by value).
    """
    if (txn_app_id is None) != (txn_version is None):
        raise ValueError("txn_app_id and txn_version go together")
    key = list(key)
    order = [order_col] if order_col else key
    batch_unique = (batch if batch_is_unique
                    else latest_per_key(batch, key, order, desc=True))

    os.makedirs(path, exist_ok=True)
    for _attempt in range(max_commit_retries + 1):
        latest = _latest_version(path)
        if expected_version is not None:
            base = latest if latest is not None else -1
            if base != expected_version:
                raise ConcurrentWriteError(
                    f"{path} moved to version {base} but the caller's "
                    f"read-modify-write was based on {expected_version}; "
                    "re-read and recompute")
        legacy_vs = _legacy_versions(path)
        _gc_orphans(path, latest)
        prev = latest if latest is not None else (
            legacy_vs[-1] if legacy_vs else None)
        new_v = prev + 1 if prev is not None else 0
        data_rel = f"{_DATA_PREFIX}{uuid.uuid4().hex[:12]}"
        data_dir = os.path.join(path, data_rel)

        carried: dict[str, str] = {}
        prev_txn: dict[str, int] = {}
        if prev is None:
            merged = batch_unique
        else:
            if latest is not None:
                man = _read_manifest(path, latest)
                prev_txn = dict(man.get("txn", {}))
                if (txn_app_id is not None
                        and prev_txn.get(txn_app_id) is not None
                        and int(prev_txn[txn_app_id]) >= txn_version):
                    return latest  # replayed epoch: already applied
                target = _manifest_df(spark, path, man)
                tgt_dtypes = dict(man.get("schema") or target.dtypes)
                bat_dtypes = dict(batch_unique.dtypes)
                # exact column-set + dtype equality: anything else (new,
                # dropped, or RETYPED columns) forces the full rewrite so
                # all referenced dirs share one physical schema
                partial_ok = (man.get("n_buckets") == n_buckets
                              and man.get("key") == key
                              and bat_dtypes == tgt_dtypes)
            else:
                # legacy dir-rename snapshot: migrate via one full rewrite
                target = _read_legacy(spark, path, legacy_vs[-1])
                partial_ok = False
            b = batch_unique.withColumn("__prio", F.lit(1))
            if partial_ok:
                # touched buckets: tiny distinct over the (deduped) batch
                touched = {
                    r["b"] for r in batch_unique.select(
                        _bucket_expr(key, n_buckets).alias("b"))
                    .distinct().collect()
                }
                if batch_replaces_touched_buckets:
                    # caller already folded the touched buckets' rows in:
                    # no second read, the batch IS those buckets' content
                    merged = batch_unique
                else:
                    touched_rels = [man["buckets"][s]
                                    for s in (str(t) for t in touched)
                                    if s in man["buckets"]]
                    # path-level pruning: ONLY touched bucket dirs read
                    t = (spark.read.parquet(
                            *[os.path.join(path, r) for r in touched_rels])
                         .withColumn("__prio", F.lit(0))
                         if touched_rels else None)
                    merged = (b if t is None else latest_per_key(
                        b.unionByName(t), key, ["__prio"], desc=True)
                    ).drop("__prio")
                carried = {s: rel for s, rel in man["buckets"].items()
                           if int(s) not in touched}
            else:
                # legacy/flat snapshot, bucket-count change, or schema
                # evolution: one full rewrite into the bucketed layout.
                # Schema evolution keeps ALL columns from both sides — a
                # new batch column backfills null on historical rows, a
                # dropped one stays (null on updated rows), so readers
                # never break.
                t = target.withColumn("__prio", F.lit(0))
                if batch_replaces_touched_buckets:
                    # replace semantics under a full rewrite: target rows
                    # in batch-touched buckets are superseded wholesale
                    tb = _bucket_expr(key, n_buckets)
                    touched_df = batch_unique.select(
                        _bucket_expr(key, n_buckets).alias("__tb")
                    ).distinct()
                    t = (t.withColumn("__tb", tb)
                         .join(F.broadcast(touched_df), on="__tb",
                               how="left_anti").drop("__tb"))
                merged = latest_per_key(
                    b.unionByName(t, allowMissingColumns=True),
                    key, ["__prio"], desc=True).drop("__prio")

        _write_bucketed(merged, key, n_buckets, data_dir, files_per_bucket,
                        pre_clustered=(batch_pre_clustered
                                       and batch_is_unique
                                       and merged is batch_unique))
        manifest = {
            "n_buckets": n_buckets,
            "key": key,
            "schema": dict(merged.dtypes),
            "buckets": {**carried, **_scan_bucket_dirs(path, data_rel)},
            "txn": ({**prev_txn, txn_app_id: txn_version}
                    if txn_app_id is not None else prev_txn),
        }
        if _pre_commit_hook is not None:
            _pre_commit_hook()
        # Version CAS, two portable checks: (1) the manifest name for
        # new_v must be ours alone (create-if-absent — a same-version
        # racer can never clobber a committed manifest); (2) the
        # snapshot we merged against must still be current, else a
        # committed writer's buckets would be dropped. Either failure
        # discards the prepared snapshot and re-merges from the top.
        man_path = os.path.join(path, _MANIFEST_FMT.format(new_v))
        if not _create_exclusive_json(man_path, manifest):
            shutil.rmtree(data_dir, ignore_errors=True)
            continue
        if _latest_version(path) != latest:
            try:
                os.remove(man_path)
            except OSError:
                pass
            shutil.rmtree(data_dir, ignore_errors=True)
            continue
        # THE commit point: one atomic single-object publish, written last
        _atomic_write_json(os.path.join(path, _LATEST), {"version": new_v})
        _apply_retention(path, new_v, keep_versions, legacy_vs)
        return new_v
    raise ConcurrentWriteError(
        f"lost the commit race at {path} {max_commit_retries + 1} times; "
        "writers are expected to be serialized (ST6 overlap guard)")


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


# ---------------------------------------------------------------------------
# maintenance: compaction + re-bucketing
# ---------------------------------------------------------------------------

def _bucket_file_counts(path: str, manifest: dict) -> dict[str, int]:
    out: dict[str, int] = {}
    for b, rel in manifest["buckets"].items():
        d = os.path.join(path, rel)
        try:
            out[b] = sum(1 for f in os.listdir(d)
                         if f.endswith(".parquet"))
        except OSError:
            out[b] = 0
    return out


def compact_snapshot(spark: SparkSession, path: str,
                     max_files_per_bucket: int = 1,
                     keep_versions: int = 2) -> int:
    """Compact fragmented buckets of the current snapshot: any bucket
    holding more than ``max_files_per_bucket`` parquet files (e.g.
    written wide via ``files_per_bucket`` > 1, or whose writer task
    count drifted) is rewritten into a fresh data dir at the target
    file count; every other bucket carries into the new manifest BY
    REFERENCE, unread and unmoved. Publishes a new snapshot version via
    the same manifest-pointer commit as ``merge_upsert`` — readers
    never see a half-compacted table, and time travel to the
    pre-compaction version keeps working until retention drops it.

    Returns the committed version (the CURRENT version unchanged if
    nothing is fragmented — compaction is a no-op then, not an empty
    commit).

    Scale notes: this is the OPTIMIZE/rewrite-data-files half of what
    table formats run as table maintenance. Cost is proportional to the
    fragmented fraction only (path-level pruning: untouched dirs are
    never listed, let alone read), the rewrite reuses the key->bucket
    function so no rows change buckets, and the single-writer rule
    (scheduler overlap guard, ST6) serializes it against merges.
    """
    latest = _latest_version(path)
    if latest is None:
        raise ValueError(f"no snapshot at {path}")
    man = _read_manifest(path, latest)
    target = max(1, max_files_per_bucket)
    counts = _bucket_file_counts(path, man)
    frag = {b: rel for b, rel in man["buckets"].items()
            if counts.get(b, 0) > target}
    if not frag:
        return latest

    key = list(man["key"])
    n_buckets = int(man["n_buckets"])
    new_v = latest + 1
    data_rel = f"{_DATA_PREFIX}{uuid.uuid4().hex[:12]}"
    df = spark.read.parquet(*[os.path.join(path, r)
                              for r in frag.values()])
    if "__bucket" in df.columns:
        df = df.drop("__bucket")
    _write_bucketed(df, key, n_buckets, os.path.join(path, data_rel),
                    files_per_bucket=target)
    carried = {b: rel for b, rel in man["buckets"].items()
               if b not in frag}
    manifest = {
        "n_buckets": n_buckets,
        "key": key,
        "schema": man.get("schema") or dict(df.dtypes),
        "buckets": {**carried, **_scan_bucket_dirs(path, data_rel)},
        "txn": dict(man.get("txn", {})),  # maintenance keeps the stamps
    }
    _maintenance_commit(path, new_v, latest, data_rel, manifest)
    _apply_retention(path, new_v, keep_versions, _legacy_versions(path))
    return new_v


def _maintenance_commit(path: str, new_v: int, latest: int,
                        data_rel: str, manifest: dict) -> None:
    """Same commit protocol as merge_upsert: create-if-absent manifest +
    version CAS before the flip (maintenance runs under the same
    single-writer rule; this is the backstop, not the lock). On either
    failure the prepared data dir AND the just-created manifest are
    removed — a surviving manifest would reference deleted dirs and
    skew retention/`bucket_paths` until the next GC sweep."""
    man_path = os.path.join(path, _MANIFEST_FMT.format(new_v))
    if not _create_exclusive_json(man_path, manifest):
        shutil.rmtree(os.path.join(path, data_rel), ignore_errors=True)
        raise ConcurrentWriteError(
            f"maintenance lost the commit race at {path}; re-run it")
    if _latest_version(path) != latest:
        try:
            os.remove(man_path)
        except OSError:
            pass
        shutil.rmtree(os.path.join(path, data_rel), ignore_errors=True)
        raise ConcurrentWriteError(
            f"maintenance lost the commit race at {path}; re-run it")
    _atomic_write_json(os.path.join(path, _LATEST), {"version": new_v})


def rebucket(spark: SparkSession, path: str, n_buckets: int,
             keep_versions: int = 2,
             files_per_bucket: int = 1) -> int:
    """Re-hash the current snapshot into ``n_buckets`` buckets (one
    full rewrite + manifest-pointer commit). The growth path for the
    merge cost model: buckets are sized at table creation, and when the
    table outgrows them (bucket dirs exceeding a healthy task size even
    at ``files_per_bucket`` fan-out), doubling ``n_buckets`` here
    restores the b/N partial-rewrite economics — subsequent
    ``merge_upsert(..., n_buckets=<new>)`` calls take the partial path
    against the new layout. Single full shuffle on the new bucket id;
    idempotent under re-run (a crash before the ``_latest.json`` flip
    leaves the old version live)."""
    latest = _latest_version(path)
    if latest is None:
        raise ValueError(f"no snapshot at {path}")
    man = _read_manifest(path, latest)
    key = list(man["key"])
    df = _manifest_df(spark, path, _read_manifest(path, latest))
    new_v = latest + 1
    data_rel = f"{_DATA_PREFIX}{uuid.uuid4().hex[:12]}"
    _write_bucketed(df, key, n_buckets, os.path.join(path, data_rel),
                    files_per_bucket=files_per_bucket)
    manifest = {
        "n_buckets": n_buckets,
        "key": key,
        "schema": man.get("schema") or dict(df.dtypes),
        "buckets": _scan_bucket_dirs(path, data_rel),
        "txn": dict(man.get("txn", {})),  # maintenance keeps the stamps
    }
    _maintenance_commit(path, new_v, latest, data_rel, manifest)
    _apply_retention(path, new_v, keep_versions, _legacy_versions(path))
    return new_v


def lookup(spark: SparkSession, path: str, key_values: dict,
           version: int | None = None) -> DataFrame:
    """Indexed point lookup against the snapshot: the bucket id is a
    pure function of the key, so an equality probe on the FULL merge
    key resolves to exactly one bucket directory — the read lists and
    scans 1/N of the table (path-level pruning, the sink-side analog of
    the reference's indexed point scans, index.js:46-140) and the
    residual equality filter pushes into that scan.

    ``key_values`` must bind every column of the table's merge key
    (order-insensitive); extra non-key columns are applied as plain
    pushed filters after the prune.
    """
    v = _latest_version(path) if version is None else version
    if v is None:
        raise ValueError(f"no snapshot at {path}")
    man = _read_manifest(path, v)
    key = list(man["key"])
    missing = [k for k in key if k not in key_values]
    if missing:
        raise ValueError(f"point lookup must bind the full key {key}; "
                         f"missing {missing}")
    n_buckets = int(man["n_buckets"])
    row = spark.createDataFrame(
        [tuple(key_values[k] for k in key)],
        ", ".join(f"`{k}` {dict(man['schema'])[k]}" for k in key))
    b = row.select(_bucket_expr(key, n_buckets).alias("b")).head()["b"]
    rel = man["buckets"].get(str(b))
    if rel is None:
        # bucket never materialized -> key cannot exist
        return _manifest_df(spark, path, {"buckets": {},
                                          "schema": man.get("schema", {})})
    df = spark.read.parquet(os.path.join(path, rel))
    if "__bucket" in df.columns:
        df = df.drop("__bucket")
    for col, val in key_values.items():
        df = df.filter(F.col(col) == F.lit(val))
    return df
