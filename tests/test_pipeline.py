"""End-to-end pipeline + upsert-sink semantics on family-B fixtures."""

from __future__ import annotations

from pyspark.sql import functions as F

from imp_etl_spark.plans.pipeline import build_pipeline, reference_keys
from imp_etl_spark.plans.runner import run_etl
from imp_etl_spark.plans.upsert import merge_upsert, read_target
from tests.fixtures_b import make_frames


def test_reference_keys_filters_queue(spark):
    queue, _, _ = make_frames(spark)
    keys = {r["reference_no"] for r in reference_keys(queue).collect()}
    # NULL/empty refs and NULL table rows dropped; duplicates collapsed
    assert keys == {"REF-1", "REF-2", "REF-GONE"}


def test_pipeline_branches(spark):
    queue, voucher, txn = make_frames(spark)
    res = build_pipeline(queue, voucher, txn,
                         voucher_key=["voucher_id", "reference_no"],
                         transaction_key=["voucher_details_id", "reference_no"])

    valid = res.voucher.valid.collect()
    # V9 (not queued) pruned; falsy-key rows skipped; V1 dup deduped
    ids = sorted((r["voucher_id"], r["reference_no"]) for r in valid)
    assert ids == [("V1", "REF-1"), ("V2", "REF-1"), ("V3", "REF-2")]
    assert res.voucher.skipped.count() == 2  # None key + '' key

    v1 = next(r for r in valid if r["voucher_id"] == "V1")
    # cleanse applied: T1 upper, T2 enum, Q1 zero->null, Q4 day shift
    assert v1["first_name"] in ("JUAN", "JUAN UPDATED")
    v2 = next(r for r in valid if r["voucher_id"] == "V2")
    assert v2["sex"] == "FEMALE"
    assert v2["farm_area"] is None           # '0.00' -> Q1 null
    assert v2["birthday"] == "1988-01-14"    # Q4 UTC shift
    v3 = next(r for r in valid if r["voucher_id"] == "V3")
    assert v3["farm_area"] == 12.0           # prefix parse
    assert v3["birthday"] is None

    # missing refs: REF-GONE has no voucher and no txn rows
    assert {r["reference_no"] for r in res.voucher.missing_refs.collect()} == {"REF-GONE"}
    assert {r["reference_no"] for r in res.transaction.missing_refs.collect()} == {"REF-GONE"}

    t = {r["voucher_details_id"]: r for r in res.transaction.valid.collect()}
    assert t["T1"]["ishold"] == 1            # Q3: '0' truthy
    assert t["T2"]["quantity"] is None       # Q1
    assert t["T1"]["payout"] == "1" and t["T2"]["payout"] == "0"
    assert t["T1"]["transac_date"] == "2024-03-01"


def test_merge_upsert_idempotent_and_lww(spark, tmp_path):
    path = str(tmp_path / "voucher_tgt")
    df1 = spark.createDataFrame(
        [("V1", "R1", "a", 1), ("V2", "R1", "b", 1)],
        "voucher_id string, reference_no string, payload string, seq int")
    v0 = merge_upsert(spark, path, df1, ["voucher_id", "reference_no"], "seq")
    assert v0 == 0
    assert read_target(spark, path).count() == 2

    # batch with an update (V1) + an insert (V3) + intra-batch dup (V3 twice,
    # higher seq wins)
    df2 = spark.createDataFrame(
        [("V1", "R1", "a2", 2), ("V3", "R1", "c1", 1), ("V3", "R1", "c2", 2)],
        "voucher_id string, reference_no string, payload string, seq int")
    merge_upsert(spark, path, df2, ["voucher_id", "reference_no"], "seq")
    state = {r["voucher_id"]: r["payload"] for r in read_target(spark, path).collect()}
    assert state == {"V1": "a2", "V2": "b", "V3": "c2"}

    # idempotence: re-applying the same batch changes nothing (ST4)
    merge_upsert(spark, path, df2, ["voucher_id", "reference_no"], "seq")
    state2 = {r["voucher_id"]: r["payload"] for r in read_target(spark, path).collect()}
    assert state2 == state


def test_merge_batch_is_unique_matches_default_path(spark, tmp_path):
    """batch_is_unique=True on a pre-deduped batch commits the identical
    sink state as the default defensive-re-dedup path on the raw batch
    (the flag only elides a provably-no-op Window pass)."""
    from imp_etl_spark.operators.dedup import latest_per_key

    raw = spark.createDataFrame(
        [("V1", "R1", "old", 1), ("V1", "R1", "new", 2),
         ("V2", "R1", "only", 1), ("V3", "R2", "x1", 3),
         ("V3", "R2", "x0", 1)],
        "voucher_id string, reference_no string, payload string, seq int")
    key = ["voucher_id", "reference_no"]

    p_default = str(tmp_path / "via_default")
    merge_upsert(spark, p_default, raw, key, "seq")
    p_flagged = str(tmp_path / "via_flag")
    merge_upsert(spark, p_flagged,
                 latest_per_key(raw, key, ["seq"], desc=True), key, "seq",
                 batch_is_unique=True)

    rows = lambda p: sorted(map(tuple, read_target(spark, p).collect()))
    assert rows(p_flagged) == rows(p_default)
    assert {r[2] for r in rows(p_flagged)} == {"new", "only", "x1"}

    # and the partial-merge path (existing target) agrees too
    upd = spark.createDataFrame(
        [("V2", "R1", "upd", 5)],
        "voucher_id string, reference_no string, payload string, seq int")
    merge_upsert(spark, p_default, upd, key, "seq")
    merge_upsert(spark, p_flagged, upd, key, "seq", batch_is_unique=True)
    assert rows(p_flagged) == rows(p_default)


def test_run_etl_summary_and_watermark(spark, tmp_path):
    queue, voucher, txn = make_frames(spark)
    summary = run_etl(spark, queue, voucher, txn,
                      str(tmp_path / "v"), str(tmp_path / "t"))
    assert summary["processedVoucherCount"] == 3
    assert summary["skippedVoucherCount"] == 2
    assert summary["processedTransactionCount"] == 3
    assert summary["skippedTransactionCount"] == 1
    assert summary["watermark"] == 8
    assert any("REF-GONE" in w for w in summary["warningSample"])

    # incremental run with watermark: empty queue -> nothing reprocessed
    summary2 = run_etl(spark, queue, voucher, txn,
                       str(tmp_path / "v"), str(tmp_path / "t"),
                       watermark=summary["watermark"])
    assert summary2["processedVoucherCount"] == 0
    assert summary2["watermark"] == 8
    assert read_target(spark, str(tmp_path / "v")).count() == 3


def test_st8_retry_transient_failure_then_success(spark, tmp_path, monkeypatch):
    """ST8 (etlService.js:78-99): a sink write that fails twice then
    succeeds is retried with the fixed delay and the run ends normally."""
    import imp_etl_spark.plans.runner as runner

    real = runner.merge_upsert
    calls = {"n": 0}

    def flaky(spark_, path, batch, key, order_col=None, **kw):
        if path.endswith("/v"):
            calls["n"] += 1
            if calls["n"] <= 2:
                raise RuntimeError("transient sink outage")
        return real(spark_, path, batch, key, order_col, **kw)

    monkeypatch.setattr(runner, "merge_upsert", flaky)
    sleeps: list[float] = []
    queue, voucher, txn = make_frames(spark)
    summary = run_etl(spark, queue, voucher, txn,
                      str(tmp_path / "v"), str(tmp_path / "t"),
                      retry_delay_s=0.01, _sleep=sleeps.append)
    assert calls["n"] == 3                      # 2 failures + 1 success
    assert sleeps == [0.01, 0.01]               # fixed delay between tries
    assert summary["processedVoucherCount"] == 3
    assert summary["skippedVoucherCount"] == 2
    assert read_target(spark, str(tmp_path / "v")).count() == 3


def test_st8_retry_final_failure_counts_skipped_with_warning(
        spark, tmp_path, monkeypatch):
    """ST8 final-failure parity: after 3 failed attempts the branch's
    would-be-processed rows count as SKIPPED, a reference-shaped warning
    surfaces, and the other branch still commits."""
    import imp_etl_spark.plans.runner as runner

    real = runner.merge_upsert
    attempts = {"n": 0}

    def dead(spark_, path, batch, key, order_col=None, **kw):
        if path.endswith("/v"):
            attempts["n"] += 1
            raise RuntimeError("sink is down")
        return real(spark_, path, batch, key, order_col, **kw)

    monkeypatch.setattr(runner, "merge_upsert", dead)
    queue, voucher, txn = make_frames(spark)
    summary = run_etl(spark, queue, voucher, txn,
                      str(tmp_path / "v"), str(tmp_path / "t"),
                      retry_delay_s=0.0, _sleep=lambda _s: None)
    assert attempts["n"] == 3
    assert summary["processedVoucherCount"] == 0
    # 2 falsy-key skips + the 3 valid rows the dead sink never took
    assert summary["skippedVoucherCount"] == 5
    assert any("after 3 retries" in w and "voucher" in w
               for w in summary["warningSample"])
    # transaction branch unaffected
    assert summary["processedTransactionCount"] == 3
    assert read_target(spark, str(tmp_path / "t")).count() == 3
    # the watermark must NOT advance past rows a failed sink never
    # took — the next incremental run has to see them again (advancing
    # would silently drop them forever in watermark mode)
    assert summary["watermark"] is None

    # with both sinks healthy the same run advances the watermark
    monkeypatch.setattr(runner, "merge_upsert", real)
    summary2 = run_etl(spark, queue, voucher, txn,
                       str(tmp_path / "v2"), str(tmp_path / "t2"),
                       retry_delay_s=0.0, _sleep=lambda _s: None)
    assert summary2["watermark"] == 8


def test_upsert_time_travel_and_staging_cleanup(spark, tmp_path):
    """Retained snapshot versions stay readable (time travel); orphaned
    staging dirs from crashed writers are swept on the next merge."""
    import os

    import pytest
    from pyspark.sql import functions as F

    from imp_etl_spark.plans.upsert import merge_upsert, read_target

    path = str(tmp_path / "tt")
    base = spark.range(5).select(
        F.col("id").alias("k"), F.lit("a").alias("v"),
        F.col("id").alias("ord"))
    v0 = merge_upsert(spark, path, base, ["k"], "ord")
    upd = spark.range(2).select(
        F.col("id").alias("k"), F.lit("b").alias("v"),
        (F.col("id") + 10).alias("ord"))
    # simulate crashed writers before merging again: a legacy staging
    # dir, an unreferenced data dir, and a manifest written after the
    # last _latest.json flip (crash between manifest and commit).
    # Backdate their mtimes past the GC age gate — fresh entries are
    # presumed to belong to an in-flight concurrent writer and spared.
    import time as _time

    from imp_etl_spark.plans.upsert import _GC_MIN_AGE_S
    stale = _time.time() - (_GC_MIN_AGE_S + 60)
    for debris in ("_staging_deadbeef", "data_deadbeef"):
        os.makedirs(os.path.join(path, debris))
    with open(os.path.join(path, "_manifest_v99.json"), "w") as f:
        f.write('{"n_buckets": 16, "key": ["k"], "buckets": {}}')
    for debris in ("_staging_deadbeef", "data_deadbeef",
                   "_manifest_v99.json"):
        os.utime(os.path.join(path, debris), (stale, stale))
    v1 = merge_upsert(spark, path, upd, ["k"], "ord")

    assert not [d for d in os.listdir(path) if d.startswith("_staging_")]
    assert not os.path.isdir(os.path.join(path, "data_deadbeef"))
    assert not os.path.exists(os.path.join(path, "_manifest_v99.json"))
    cur = {r["k"]: r["v"] for r in read_target(spark, path).collect()}
    assert cur[0] == "b" and cur[4] == "a"
    old = {r["k"]: r["v"] for r in read_target(spark, path, version=v0).collect()}
    assert old[0] == "a"
    with pytest.raises(ValueError, match="not retained"):
        read_target(spark, path, version=99)
    assert v1 == v0 + 1


def test_upsert_retention_keep_one(spark, tmp_path):
    """keep_versions=1 keeps ONLY the newest snapshot: one manifest
    file, and no data directory that isn't referenced by it."""
    import os

    from imp_etl_spark.plans.upsert import _manifest_versions, _read_manifest

    path = str(tmp_path / "keep1")
    for i in range(3):
        batch = spark.createDataFrame([(1, f"v{i}", i)], "k INT, v STRING, ord INT")
        merge_upsert(spark, path, batch, ["k"], "ord", keep_versions=1)
    assert _manifest_versions(path) == [2]
    referenced = {rel.split("/")[0] for rel in
                  _read_manifest(path, 2)["buckets"].values()}
    data_dirs = {d for d in os.listdir(path) if d.startswith("data_")}
    assert data_dirs == referenced
    assert [r["v"] for r in read_target(spark, path).collect()] == ["v2"]


def test_bucketed_merge_rewrites_only_touched_buckets(spark, tmp_path):
    """The 100 TB merge cost model: a batch touching one key rewrites
    the key's bucket only; every other bucket carries into the new
    MANIFEST by reference — the same path string as the previous
    version, no data copied, rewritten, or linked."""
    from imp_etl_spark.plans.upsert import _read_manifest

    path = str(tmp_path / "bucketed")
    base = spark.createDataFrame(
        [(k, f"v{k}", k) for k in range(200)], "k INT, v STRING, ord INT")
    v0 = merge_upsert(spark, path, base, ["k"], "ord", n_buckets=8,
                      keep_versions=5)
    man0 = _read_manifest(path, v0)["buckets"]
    assert len(man0) == 8

    one = spark.createDataFrame([(7, "updated", 999)], "k INT, v STRING, ord INT")
    v1 = merge_upsert(spark, path, one, ["k"], "ord", n_buckets=8,
                      keep_versions=5)
    man1 = _read_manifest(path, v1)["buckets"]

    rewritten = [b for b in man0 if man1[b] != man0[b]]
    carried = [b for b in man0 if man1[b] == man0[b]]
    assert len(rewritten) == 1, f"expected 1 rewritten bucket, got {rewritten}"
    assert len(carried) == 7

    # semantics unchanged: the update landed, everything else intact
    state = {r["k"]: r["v"] for r in read_target(spark, path).collect()}
    assert state[7] == "updated" and state[3] == "v3" and len(state) == 200
    # and time travel still reads the pre-update bucketed snapshot
    old = {r["k"]: r["v"] for r in read_target(spark, path, version=v0).collect()}
    assert old[7] == "v7"


def test_merge_commit_needs_no_rename_or_links(spark, tmp_path,
                                               monkeypatch):
    """Object-store portability: the whole merge+commit protocol must
    work on a filesystem with NO hard links and NO atomic rename —
    only new-file writes and single-FILE replace (= one PUT). The shim
    makes os.link/os.rename raise and restricts os.replace to files."""
    import os

    real_replace = os.replace

    def no_link(*a, **kw):
        raise OSError("links not supported (object store)")

    def no_rename(*a, **kw):
        raise OSError("rename not supported (object store)")

    def file_only_replace(src, dst, **kw):
        if os.path.isdir(src):
            raise OSError("directory rename not supported (object store)")
        return real_replace(src, dst, **kw)

    monkeypatch.setattr(os, "link", no_link)
    monkeypatch.setattr(os, "rename", no_rename)
    monkeypatch.setattr(os, "replace", file_only_replace)

    path = str(tmp_path / "objstore")
    base = spark.createDataFrame(
        [(k, f"v{k}", k) for k in range(50)], "k INT, v STRING, ord INT")
    v0 = merge_upsert(spark, path, base, ["k"], "ord", n_buckets=4)
    one = spark.createDataFrame([(3, "upd", 99)], "k INT, v STRING, ord INT")
    v1 = merge_upsert(spark, path, one, ["k"], "ord", n_buckets=4)
    state = {r["k"]: r["v"] for r in read_target(spark, path).collect()}
    assert state[3] == "upd" and len(state) == 50 and v1 == v0 + 1


def test_files_per_bucket_widens_write_parallelism(spark, tmp_path):
    """files_per_bucket=4 must produce multiple data files per bucket
    dir (bounded task size at 100 TB) without changing semantics or the
    manifest's bucket-level addressing."""
    import os

    from imp_etl_spark.plans.upsert import bucket_paths

    path = str(tmp_path / "wide")
    base = spark.createDataFrame(
        [(k, f"v{k}", k) for k in range(2000)], "k INT, v STRING, ord INT")
    merge_upsert(spark, path, base, ["k"], "ord", n_buckets=4,
                 files_per_bucket=4)
    paths = bucket_paths(path)
    assert len(paths) == 4
    files = [f for f in os.listdir(paths[0]) if f.endswith(".parquet")]
    assert len(files) > 1, "expected multiple files in one bucket"
    assert read_target(spark, path).count() == 2000

    one = spark.createDataFrame([(7, "upd", 9999)], "k INT, v STRING, ord INT")
    merge_upsert(spark, path, one, ["k"], "ord", n_buckets=4,
                 files_per_bucket=4)
    state = {r["k"]: r["v"] for r in read_target(spark, path).collect()}
    assert state[7] == "upd" and len(state) == 2000


def test_legacy_dir_snapshot_reads_and_migrates(spark, tmp_path):
    """A round-2 dir-rename layout (v_N dirs + _bucketspec.json) stays
    readable, and its next merge migrates it into the manifest layout
    via one full rewrite with the version counter continuing."""
    import json
    import os

    from imp_etl_spark.plans.upsert import (
        _bucket_expr,
        _read_manifest,
        merge_upsert,
        read_target,
    )

    path = str(tmp_path / "legacy")
    snap = os.path.join(path, "v_3")
    base = spark.createDataFrame(
        [(k, f"v{k}", k) for k in range(30)], "k INT, v STRING, ord INT")
    base.withColumn("__bucket", _bucket_expr(["k"], 4)) \
        .repartition("__bucket").write.partitionBy("__bucket").parquet(snap)
    with open(os.path.join(snap, "_bucketspec.json"), "w") as f:
        json.dump({"n_buckets": 4, "key": ["k"]}, f)

    # readable as-is
    assert read_target(spark, path).count() == 30

    upd = spark.createDataFrame([(1, "new", 99)], "k INT, v STRING, ord INT")
    v4 = merge_upsert(spark, path, upd, ["k"], "ord", n_buckets=4,
                      keep_versions=1)
    assert v4 == 4  # version counter continues past the legacy max
    man = _read_manifest(path, v4)
    assert len({rel.split("/")[0] for rel in man["buckets"].values()}) == 1
    state = {r["k"]: r["v"] for r in read_target(spark, path).collect()}
    assert state[1] == "new" and len(state) == 30
    # keep_versions=1: the legacy dir is gone after the migrating merge
    assert not os.path.isdir(snap)


def test_partial_merge_rejects_retyped_column(spark, tmp_path):
    """A batch whose column keeps its NAME but changes TYPE must not
    take the partial path (mixed physical schemas across referenced
    dirs); the full rewrite unifies the type for every bucket."""
    from imp_etl_spark.plans.upsert import _read_manifest

    path = str(tmp_path / "retype")
    base = spark.createDataFrame(
        [(k, k, k) for k in range(40)], "k INT, v INT, ord INT")
    merge_upsert(spark, path, base, ["k"], "ord", n_buckets=4)
    widened = spark.createDataFrame(
        [(1, 2.5, 99)], "k INT, v DOUBLE, ord INT")
    v1 = merge_upsert(spark, path, widened, ["k"], "ord", n_buckets=4)

    man1 = _read_manifest(path, v1)
    # full rewrite: every bucket points into ONE fresh data dir
    parents = {rel.split("/")[0] for rel in man1["buckets"].values()}
    assert len(parents) == 1
    assert man1["schema"]["v"] == "double"
    out = {r["k"]: r["v"] for r in read_target(spark, path).collect()}
    assert out[1] == 2.5 and out[2] == 2.0 and len(out) == 40


def test_bucketed_merge_bucket_count_change_full_rewrite(spark, tmp_path):
    """Changing n_buckets can't silently mix layouts: the merge detects
    the spec mismatch and does one full rewrite into the new layout."""
    import os

    from imp_etl_spark.plans.upsert import _read_manifest

    path = str(tmp_path / "rebucket")
    base = spark.createDataFrame(
        [(k, "a", k) for k in range(50)], "k INT, v STRING, ord INT")
    merge_upsert(spark, path, base, ["k"], "ord", n_buckets=4)
    upd = spark.createDataFrame([(1, "b", 99)], "k INT, v STRING, ord INT")
    v1 = merge_upsert(spark, path, upd, ["k"], "ord", n_buckets=8)
    man = _read_manifest(path, v1)
    assert man["n_buckets"] == 8 and len(man["buckets"]) == 8
    # full rewrite into the new layout: one fresh data dir holds all
    assert len({rel.split("/")[0] for rel in man["buckets"].values()}) == 1
    state = {r["k"]: r["v"] for r in read_target(spark, path).collect()}
    assert state[1] == "b" and len(state) == 50


def test_branch_counts_before_any_action_do_not_block(spark):
    """processed_count()/skipped_count() called BEFORE the merge runs must
    fall back to a count() instead of blocking on Observation.get
    (round-1 advice: the unconditional .get hung the driver)."""
    import threading

    queue, voucher, txn = make_frames(spark)
    res = build_pipeline(queue, voucher, txn,
                         voucher_key=["voucher_id", "reference_no"],
                         transaction_key=["voucher_details_id", "reference_no"])
    out: dict[str, int] = {}

    def _read():
        out["p"] = res.voucher.processed_count()
        out["s"] = res.voucher.skipped_count()

    t = threading.Thread(target=_read, daemon=True)
    t.start()
    t.join(timeout=120)
    assert not t.is_alive(), "count read blocked without an action"
    assert out == {"p": 3, "s": 2}
    # after the fallback action ran, the observation path agrees
    assert res.voucher.processed_count() == 3
    for b in (res.voucher, res.transaction):
        if b.cleansed is not None:
            b.cleansed.unpersist()


def test_upsert_schema_evolution(spark, tmp_path):
    """A batch with a NEW column merges cleanly: historical rows backfill
    null, updated rows carry the new value, and no column is lost."""
    from pyspark.sql import functions as F

    from imp_etl_spark.plans.upsert import merge_upsert, read_target

    path = str(tmp_path / "evolve")
    base = spark.createDataFrame(
        [(k, "old", k) for k in range(4)], "k INT, v STRING, ord INT")
    merge_upsert(spark, path, base, ["k"], "ord")
    evolved = spark.createDataFrame(
        [(0, "new", 10, "extra0")], "k INT, v STRING, ord INT, note STRING")
    merge_upsert(spark, path, evolved, ["k"], "ord")

    out = {r["k"]: (r["v"], r["note"]) for r in read_target(spark, path).collect()}
    assert out[0] == ("new", "extra0")
    assert out[1] == ("old", None) and len(out) == 4


def test_compact_snapshot_merges_fragmented_buckets_only(spark, tmp_path):
    """Table maintenance (OPTIMIZE half): after a wide write
    (files_per_bucket=3) fragments some buckets, compaction rewrites
    ONLY those buckets down to one file each, carries the rest by
    reference, and publishes a new version — data identical, old
    version still time-travelable."""
    from imp_etl_spark.plans.upsert import (
        _bucket_file_counts, _read_manifest, compact_snapshot)

    path = str(tmp_path / "compact")
    base = spark.createDataFrame(
        [(k, f"v{k}", k) for k in range(400)], "k INT, v STRING, ord INT")
    v0 = merge_upsert(spark, path, base, ["k"], "ord", n_buckets=4,
                      keep_versions=5)
    # fragment a subset: a partial merge written wide rewrites only the
    # touched buckets at 3 files each
    upd = spark.createDataFrame(
        [(7, "updated", 999)], "k INT, v STRING, ord INT")
    v1 = merge_upsert(spark, path, upd, ["k"], "ord", n_buckets=4,
                      keep_versions=5, files_per_bucket=3)
    man1 = _read_manifest(path, v1)
    counts1 = _bucket_file_counts(path, man1)
    fragged = [b for b, c in counts1.items() if c > 1]
    assert len(fragged) == 1  # only bucket(7) was rewritten wide

    v2 = compact_snapshot(spark, path, max_files_per_bucket=1,
                          keep_versions=5)
    assert v2 == v1 + 1
    man2 = _read_manifest(path, v2)
    counts2 = _bucket_file_counts(path, man2)
    assert all(c == 1 for c in counts2.values()), counts2
    # untouched buckets carried by reference (identical path strings)
    for b in man1["buckets"]:
        if b not in fragged:
            assert man2["buckets"][b] == man1["buckets"][b]
        else:
            assert man2["buckets"][b] != man1["buckets"][b]
    # data identical, and the pre-compaction version is still readable
    state = {r["k"]: r["v"] for r in read_target(spark, path).collect()}
    assert len(state) == 400 and state[7] == "updated" and state[3] == "v3"
    old = {r["k"]: r["v"]
           for r in read_target(spark, path, version=v1).collect()}
    assert old == state
    # idempotent: nothing fragmented now -> no-op, same version
    assert compact_snapshot(spark, path, max_files_per_bucket=1,
                            keep_versions=5) == v2


def test_rebucket_grows_layout_and_partial_merges_resume(spark, tmp_path):
    """The growth path: doubling n_buckets restores b/N partial-rewrite
    economics; a follow-up merge at the new count takes the PARTIAL
    path (one rewritten bucket, 15 carried)."""
    from imp_etl_spark.plans.upsert import _read_manifest, rebucket

    path = str(tmp_path / "rebucket")
    base = spark.createDataFrame(
        [(k, f"v{k}", k) for k in range(400)], "k INT, v STRING, ord INT")
    merge_upsert(spark, path, base, ["k"], "ord", n_buckets=8,
                 keep_versions=5)
    v1 = rebucket(spark, path, 16, keep_versions=5)
    man1 = _read_manifest(path, v1)
    assert man1["n_buckets"] == 16 and len(man1["buckets"]) == 16
    state = {r["k"]: r["v"] for r in read_target(spark, path).collect()}
    assert len(state) == 400 and state[5] == "v5"

    upd = spark.createDataFrame(
        [(5, "updated", 999)], "k INT, v STRING, ord INT")
    v2 = merge_upsert(spark, path, upd, ["k"], "ord", n_buckets=16,
                      keep_versions=5)
    man2 = _read_manifest(path, v2)["buckets"]
    rewritten = [b for b in man1["buckets"] if man2[b] != man1["buckets"][b]]
    assert len(rewritten) == 1
    state = {r["k"]: r["v"] for r in read_target(spark, path).collect()}
    assert state[5] == "updated" and len(state) == 400


def test_point_lookup_reads_single_bucket_dir(spark, tmp_path):
    """lookup() prunes at the path level: the scan's input files all
    come from the one bucket directory the key hashes to, and the
    result is the exact row."""
    from imp_etl_spark.plans.upsert import lookup

    path = str(tmp_path / "lookup")
    base = spark.createDataFrame(
        [(k, f"v{k}", k) for k in range(300)], "k INT, v STRING, ord INT")
    merge_upsert(spark, path, base, ["k"], "ord", n_buckets=8)

    df = lookup(spark, path, {"k": 42})
    rows = df.collect()
    assert [(r["k"], r["v"]) for r in rows] == [(42, "v42")]
    files = df.inputFiles()
    assert files and len({f.split("__bucket=")[1].split("/")[0]
                          for f in files}) == 1
    # equality residual reaches the parquet scan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(k), EqualTo(k,42)]" in plan

    import pytest as _pytest
    with _pytest.raises(ValueError, match="full key"):
        lookup(spark, path, {"v": "v42"})


def test_merge_upsert_txn_replay_is_noop(spark, tmp_path):
    """Transaction stamps make at-least-once callers exactly-once: a
    merge replayed with an already-committed (app_id, version) is a
    no-op even when its PAYLOAD differs (the read-modify-write replay
    that last-writer-wins alone cannot dedupe), and the stamp survives
    unrelated merges and compaction."""
    from imp_etl_spark.plans import upsert as U

    path = str(tmp_path / "txn_tgt")
    base = spark.createDataFrame([("K1", 10, 1), ("K2", 20, 1)],
                                 "k string, n int, ord int")
    v0 = merge_upsert(spark, path, base, ["k"], "ord",
                      txn_app_id="app", txn_version=0)
    assert v0 == 0
    assert U.last_txn_version(path, "app") == 0

    # the dangerous replay: same epoch, INFLATED payload (as a replayed
    # read-modify-write epoch would produce) -> must not apply
    inflated = spark.createDataFrame([("K1", 20, 2), ("K2", 40, 2)],
                                     "k string, n int, ord int")
    v_again = merge_upsert(spark, path, inflated, ["k"], "ord",
                           txn_app_id="app", txn_version=0)
    assert v_again == v0
    state = {r["k"]: r["n"] for r in read_target(spark, path).collect()}
    assert state == {"K1": 10, "K2": 20}

    # a NEW epoch applies; an unrelated (stampless) merge and a
    # compaction both preserve the recorded stamp
    nxt = spark.createDataFrame([("K1", 11, 3)], "k string, n int, ord int")
    merge_upsert(spark, path, nxt, ["k"], "ord",
                 txn_app_id="app", txn_version=1)
    other = spark.createDataFrame([("K9", 99, 1)], "k string, n int, ord int")
    merge_upsert(spark, path, other, ["k"], "ord")
    U.compact_snapshot(spark, path)
    assert U.last_txn_version(path, "app") == 1
    state = {r["k"]: r["n"] for r in read_target(spark, path).collect()}
    assert state == {"K1": 11, "K2": 20, "K9": 99}
    # and the replay fence still holds after maintenance
    merge_upsert(spark, path, inflated, ["k"], "ord",
                 txn_app_id="app", txn_version=1)
    state2 = {r["k"]: r["n"] for r in read_target(spark, path).collect()}
    assert state2 == state


def test_merge_upsert_concurrent_writer_cas(spark, tmp_path):
    """Two interleaved writers: B commits between A's merge and A's
    _latest.json flip. The version CAS makes A discard its prepared
    snapshot and re-merge, so the final table holds BOTH writers' rows
    — no lost buckets — and exactly one version per commit."""
    from imp_etl_spark.plans import upsert as U

    path = str(tmp_path / "cas_tgt")
    base = spark.createDataFrame([(f"K{i}", 0, 1) for i in range(8)],
                                 "k string, n int, ord int")
    merge_upsert(spark, path, base, ["k"], "ord", n_buckets=4)

    b_batch = spark.createDataFrame([("K1", 100, 2)],
                                    "k string, n int, ord int")
    fired = {"n": 0}

    def sneak_in_writer_b():
        # fire only on A's FIRST attempt; A's retry must run clean
        if fired["n"] == 0:
            fired["n"] += 1
            merge_upsert(spark, path, b_batch, ["k"], "ord", n_buckets=4)

    a_batch = spark.createDataFrame([("K2", 200, 2)],
                                    "k string, n int, ord int")
    U._pre_commit_hook = sneak_in_writer_b
    try:
        merge_upsert(spark, path, a_batch, ["k"], "ord", n_buckets=4)
    finally:
        U._pre_commit_hook = None
    assert fired["n"] == 1

    state = {r["k"]: r["n"] for r in read_target(spark, path).collect()}
    assert state["K1"] == 100        # B's write survived A's retry
    assert state["K2"] == 200        # A's write landed
    assert len(state) == 8
    # three committed versions: base, B, A-after-retry
    assert U._latest_version(path) == 2


def test_merge_replace_touched_buckets_and_expected_version(spark, tmp_path):
    """Replace semantics: a batch declared to hold its touched buckets'
    full content replaces them wholesale (stale keys in those buckets
    drop; other buckets untouched, carried by reference), and
    expected_version raises instead of clobbering when the table moved
    past the caller's read."""
    import pytest

    from imp_etl_spark.plans import upsert as U

    path = str(tmp_path / "repl_tgt")
    base = spark.createDataFrame([(f"K{i}", i, 1) for i in range(12)],
                                 "k string, n int, ord int")
    v0 = merge_upsert(spark, path, base, ["k"], "ord", n_buckets=4)

    # find two keys in the same bucket; replace that bucket with ONE
    from pyspark.sql import functions as F
    buck = {r["k"]: r["b"] for r in base.select(
        "k", U._bucket_expr(["k"], 4).alias("b")).collect()}
    by_bucket = {}
    for k, b in buck.items():
        by_bucket.setdefault(b, []).append(k)
    b_id, keys = next((b, ks) for b, ks in by_bucket.items()
                      if len(ks) >= 2)
    keep, drop = keys[0], keys[1]
    repl = spark.createDataFrame([(keep, 999, 2)],
                                 "k string, n int, ord int")
    merge_upsert(spark, path, repl, ["k"], "ord", n_buckets=4,
                 batch_replaces_touched_buckets=True,
                 expected_version=v0)
    state = {r["k"]: r["n"] for r in read_target(spark, path).collect()}
    assert state[keep] == 999
    assert drop not in state                    # replaced wholesale
    others = set(buck) - set(keys)
    assert others <= set(state)                 # untouched buckets intact

    # stale expected_version: the table moved -> loud failure, no write
    before = dict(state)
    with pytest.raises(U.ConcurrentWriteError):
        merge_upsert(spark, path, repl, ["k"], "ord", n_buckets=4,
                     batch_replaces_touched_buckets=True,
                     expected_version=v0)       # table is at v0+1 now
    after = {r["k"]: r["n"] for r in read_target(spark, path).collect()}
    assert after == before
    # expected_version=-1 means "table must not exist": it does -> raise
    with pytest.raises(U.ConcurrentWriteError):
        merge_upsert(spark, path, repl, ["k"], "ord", n_buckets=4,
                     expected_version=-1)


def test_run_etl_jdbc_sink_end_to_end(spark, tmp_path):
    """r11 (VERDICT item 2, end-to-end): run_etl with sink='jdbc'
    honors the reference's actual MySQL->MySQL deployment — both
    branches upsert through upsert_jdbc into live Derby tables.
    Counters/warnings/watermark match the manifest mode; a second
    full-reprocess run is idempotent (same rows, updated in place);
    an updated queue row overwrites its target row."""
    import py4j
    import pytest

    from imp_etl_spark.plans.pipeline import build_pipeline
    from imp_etl_spark.sources.io import read_jdbc, write_jdbc

    url = f"jdbc:derby:{tmp_path}/etldb;create=true"
    driver = "org.apache.derby.jdbc.EmbeddedDriver"
    try:
        spark._jvm.java.lang.Class.forName(driver)
    except py4j.protocol.Py4JError:
        pytest.skip("embedded Derby driver not on the classpath")

    queue, voucher, txn = make_frames(spark)
    # pre-create the targets with VARCHAR key/string columns (Derby
    # maps Spark strings to CLOB, which a MERGE ON clause cannot
    # compare) — deployment-wise these tables pre-exist in MySQL
    shape = build_pipeline(queue, voucher, txn)

    def coltypes(df):
        return ", ".join(f"{c} VARCHAR(256)" for c, t in df.dtypes
                         if t == "string")

    v_types = coltypes(shape.voucher.valid)
    t_types = coltypes(shape.transaction.valid)
    write_jdbc(shape.voucher.valid.limit(0), url, "voucher",
               mode="overwrite", driver=driver,
               createTableColumnTypes=v_types)
    write_jdbc(shape.transaction.valid.limit(0), url, "txn",
               mode="overwrite", driver=driver,
               createTableColumnTypes=t_types)

    summary = run_etl(
        spark, queue, voucher, txn, "voucher", "txn",
        sink="jdbc", jdbc_url=url, jdbc_options={"driver": driver})
    assert summary["processedVoucherCount"] == 3
    assert summary["skippedVoucherCount"] == 2
    assert summary["processedTransactionCount"] == 3
    assert summary["watermark"] == 8
    assert any("REF-GONE" in w for w in summary["warningSample"])

    back_v = read_jdbc(spark, url, "voucher", driver=driver)
    back_t = read_jdbc(spark, url, "txn", driver=driver)
    assert back_v.count() == 3 and back_t.count() == 3

    # idempotence: full reprocess (no watermark) upserts the same keys
    summary2 = run_etl(
        spark, queue, voucher, txn, "voucher", "txn",
        sink="jdbc", jdbc_url=url, jdbc_options={"driver": driver})
    assert summary2["processedVoucherCount"] == 3
    assert read_jdbc(spark, url, "voucher", driver=driver).count() == 3
    assert read_jdbc(spark, url, "txn", driver=driver).count() == 3

    # update-in-place: a restated voucher row (same key, new name)
    # overwrites rather than duplicates
    restated = voucher.withColumn(
        "first_name", F.when(F.col("voucher_id") == "V1",
                             F.lit("renamed")).otherwise(
                                 F.col("first_name")))
    run_etl(spark, queue, restated, txn, "voucher", "txn",
            sink="jdbc", jdbc_url=url, jdbc_options={"driver": driver})
    rows = {r["voucher_id"]: r["first_name"] for r in read_jdbc(
        spark, url, "voucher", driver=driver).collect()}
    assert len(rows) == 3
    assert rows["V1"] in ("RENAMED", "renamed")  # cleanse may upcase

    # unknown sink rejected up front
    with pytest.raises(ValueError, match="unknown sink"):
        run_etl(spark, queue, voucher, txn, "v", "t", sink="delta")
