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
    # simulate a crashed writer before merging again
    os.makedirs(os.path.join(path, "_staging_deadbeef"))
    v1 = merge_upsert(spark, path, upd, ["k"], "ord")

    assert not [d for d in os.listdir(path) if d.startswith("_staging_")]
    cur = {r["k"]: r["v"] for r in read_target(spark, path).collect()}
    assert cur[0] == "b" and cur[4] == "a"
    old = {r["k"]: r["v"] for r in read_target(spark, path, version=v0).collect()}
    assert old[0] == "a"
    with pytest.raises(ValueError, match="not retained"):
        read_target(spark, path, version=99)
    assert v1 == v0 + 1


def test_upsert_retention_keep_one(spark, tmp_path):
    """keep_versions=1 keeps ONLY the newest snapshot (round-1 advice:
    vs[:-0] == [] made retention a no-op and versions accumulated)."""
    import os

    path = str(tmp_path / "keep1")
    for i in range(3):
        batch = spark.createDataFrame([(1, f"v{i}", i)], "k INT, v STRING, ord INT")
        merge_upsert(spark, path, batch, ["k"], "ord", keep_versions=1)
    vdirs = sorted(d for d in os.listdir(path) if d.startswith("v_"))
    assert vdirs == ["v_2"]
    assert [r["v"] for r in read_target(spark, path).collect()] == ["v2"]


def test_bucketed_merge_rewrites_only_touched_buckets(spark, tmp_path):
    """The 100 TB merge cost model: a batch touching one key rewrites the
    key's bucket only; every other bucket's files are HARD-LINKED (same
    inode) from the previous version — no data copied or rewritten."""
    import os

    path = str(tmp_path / "bucketed")
    base = spark.createDataFrame(
        [(k, f"v{k}", k) for k in range(200)], "k INT, v STRING, ord INT")
    v0 = merge_upsert(spark, path, base, ["k"], "ord", n_buckets=8,
                      keep_versions=5)
    snap0 = os.path.join(path, "v_0")
    buckets0 = sorted(d for d in os.listdir(snap0) if d.startswith("__bucket="))
    assert len(buckets0) == 8

    inode0 = {
        d: {fn: os.stat(os.path.join(snap0, d, fn)).st_ino
            for fn in os.listdir(os.path.join(snap0, d))}
        for d in buckets0
    }
    one = spark.createDataFrame([(7, "updated", 999)], "k INT, v STRING, ord INT")
    merge_upsert(spark, path, one, ["k"], "ord", n_buckets=8, keep_versions=5)
    snap1 = os.path.join(path, "v_1")

    rewritten, linked = [], []
    for d in buckets0:
        files1 = {fn: os.stat(os.path.join(snap1, d, fn)).st_ino
                  for fn in os.listdir(os.path.join(snap1, d))}
        (linked if files1 == inode0[d] else rewritten).append(d)
    assert len(rewritten) == 1, f"expected 1 rewritten bucket, got {rewritten}"
    assert len(linked) == 7

    # semantics unchanged: the update landed, everything else intact
    state = {r["k"]: r["v"] for r in read_target(spark, path).collect()}
    assert state[7] == "updated" and state[3] == "v3" and len(state) == 200
    # and time travel still reads the pre-update bucketed snapshot
    old = {r["k"]: r["v"] for r in read_target(spark, path, version=v0).collect()}
    assert old[7] == "v7"


def test_bucketed_merge_bucket_count_change_full_rewrite(spark, tmp_path):
    """Changing n_buckets can't silently mix layouts: the merge detects
    the spec mismatch and does one full rewrite into the new layout."""
    import os

    path = str(tmp_path / "rebucket")
    base = spark.createDataFrame(
        [(k, "a", k) for k in range(50)], "k INT, v STRING, ord INT")
    merge_upsert(spark, path, base, ["k"], "ord", n_buckets=4)
    upd = spark.createDataFrame([(1, "b", 99)], "k INT, v STRING, ord INT")
    merge_upsert(spark, path, upd, ["k"], "ord", n_buckets=8)
    snap = os.path.join(path, "v_1")
    assert len([d for d in os.listdir(snap) if d.startswith("__bucket=")]) == 8
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
