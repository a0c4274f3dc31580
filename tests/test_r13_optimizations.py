"""Pins for the r13 optimization internals: fused dedup↔bucket layout,
prefix_sum/global_index small-frame dispatch, the gated query-level
persists, and the bounded events schema cache."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _rows(df):
    return sorted(map(tuple, df.collect()))


# ---------------------------------------------------------------------------
# Fused dedup↔bucket layout (plans/pipeline._dedup_in_bucket_layout)
# ---------------------------------------------------------------------------

def _dup_frame(spark):
    rows = [(f"K{i % 7}", f"R{i % 5}", i, f"p{i}") for i in range(300)]
    return spark.createDataFrame(
        rows, "voucher_id string, reference_no string, seq int, p string")


def test_fused_dedup_matches_latest_per_key(spark):
    from imp_etl_spark.operators.dedup import latest_per_key
    from imp_etl_spark.plans.pipeline import _dedup_in_bucket_layout

    df = _dup_frame(spark)
    fused = _dedup_in_bucket_layout(
        df, ["voucher_id", "reference_no"], "seq", 16)
    plain = latest_per_key(
        df, ["voucher_id", "reference_no"], ["seq"], desc=True)
    assert _rows(fused) == _rows(plain)


def test_fused_dedup_single_exchange(spark):
    """The whole point of the fusion: ONE exchange covers dedup + the
    sink's bucket clustering (the r12 plan paid hash(pk) AND
    hash(bucket))."""
    from imp_etl_spark.plans.pipeline import _dedup_in_bucket_layout

    df = _dup_frame(spark)
    plan = _dedup_in_bucket_layout(
        df, ["voucher_id", "reference_no"], "seq", 16
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_pre_clustered_merge_equals_replanned_merge(spark, tmp_path):
    """merge_upsert(batch_pre_clustered=True) over a fused-dedup batch
    commits the exact table the unfused path commits, with the same
    one-file-per-bucket layout."""
    from imp_etl_spark.operators.dedup import latest_per_key
    from imp_etl_spark.plans.pipeline import _dedup_in_bucket_layout
    from imp_etl_spark.plans.upsert import merge_upsert, read_target

    df = _dup_frame(spark)
    key = ["voucher_id", "reference_no"]
    fused = _dedup_in_bucket_layout(df, key, "seq", 16)
    plain = latest_per_key(df, key, ["seq"], desc=True)

    p_fused = str(tmp_path / "fused")
    p_plain = str(tmp_path / "plain")
    merge_upsert(spark, p_fused, fused, key, "seq", batch_is_unique=True,
                 batch_pre_clustered=True)
    merge_upsert(spark, p_plain, plain, key, "seq", batch_is_unique=True)
    assert _rows(read_target(spark, p_fused)) == \
        _rows(read_target(spark, p_plain))
    # layout: one directory per non-empty bucket, one file each
    import glob
    dirs = glob.glob(os.path.join(p_fused, "data_*", "__bucket=*"))
    files = glob.glob(os.path.join(p_fused, "data_*", "__bucket=*",
                                   "*.parquet"))
    assert dirs and len(files) == len(dirs)


def test_fused_dedup_sub_split_matches_and_single_exchange(spark, tmp_path):
    """files_per_bucket > 1 (the scale-adaptive sub-split that keeps a
    big epoch's dedup sort from funneling through n_buckets tasks):
    same rows as latest_per_key, still ONE exchange, and the
    pre-clustered wide write commits the identical table."""
    from imp_etl_spark.operators.dedup import latest_per_key
    from imp_etl_spark.plans.pipeline import _dedup_in_bucket_layout
    from imp_etl_spark.plans.upsert import merge_upsert, read_target

    df = _dup_frame(spark)
    key = ["voucher_id", "reference_no"]
    fused = _dedup_in_bucket_layout(df, key, "seq", 16, files_per_bucket=3)
    plain = latest_per_key(df, key, ["seq"], desc=True)
    assert _rows(fused) == _rows(plain)
    # AQE reprints the pre-execution plan under "== Initial Plan ==";
    # count only the final plan's exchanges
    plan = fused._jdf.queryExecution().executedPlan().toString().split(
        "== Initial Plan ==")[0]
    assert plan.count("Exchange hashpartitioning") == 1, plan

    p_fused = str(tmp_path / "fused_wide")
    p_plain = str(tmp_path / "plain")
    merge_upsert(spark, p_fused, fused, key, "seq", batch_is_unique=True,
                 files_per_bucket=3, batch_pre_clustered=True)
    merge_upsert(spark, p_plain, plain, key, "seq", batch_is_unique=True)
    assert _rows(read_target(spark, p_fused)) == \
        _rows(read_target(spark, p_plain))


def test_run_etl_plan_has_single_branch_exchange(spark, tmp_path):
    """End-to-end pin of VERDICT r12 item 3: the voucher branch's valid
    plan (what the MERGE executes) carries exactly ONE exchange —
    the bucket-expression repartition — instead of hash(pk) + the
    sink's hash(bucket)."""
    from imp_etl_spark.plans.pipeline import build_pipeline
    from imp_etl_spark.plans.upsert import DEFAULT_BUCKETS

    queue = spark.createDataFrame(
        [(1, "R1", "voucher"), (2, "R2", "voucher")],
        "log_id int, reference_no string, `table` string")
    voucher = spark.createDataFrame(
        [("V1", "R1", "x"), ("V2", "R2", "y")],
        "voucher_id string, reference_no string, first_name string")
    txn = spark.createDataFrame(
        [("T1", "R1", "1")],
        "voucher_details_id string, reference_no string, quantity string")
    res = build_pipeline(queue, voucher, txn,
                         sink_buckets=DEFAULT_BUCKETS, persist=False)
    plan = res.voucher.valid._jdf.queryExecution().executedPlan().toString()
    # exactly one branch-payload shuffle: the bucket-expression
    # repartition. No hash(pk) dedup exchange remains (the keys-side
    # distinct aggregate and the semi-prune broadcast are not payload
    # shuffles).
    assert plan.count("REPARTITION_BY_COL") == 1, plan
    assert "Exchange hashpartitioning(voucher_id" not in plan, plan


# ---------------------------------------------------------------------------
# prefix_sum / global_index small-frame dispatch
# ---------------------------------------------------------------------------

def test_prefix_sum_small_path_matches_distributed(spark):
    from imp_etl_spark.operators.window import prefix_sum

    rows = [("g%d" % (i % 3), i, (i * 7) % 11) for i in range(500)]
    df = spark.createDataFrame(rows, "g string, k int, v int")
    conf = "spark.imp_etl.prefixSum.maxSingleSortRows"
    old = spark.conf.get(conf, None)
    try:
        spark.conf.set(conf, "1000000")  # small path
        small = _rows(prefix_sum(df, ["g", "k"], "v", out_col="cum"))
        spark.conf.set(conf, "0")        # force the distributed machinery
        big = _rows(prefix_sum(df, ["g", "k"], "v", out_col="cum"))
    finally:
        if old is None:
            spark.conf.unset(conf)
        else:
            spark.conf.set(conf, old)
    assert small == big


def test_global_index_unique_order_small_path_matches(spark):
    from imp_etl_spark.operators.window import global_index

    df = spark.range(0, 700).select(
        (F.col("id") * 13 % 701).alias("ord"), F.col("id").alias("payload"))
    conf = "spark.imp_etl.prefixSum.maxSingleSortRows"
    old = spark.conf.get(conf, None)
    try:
        spark.conf.set(conf, "1000000")
        small = _rows(global_index(df, "ord", "rn", unique_order=True))
        spark.conf.set(conf, "0")
        big = _rows(global_index(df, "ord", "rn", unique_order=True))
        legacy = _rows(global_index(df, "ord", "rn"))
    finally:
        if old is None:
            spark.conf.unset(conf)
        else:
            spark.conf.set(conf, old)
    assert small == big == legacy


# ---------------------------------------------------------------------------
# Gated query-level persists (VERDICT r12 item 2)
# ---------------------------------------------------------------------------

def test_funnel_persist_gated_off_on_tiny_source(spark):
    """A provably tiny events source keeps the fused (no-persist)
    funnel plan; an unprovable in-memory source persists as before."""
    from imp_etl_spark.operators.behavior import funnel_counts

    rows = [(i, "u%d" % (i % 5), "signup" if i % 3 == 0 else "click",
             "2024-01-0%d 00:00:00" % (i % 9 + 1)) for i in range(30)]
    ev = spark.createDataFrame(
        rows, "event_id int, user_id string, event_type string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    rel = []
    out = funnel_counts(ev, ["signup", "click"], release=rel)
    out.collect()
    # in-memory frame: unprovable -> persisted (the safe big assumption)
    assert rel, "unprovable source should persist stage frames"
    for d in rel:
        d.unpersist()

    from imp_etl_spark.sources.parquet import read_table
    ev_parq = read_table(spark, SF_DIR, "events")  # sf0.001: 1000 rows
    rel2 = []
    out2 = funnel_counts(ev_parq, ["signup", "click"], release=rel2)
    assert rel2 == [], "footer-tiny source must keep the fused plan"
    plan = out2._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" not in plan


def test_hll_sketch_persist_gated_off_at_fixture_scale(spark):
    from imp_etl_spark.queries_llm import (
        _DEDUP_PERSISTS,
        release_dedup_caches,
    )
    from imp_etl_spark.queries import REGISTRY

    release_dedup_caches()
    fn, _ = REGISTRY["hll_user_overlap_halves"]
    df = fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # events at every test SF is far below the 1M-row sketch crossover:
    # the fused (re-evaluating) plan must be kept
    assert "InMemoryTableScan" not in plan
    assert not _DEDUP_PERSISTS


def test_verify_tier_persists_stay_on_at_fixture_scale(spark):
    """The driver-confirmed r12 wins (verified-pair persists) must stay
    engaged at the 500-doc fixtures — their crossover is ~256 docs."""
    from imp_etl_spark.queries_llm import (
        _DEDUP_PERSISTS,
        release_dedup_caches,
    )
    from imp_etl_spark.queries import REGISTRY

    release_dedup_caches()
    fn, _ = REGISTRY["dedup_pipeline_survivors"]
    fn(spark, SF_DIR)
    assert _DEDUP_PERSISTS, "verified/cands persists should engage at 500 docs"
    release_dedup_caches()


# ---------------------------------------------------------------------------
# Events schema cache: bounded + leaf-inventory key (ADVICE r12)
# ---------------------------------------------------------------------------

def test_events_schema_cache_bounded_and_inventory_keyed(tmp_path, spark):
    import shutil
    import time

    from imp_etl_spark.sources import parquet as P

    src = os.path.join(SF_DIR, "events.parquet")
    P._EVENTS_SCHEMA_CACHE.clear()
    # cap: more distinct keys than the cap never grows the dict past it
    for i in range(P._EVENTS_SCHEMA_CACHE_CAP + 3):
        d = tmp_path / ("sf_%d" % i)
        d.mkdir()
        shutil.copy(src, d / "events.parquet") if os.path.isfile(src) \
            else shutil.copytree(src, d / "events.parquet")
        P.read_table(spark, str(d), "events")
    assert len(P._EVENTS_SCHEMA_CACHE) <= P._EVENTS_SCHEMA_CACHE_CAP

    # leaf-inventory key: an in-place leaf change (same top-level mtime)
    # still changes the key for directory tables
    d = tmp_path / "inv"
    d.mkdir()
    tbl = d / "events.parquet"
    if os.path.isfile(src):
        tbl.mkdir()
        shutil.copy(src, tbl / "part-000.parquet")
    else:
        shutil.copytree(src, tbl)
    k1 = P._events_schema_key(str(tbl))
    time.sleep(0.02)
    # touch a leaf without touching the directory mtime
    leaves = [p for p in os.listdir(tbl) if p.endswith(".parquet")]
    os.utime(tbl / leaves[0])
    k2 = P._events_schema_key(str(tbl))
    assert k1 != k2
