"""Approximate aggregates must land inside their error envelopes."""

from __future__ import annotations

from pyspark.sql import functions as F

from imp_etl_spark.queries import REGISTRY
from imp_etl_spark.sources.parquet import read_table
from tests.conftest import SF_DIR


def test_approx_stats_within_envelope(spark):
    fn, _ = REGISTRY["agg_approx_stats"]
    approx = {r["o_orderstatus"]: r for r in fn(spark, SF_DIR).collect()}
    exact = {
        r["o_orderstatus"]: r
        for r in read_table(spark, SF_DIR, "orders")
        .groupBy("o_orderstatus")
        .agg(F.count_distinct("o_custkey").alias("cust"),
             F.percentile(F.col("o_totalprice"), F.lit(0.5)).alias("median"))
        .collect()
    }
    assert set(approx) == set(exact)
    for status, ex in exact.items():
        ap = approx[status]
        assert abs(ap["approx_cust"] - ex["cust"]) <= 0.05 * ex["cust"] + 1
        assert abs(ap["approx_median"] - ex["median"]) <= 0.05 * ex["median"]


def test_hll_sketch_mergeable_and_accurate(spark):
    """r11 HLL sketch tier (operators/agg.py): (a) the union estimate
    is INVARIANT to how history is sliced into shards and to the
    partitioning (register merge is commutative/associative), (b) the
    estimate lands within the lg_k=14 accuracy contract on a 50k-value
    domain, (c) NULL values are ignored and NULL keys/shards are real
    groups, (d) an all-NULL group estimates 0."""
    from pyspark.sql import functions as F

    from imp_etl_spark.operators.agg import (
        sharded_distinct_sketch,
        union_distinct_estimate,
    )

    df = spark.range(200_000).select(
        (F.col("id") % 4).alias("g"),
        F.when(F.col("id") % 97 == 0, None)
        .otherwise(F.col("id") % 50_021).alias("u"),
        F.col("id").alias("rid"))
    exact = {r["g"]: r["n"] for r in df.groupBy("g").agg(
        F.count_distinct("u").alias("n")).collect()}

    ests = []
    for shard_expr, nparts in ((F.col("rid") % 2, 8),
                               (F.col("rid") % 7, 32),
                               (F.lit(0), 3)):
        sk = sharded_distinct_sketch(
            df.repartition(nparts), ["g"], "u", shard=shard_expr)
        est = {r["g"]: r["n_est"] for r in
               union_distinct_estimate(sk, ["g"]).collect()}
        ests.append(est)
        for g, n in exact.items():
            assert abs(est[g] - n) <= max(4, 0.05 * n), (g, est[g], n)
    # slicing/partitioning invariance: identical estimates, not just
    # individually-accurate ones
    assert ests[0] == ests[1] == ests[2]

    # NULL key group + all-NULL value group
    df2 = spark.createDataFrame(
        [(None, 1, 1), (None, 2, 2), (None, None, 3),
         ("empty", None, 4), ("empty", None, 5)],
        "g STRING, u INT, rid INT")
    sk2 = sharded_distinct_sketch(df2, ["g"], "u",
                                  shard=F.col("rid") % 2)
    est2 = {r["g"]: r["n_est"] for r in
            union_distinct_estimate(sk2, ["g"]).collect()}
    assert est2 == {None: 2, "empty": 0}


def test_hll_overlap_estimate_properties(spark):
    """r11 sketch set-algebra (operators/agg.py overlap_estimate):
    inclusion-exclusion overlap per key group must (a) read ~|A| on
    identical sets, (b) ~0 on disjoint sets (clamped at 0), (c) track
    a known 50% overlap within the documented union-relative error,
    (d) return only keys present in BOTH frames, with NULL keys as
    real groups."""
    from pyspark.sql import functions as F

    from imp_etl_spark.operators.agg import (
        overlap_estimate,
        sharded_distinct_sketch,
    )

    n = 20_000

    def sk(df):
        return sharded_distinct_sketch(df, ["g"], "u", shard=F.lit(0))

    base = spark.range(n).select(F.lit("same").alias("g"),
                                 F.col("id").alias("u"))
    disj_a = spark.range(n).select(F.lit("disj").alias("g"),
                                   F.col("id").alias("u"))
    disj_b = spark.range(n).select(F.lit("disj").alias("g"),
                                   (F.col("id") + n).alias("u"))
    half_a = spark.range(n).select(F.lit("half").alias("g"),
                                   F.col("id").alias("u"))
    half_b = spark.range(n).select(F.lit("half").alias("g"),
                                   (F.col("id") + n // 2).alias("u"))
    null_a = spark.range(100).select(F.lit(None).cast("string").alias("g"),
                                     F.col("id").alias("u"))
    only_a = spark.range(50).select(F.lit("only_a").alias("g"),
                                    F.col("id").alias("u"))

    a = sk(base.unionByName(disj_a).unionByName(half_a)
           .unionByName(null_a).unionByName(only_a))
    b = sk(base.unionByName(disj_b).unionByName(half_b)
           .unionByName(null_a))
    out = {r["g"]: (r["overlap_est"], r["union_est"]) for r in
           overlap_estimate(a, b, ["g"]).collect()}

    assert set(out) == {"same", "disj", "half", None}  # only_a dropped
    tol = lambda union: max(8, 0.1 * union)  # noqa: E731
    est, u = out["same"]
    assert abs(est - n) <= tol(u)
    est, u = out["disj"]
    assert 0 <= est <= tol(u)
    est, u = out["half"]
    assert abs(est - n // 2) <= tol(u)
    est, u = out[None]
    assert abs(est - 100) <= tol(u)
