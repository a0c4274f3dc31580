"""Salted aggregation/join (operators/skew.py) must be semantically
invisible: same answer as the unsalted plan, skew or not."""

from __future__ import annotations

from pyspark.sql import functions as F

from imp_etl_spark.operators.skew import salted_agg, salted_join
from imp_etl_spark.sources.parquet import read_table
from tests.conftest import SF_DIR


def _skewed(spark):
    """lineitem with 90% of rows forced onto one hot key."""
    li = read_table(spark, SF_DIR, "lineitem")
    return li.withColumn(
        "k", F.when(F.col("l_orderkey") % 10 != 0, F.lit(0))
              .otherwise(F.col("l_orderkey")))


def test_salted_agg_matches_plain(spark):
    df = _skewed(spark)
    got = salted_agg(
        df, ["k"],
        partial=[F.sum("l_quantity").alias("s"),
                 F.count(F.lit(1)).alias("c")],
        final=[F.sum("s").alias("s"), F.sum("c").alias("c")],
        buckets=16,
    )
    want = df.groupBy("k").agg(F.sum("l_quantity").alias("s"),
                               F.count(F.lit(1)).alias("c"))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_salted_join_matches_plain(spark):
    df = _skewed(spark).select("k", "l_orderkey", "l_quantity")
    dim = (read_table(spark, SF_DIR, "orders")
           .select(F.col("o_orderkey").alias("k"), "o_orderpriority")
           .limit(50))
    got = salted_join(df, dim, on="k", buckets=8)
    want = df.join(dim, on="k")
    assert got.count() == want.count()
    g = sorted(map(tuple, got.select("k", "l_orderkey", "o_orderpriority").collect()))
    w = sorted(map(tuple, want.select("k", "l_orderkey", "o_orderpriority").collect()))
    assert g == w
