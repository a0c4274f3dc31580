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
