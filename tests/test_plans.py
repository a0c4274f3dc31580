"""Physical-plan regression tests: the scale properties the engine
promises (SURVEY.md §4) must be visible in .explain — filters reach the
parquet scan, projections prune the read schema, dimension joins
broadcast, fact joins shuffle exactly once. Passing row-counts with the
wrong plan is how 100 TB jobs die; these tests pin the plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from imp_etl_spark.queries import REGISTRY
from tests.conftest import SF_DIR


def _executed(df) -> str:
    df.collect()  # finalize the adaptive plan (AQE re-plans at runtime)
    return df._jdf.queryExecution().executedPlan().toString()


def _run(name: str, spark):
    fn, _ = REGISTRY[name]
    return fn(spark, SF_DIR)


def test_q1_pushdown_and_pruning(spark):
    plan = _executed(_run("q1_pricing_summary", spark))
    # shipdate predicate rides to the parquet reader
    assert "PushedFilters: [" in plan and "l_shipdate" in plan.split(
        "PushedFilters:")[1].split("]")[0]
    # projection pruning: unused wide columns never leave the scan
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_partkey" not in read_schema and "l_suppkey" not in read_schema
    assert "*(" in plan  # WholeStageCodegen stage markers


def test_q6_collapses_to_scan_plus_agg(spark):
    plan = _executed(_run("q6_forecast_revenue", spark))
    assert "PushedFilters: [" in plan
    pushed = plan.split("PushedFilters:")[1].split("]")[0]
    for c in ("l_shipdate", "l_discount", "l_quantity"):
        assert c in pushed, f"{c} not pushed down"
    # single-table agg: no join operators at all
    assert "Join" not in plan


def test_q3_broadcasts_dimension_side(spark):
    plan = _executed(_run("q3_shipping_priority", spark))
    assert "BroadcastHashJoin" in plan
    # exactly one wide exchange (lineitem<->orders); broadcast exchanges
    # are a different node type
    assert plan.count("Exchange hashpartitioning") <= 2  # join + agg reuse


def test_q5_snowflake_single_shuffle_join(spark):
    plan = _executed(_run("q5_local_supplier_volume", spark))
    assert plan.count("BroadcastHashJoin") >= 4
    assert plan.count("SortMergeJoin") + plan.count(
        "ShuffledHashJoin") <= 1


def test_semi_prune_is_broadcast(spark):
    from imp_etl_spark.operators.join import semi_prune
    from imp_etl_spark.sources.parquet import read_table

    li = read_table(spark, SF_DIR, "lineitem")
    keys = read_table(spark, SF_DIR, "orders").select(
        F.col("o_orderkey").alias("l_orderkey")).limit(100)
    plan = _executed(semi_prune(li, keys, "l_orderkey"))
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_unpivot_needs_no_shuffle(spark):
    plan = _executed(_run("unpivot_measures", spark))
    assert "Exchange" not in plan
