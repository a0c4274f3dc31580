"""Degenerate-input sweep: every registry query on zero-row tables.

At 100 TB a filter/partition-prune routinely hands an operator an empty
frame (a crawl batch with no new docs, a day partition with no events, a
queue drained to zero). The reference's pipeline handles the empty queue
explicitly (``etlService.js`` skips the run when no pending rows); this
engine must degrade the same way everywhere: every query builds, executes
and yields a well-formed (possibly empty, possibly single-row global-agg)
result — never a crash in plan-build, codegen or an iterative loop's
zero-iteration edge.

One test sweeps the whole registry against a zero-row clone of the
fixture schemas and reports every failure at once (a parametrized split
would pay 150x session/jvm fixture overhead for no extra signal).
"""

from __future__ import annotations

import os

import pytest

from imp_etl_spark import schemas
from imp_etl_spark.queries import REGISTRY


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("sf_empty")
    for name, schema in schemas.FIXTURE_TABLES.items():
        spark.createDataFrame([], schema).write.mode("overwrite").parquet(
            os.path.join(str(d), f"{name}.parquet"))
    return str(d)


def test_grouping_sets_emit_global_row_on_empty(spark, empty_sf_dir):
    """ANSI (and the DuckDB oracle) emit ONE row for the global ``()``
    grouping set over an empty input — NULL keys, COUNT 0, SUM NULL.
    Spark's native cube/rollup emit nothing there (every expanded set is
    keyed by grouping_id), which fuzz seed 36 caught as a 0-vs-1
    rowcount divergence; the pre-aggregated rewrite (queries.py
    _sets_preagg) restores the standard row."""
    for name in ("agg_cube", "agg_rollup", "agg_grouping_sets"):
        fn, _sql = REGISTRY[name]
        rows = fn(spark, empty_sf_dir).collect()
        assert len(rows) == 1, f"{name}: {rows}"
        vals = tuple(rows[0])
        assert vals[:2] == (None, None), f"{name}: {vals}"
        assert rows[0]["cnt"] == 0, f"{name}: {vals}"


def _sweep_registry(spark, sf_dir):
    """Run every registry query against sf_dir, return failure strings.

    Threaded (same pattern as tools/fuzz_differential.run_seed): the
    per-query cost on a 0-3-row fixture is job-submission latency, not
    compute. Sound because of the registry-wide thread-safety contract
    stated at REGISTRY's definition (imp_etl_spark/registry.py): every
    entry must tolerate concurrent callers on a shared session and a
    shared sf_dir — the idempotent view re-registration in load_tables
    and the lock-serialized dedup memo are what make that hold today.
    Measured ~3x faster than the serial loop on the 150-query registry.
    """
    from concurrent.futures import ThreadPoolExecutor

    def _one(item):
        name, (fn, _sql) = item
        try:
            fn(spark, sf_dir).write.format("noop").mode(
                "overwrite").save()
            return None
        except Exception as exc:  # collect all, report once
            return f"{name}: {type(exc).__name__}: {exc}"

    with ThreadPoolExecutor(max_workers=16) as pool:
        return [f for f in pool.map(_one, REGISTRY.items()) if f]


def test_registry_sweep_on_empty_tables(spark, empty_sf_dir):
    failures = _sweep_registry(spark, empty_sf_dir)
    assert not failures, (
        f"{len(failures)}/{len(REGISTRY)} queries crash on empty input:\n"
        + "\n".join(failures[:20]))


# per-table key columns kept non-null in the null-heavy sweep; a null
# primary key is a broken upstream extract, but a null in ANY other
# column is ordinary dirty data a 100 TB crawl serves constantly
_KEYS = {
    "region": ["r_regionkey"], "nation": ["n_nationkey"],
    "customer": ["c_custkey"], "supplier": ["s_suppkey"],
    "part": ["p_partkey"], "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey", "l_linenumber"],
    "events": ["event_id"], "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


@pytest.fixture(scope="module")
def nulls_sf_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("sf_nulls")
    for name, schema in schemas.FIXTURE_TABLES.items():
        rows = [
            tuple(i if f.name in _KEYS[name] else None
                  for f in schema.fields)
            for i in (1, 2, 3)
        ]
        spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
            os.path.join(str(d), f"{name}.parquet"))
    return str(d)


def test_registry_sweep_on_all_null_columns(spark, nulls_sf_dir):
    failures = _sweep_registry(spark, nulls_sf_dir)
    assert not failures, (
        f"{len(failures)}/{len(REGISTRY)} queries crash on null-heavy "
        "input:\n" + "\n".join(failures[:20]))
