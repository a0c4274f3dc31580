"""Mirror of the driver's correctness gate: run every REGISTRY query on
Spark and its oracle SQL on DuckDB over the same parquet, compare
row-count + column names + order-insensitive values.

Keeping this green locally means the driver's CORRECTNESS_r{N}.json
should be green too.
"""

from __future__ import annotations

import math

import pytest

from imp_etl_spark.queries import REGISTRY
from tests.conftest import ORACLE_SF_DIR

SQL_QUERIES = [n for n, (_f, s) in REGISTRY.items() if s is not None]
ROWS_ONLY_QUERIES = [n for n, (_f, s) in REGISTRY.items() if s is None]


def _normalize(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0 and reduce ulp-level noise far below data scale
        return round(v, 9) + 0.0
    return v


def _rows(records):
    return sorted(
        [tuple(_normalize(v) for v in row) for row in records],
        key=lambda r: tuple((x is None, str(type(x)), str(x)) for x in r),
    )


@pytest.mark.parametrize("name", SQL_QUERIES)
def test_query_matches_oracle(spark, duck, name):
    fn, sql = REGISTRY[name]
    sdf = fn(spark, ORACLE_SF_DIR)
    spark_cols = [c.lower() for c in sdf.columns]

    rel = duck.sql(sql)
    duck_cols = [c.lower() for c in rel.columns]
    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )

    spark_rows = [
        tuple(row[c] for c in duck_cols)
        for row in (r.asDict() for r in sdf.collect())
    ]
    duck_rows = [tuple(r) for r in rel.fetchall()]
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    sn, dn = _rows(spark_rows), _rows(duck_rows)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(sn, dn)) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:5]}"


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_queries_run(spark, name):
    fn, _ = REGISTRY[name]
    df = fn(spark, ORACLE_SF_DIR)
    assert df.count() >= 0
    assert len(df.schema) > 0
