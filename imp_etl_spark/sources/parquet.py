"""Parquet sources for the test fixtures (TESTDATA.md).

The reference reads MySQL through two connection pools (``config/db.js``);
in this harness Parquet stands in as the primary storage format and the
JDBC reader (``sources/jdbc.py``) keeps the reference's deployment shape
available behind the same interface.

Scale notes: we read with the *declared* schema (no footer-merge or
inference job), so column pruning and filter pushdown flow straight to the
parquet scan — ``.explain`` shows ReadSchema limited to selected columns
and PushedFilters for every comparison/null predicate used by the
operators in this package.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from imp_etl_spark import schemas

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table with its declared schema."""
    schema = schemas.FIXTURE_TABLES.get(name)
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_fixtures(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR,
                  names: list[str] | None = None) -> dict[str, DataFrame]:
    """Load the fixture tables as a dict and register temp views."""
    out: dict[str, DataFrame] = {}
    for name in names or schemas.FIXTURE_TABLES:
        df = read_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
