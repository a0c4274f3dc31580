from __future__ import annotations

import os

import pytest

from imp_etl_spark.session import get_spark

# sf0.001 keeps unit tests fast; the oracle differential test overrides via
# SPARK_GRAFT_TEST_SF (the driver's gate runs at sf0.01).
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
ORACLE_SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")

FIXTURE_NAMES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="session")
def spark():
    s = get_spark("imp-etl-spark-tests")
    yield s


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for name in FIXTURE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{ORACLE_SF_DIR}/{name}.parquet')"
        )
    return con
