"""Unit tests for operators/temporal.py edge cases the oracle queries
don't reach: as-of tolerance, inclusive tie at equal timestamps, and
timestamp-collision determinism on the build side."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from imp_etl_spark.operators.temporal import asof_join, range_join_binned

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _ts(minutes: float) -> dt.datetime:
    return T0 + dt.timedelta(minutes=minutes)


def test_asof_tolerance_and_ties(spark):
    probe = spark.createDataFrame(
        [(1, 100, _ts(0)), (2, 100, _ts(30)), (3, 200, _ts(5))],
        "pid INT, key INT, ts TIMESTAMP_NTZ",
    )
    build = spark.createDataFrame(
        [
            (10, 100, _ts(-1), 1.0),
            (11, 100, _ts(0), 2.0),   # tie with probe 1 -> inclusive match
            (12, 100, _ts(29), 3.0),
            (13, 300, _ts(0), 9.0),   # other key, never matches
        ],
        "bid INT, key INT, ts TIMESTAMP_NTZ, v DOUBLE",
    )
    out = asof_join(
        probe, build, on="key", probe_ts="ts", build_ts="ts",
        build_cols={"bid": "m_bid", "v": "m_v"}, tolerance="'10' minutes",
    )
    rows = {r.pid: (r.m_bid, r.m_v) for r in out.collect()}
    assert rows[1] == (11, 2.0)        # equal ts matches (backward incl.)
    assert rows[2] == (12, 3.0)        # 1 min old, within tolerance
    assert rows[3] == (None, None)     # key 200 has no build rows


def test_asof_tolerance_expires(spark):
    probe = spark.createDataFrame(
        [(1, 1, _ts(60))], "pid INT, key INT, ts TIMESTAMP_NTZ")
    build = spark.createDataFrame(
        [(10, 1, _ts(0), 5.0)], "bid INT, key INT, ts TIMESTAMP_NTZ, v DOUBLE")
    out = asof_join(
        probe, build, on="key", probe_ts="ts", build_ts="ts",
        build_cols={"bid": "m_bid", "v": "m_v"}, tolerance="'10' minutes",
    ).collect()[0]
    assert out.m_bid is None and out.m_v is None


def test_asof_build_ts_collision_deterministic(spark):
    probe = spark.createDataFrame(
        [(1, 1, _ts(1))], "pid INT, key INT, ts TIMESTAMP_NTZ")
    build = spark.createDataFrame(
        [(10, 1, _ts(0), 1.0), (11, 1, _ts(0), 2.0)],
        "bid INT, key INT, ts TIMESTAMP_NTZ, v DOUBLE",
    )
    out = asof_join(
        probe, build, on="key", probe_ts="ts", build_ts="ts",
        build_cols={"bid": "m_bid", "v": "m_v"},
    ).collect()[0]
    assert out.m_bid == 11  # last per (key, ts) by first build_cols key


def test_range_join_binned_boundaries(spark):
    probe = spark.createDataFrame(
        [(1, 1, _ts(10))], "pid INT, key INT, ts TIMESTAMP_NTZ")
    build = spark.createDataFrame(
        [
            (20, 1, _ts(-0.01)),   # just outside lower bound
            (21, 1, _ts(0)),       # exactly probe - 10m -> inclusive
            (22, 1, _ts(10)),      # exactly probe ts -> inclusive
            (23, 1, _ts(10.01)),   # after probe
            (24, 2, _ts(5)),       # wrong key
        ],
        "bid INT, key INT, ts TIMESTAMP_NTZ",
    )
    out = range_join_binned(
        probe, build, on="key", probe_ts="ts", build_ts="ts",
        lower="'-10' minutes", upper="'0' seconds", bin_width_s=600,
    )
    assert sorted(r.bid for r in out.collect()) == [21, 22]
