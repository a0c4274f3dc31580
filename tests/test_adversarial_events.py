"""Adversarial-events differential: every events-only oracle query runs
on Spark AND DuckDB over a fixture of dirty-telemetry edge cases and must
match value-for-value:

- zero-variance groups and same-instant event bursts (zero durations),
- extreme-but-in-domain values (|value| <= 1e9; the exact-decimal
  aggregation convention documents ~1e12 as the ceiling, and NaN/Inf are
  the cleanse tier's contract to remove),
- malformed props JSON (garbage, truncated, empty string, non-object,
  duplicate keys, unicode keys),
- NULL timestamp / user / event_type / value / props fields,
- single-event users, epoch-adjacent (1970) and far-future (2200)
  timestamps.

Round-5 findings this suite pins: the temporal contract (untimed events
participate in no window, sequence, segment or Z-layout — otherwise NULL
sort position diverges between Spark's nulls-first and SQL's nulls-last),
NULL-valued rows excluded from outlier baselines, json_valid-guarded
oracle extraction, truncating (not floor) negative-duration formatting,
NULL-propagating format_string, widened decimal casts in the micro-unit
moment pipelines, and decimal->double casts that no longer detour through
BIGINT (which errored past 2^63).
"""

from __future__ import annotations

import datetime
import os
import re

import pytest

from imp_etl_spark import schemas
from imp_etl_spark.queries import REGISTRY
from tests.test_oracle import _rows

_T0 = datetime.datetime(2024, 3, 1, 12, 0, 0)


def _ts(sec):
    return _T0 + datetime.timedelta(seconds=sec)


def _rows_fixture():
    rows = []
    eid = 0

    def add(t, user, etype, value, props):
        nonlocal eid
        eid += 1
        rows.append((eid, t, user, etype, value, props))

    # user 1: constant values (zero variance), distinct times
    for i in range(6):
        add(_ts(i * 60), 1, "click", 5.0, '{"k": 1}')
    # user 2: all events at the SAME instant (zero durations/gaps)
    for i in range(5):
        add(_ts(0), 2, "click", float(i), '{"k": 2}')
    # user 3: extreme-but-in-domain values
    add(_ts(10), 3, "click", 1e9, "{}")
    add(_ts(20), 3, "click", -1e9, "{}")
    add(_ts(30), 3, "click", 1e-9, "{}")
    add(_ts(40), 3, "purchase", 123456789.123456, "{}")
    add(_ts(50), 3, "purchase", -0.0, "{}")
    # user 4: adversarial props JSON
    add(_ts(60), 4, "click", 1.0, None)
    add(_ts(61), 4, "click", 1.0, "")
    add(_ts(62), 4, "click", 1.0, "not json at all")
    add(_ts(63), 4, "click", 1.0, '{"unterminated": ')
    add(_ts(64), 4, "click", 1.0, '{"nested": {"deep": [1, 2, {"x": null}]}}')
    add(_ts(65), 4, "click", 1.0, '{"unicode_键": "值\U0001f389", "q": "a\\"b"}')
    add(_ts(66), 4, "click", 1.0, "[]")
    add(_ts(67), 4, "click", 1.0, '{"dup": 1, "dup": 2}')
    # user 5: null event_type / null value / null ts / null user
    add(_ts(70), 5, None, 1.0, "{}")
    add(_ts(71), 5, "click", None, "{}")
    add(None, 5, "click", 2.0, "{}")
    add(_ts(73), None, "click", 3.0, "{}")
    # user 6: single event (windows of one)
    add(_ts(80), 6, "signup", 1.0, "{}")
    # users 7/8: extreme timestamps — SEPARATE single-event users, so
    # the epoch-boundary and far-future classes stay covered without a
    # 230-year hourly grid (2M resample rows per differential run; the
    # giant-span class itself is pinned count+spot-check in
    # tests/test_behavior.py::test_giant_span_key_resample, and its
    # skew economics are measured in SCALING.md)
    add(datetime.datetime(1970, 1, 1, 0, 0, 1), 7, "click", 1.0, "{}")
    add(datetime.datetime(2200, 1, 1, 0, 0, 0), 8, "click", 2.0, "{}")
    # user 9: 100-day event gap — the hourly resample grid spans four
    # 720-tick chunks with two event-EMPTY chunks between the events,
    # so every differential run exercises the chunked ffill's
    # carry-in across chunk boundaries and through empty chunks
    add(_ts(90), 9, "click", 4.0, "{}")
    add(_ts(90 + 100 * 86400), 9, "purchase", 8.0, "{}")
    return rows


_OTHER_TABLES = ["region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem", "documents", "embeddings"]

EVENTS_ONLY = [
    n for n, (_f, s) in REGISTRY.items()
    if s is not None and re.search(r"\bevents\b", s.lower())
    and not any(re.search(rf"\b{t}\b", s.lower()) for t in _OTHER_TABLES)
]


@pytest.fixture(scope="module")
def adv_ev_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("sf_evadv")
    spark.createDataFrame(_rows_fixture(), schemas.FIXTURE_TABLES["events"]) \
        .write.mode("overwrite").parquet(os.path.join(str(d), "events.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def adv_ev_duck(adv_ev_dir):
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{adv_ev_dir}/events.parquet/*.parquet')")
    return con


def test_events_only_queries_cover_the_tier():
    for must in ("events_session_10m", "outlier_events_zscore",
                 "outlier_events_mad", "json_extract_props",
                 "scd2_user_state", "twap_user_value",
                 "agg_stats_moments", "stateful_user_stats"):
        assert must in EVENTS_ONLY


@pytest.mark.parametrize("name", EVENTS_ONLY)
def test_query_matches_oracle_on_adversarial_events(spark, adv_ev_duck,
                                                    adv_ev_dir, name):
    fn, sql = REGISTRY[name]
    sdf = fn(spark, adv_ev_dir)
    rel = adv_ev_duck.sql(sql)
    duck_cols = [c.lower() for c in rel.columns]
    spark_rows = [
        tuple(row[c] for c in duck_cols)
        for row in (r.asDict() for r in sdf.collect())
    ]
    duck_rows = [tuple(r) for r in rel.fetchall()]
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}")
    sn, dn = _rows(spark_rows), _rows(duck_rows)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(sn, dn)) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:5]}"


def test_json_extraction_engine_boundary(spark):
    """Pin the documented JSON boundary (SEMANTICS.md): typed from_json
    (Jackson — strict types, lenient syntax, LAST duplicate key wins)
    vs json_extract+TRY_CAST (strict syntax, coercing cast, FIRST
    duplicate key wins). The fixture pools stay inside the agreed
    region; this test keeps the doc honest on both the divergent and
    the agreeing cases."""
    import duckdb

    from pyspark.sql import functions as F

    # payload: (spark_expected, duck_expected)
    cases = {
        '{"k": 1}': (1, 1),                      # agree
        ' {"k":4} ': (4, 4),                     # agree: whitespace
        '{"K": 3}': (None, None),                # agree: case-sensitive
        '{"k": [1,2]}': (None, None),            # agree: non-scalar
        '{"k": null}': (None, None),             # agree
        '{"k": 9999999999999999999}': (None, None),  # agree: i64 overflow
        '{"k": 2147483648}': (2147483648, 2147483648),  # agree: >i32
        '{"k":"7"}': (None, 7),                  # DIVERGE: typed vs coerce
        '{"k": 1.9}': (None, 2),                 # DIVERGE
        '{"k": true}': (None, 1),                # DIVERGE
        '{"k": 1e3}': (None, 1000),              # DIVERGE
        '{"k":1,"k":2}': (2, 1),                 # DIVERGE: dup-key order
        "{'k': 5}": (5, None),                   # DIVERGE: syntax leniency
    }
    sdf = spark.createDataFrame([(c,) for c in cases], "props string") \
        .select("props", F.from_json("props", "k BIGINT")["k"].alias("k"))
    got_s = {r["props"]: r["k"] for r in sdf.collect()}
    con = duckdb.connect()
    for c, (want_s, want_d) in cases.items():
        got_d = con.execute(
            """SELECT CASE WHEN json_valid(?)
               THEN TRY_CAST(json_extract(?, '$.k') AS BIGINT) END""",
            [c, c]).fetchone()[0]
        assert got_s[c] == want_s, (c, got_s[c])
        assert got_d == want_d, (c, got_d)
