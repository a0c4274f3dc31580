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


def test_asof_partition_count_invariance_and_hot_key(spark):
    """Round-8 range-partitioned asof (temporal.py module docstring):
    a single hot key whose probe+build history spans MANY range
    partitions must fill identically at num_partitions 1, 7 and 32 —
    the per-partition carry chain is exactly equivalent to the old
    one-task-per-key window. Mixes null-value builds (row-atomic
    carry), a null-key probe (routed around the ranged machinery), a
    null-ts probe (sorts before its key's builds -> no match), and a
    same-instant burst (dedup by groupBy, max payload wins)."""
    import random

    rng = random.Random(5)
    build_rows = [(i, 1, _ts(i), float(i) if i % 7 else None)
                  for i in range(0, 400, 2)]
    build_rows += [(1000 + j, 1, _ts(100), 50.0 + j) for j in range(5)]
    build_rows += [(2000, 2, _ts(3), 9.0)]
    build = spark.createDataFrame(
        build_rows, "bid INT, key INT, ts TIMESTAMP_NTZ, v DOUBLE")
    probe_rows = [(i, 1, _ts(rng.uniform(-5, 405))) for i in range(300)]
    probe_rows += [(900, 2, _ts(2.5)), (901, 2, _ts(3)),
                   (902, None, _ts(10)), (903, 3, _ts(10)),
                   (904, 1, None)]
    probe = spark.createDataFrame(
        probe_rows, "pid INT, key INT, ts TIMESTAMP_NTZ")

    def run(n):
        out = asof_join(
            probe, build, on="key", probe_ts="ts", build_ts="ts",
            build_cols={"bid": "m_bid", "v": "m_v"}, num_partitions=n)
        return sorted(
            ((r.pid, r.m_bid, r.m_v) for r in out.collect()),
            key=lambda t: t[0])

    r1, r7, r32 = run(1), run(7), run(32)
    assert r1 == r7 == r32
    got = {pid: (b, v) for pid, b, v in r1}
    assert got[900] == (None, None)      # before key 2's only build
    assert got[901] == (2000, 9.0)       # equal-ts inclusive
    assert got[902] == (None, None)      # null key never matches
    assert got[903] == (None, None)      # key with no builds
    assert got[904] == (None, None)      # null probe ts
    # burst at ts=100: the (key, ts) dedup keeps ONLY the max payload
    # (bid 1004) — some probe lands in [100, 102) so it must surface,
    # and no probe may ever see a losing burst row (100, 1000..1003)
    matched_bids = {b for _, b, _ in r1 if b is not None}
    assert 1004 in matched_bids
    assert matched_bids.isdisjoint({100, 1000, 1001, 1002, 1003})


def test_seq_lag_partition_invariance_and_hot_key(spark):
    """Round-8 lag-class machinery (operators/window.py seq_lag —
    range partitioning on (key, order) + k-boundary-row exchange with
    driver-chained carry): a hot key holding most of the frame spans
    MANY range partitions, and every lag/lead must equal the plain
    ``partitionBy(key)`` window form at num_partitions 1, 7 and 32 —
    including NULL-keyed rows (a real group per PARTITION BY), keys
    whose whole history fits inside one partition, keys with fewer
    than k prior rows at a boundary (carry chains across short and
    empty partitions), and k=2 (two boundary rows per edge)."""
    import random

    from pyspark.sql import Window

    from imp_etl_spark.operators.window import seq_lag

    rng = random.Random(11)
    rows = [
        (rng.choice([None, "hot", "hot", "hot", "hot", "u1", "u2", "u3"]),
         rng.randint(0, 10**6), eid, rng.choice("abcde"),
         float(rng.randint(0, 100)))
        for eid in range(1500)
    ]
    rows.append(("lone", 5, 9001, "z", 1.0))  # single-row key
    df = spark.createDataFrame(
        rows, "user STRING, ts LONG, eid LONG, et STRING, v DOUBLE")

    w = Window.partitionBy("user").orderBy("ts", "eid")
    exp = sorted(
        (tuple(r) for r in df.select(
            "*", F.lag("et", 2).over(w).alias("p_et"),
            F.lag("v", 2).over(w).alias("p_v"),
            F.lead("et", 2).over(w).alias("n_et")).collect()),
        key=lambda t: t[2])
    for n in (1, 7, 32):
        got = sorted(
            (tuple(r) for r in seq_lag(
                df, ["user"], ["ts", "eid"],
                lags={"et": "p_et", "v": "p_v"}, leads={"et": "n_et"},
                k=2, num_partitions=n).collect()),
            key=lambda t: t[2])
        assert got == exp, f"n={n}: first diff " + str(
            next((a, b) for a, b in zip(got, exp) if a != b))

    # short-partition chain: 11 rows at num_partitions 32 forces every
    # range partition to hold FEWER than k=3 rows, so each carry must
    # chain through multiple short/empty partitions (and a null key
    # rides along as its own group)
    tiny = spark.createDataFrame(
        [("a", i, float(i)) for i in range(7)]
        + [(None, i, float(100 + i)) for i in range(4)],
        "user STRING, ts LONG, v DOUBLE")
    wt = Window.partitionBy("user").orderBy("ts")
    key = lambda t: tuple((x is None, str(x)) for x in t)  # noqa: E731
    texp = sorted((tuple(r) for r in tiny.select(
        "*", F.lag("v", 3).over(wt).alias("p"),
        F.lead("v", 3).over(wt).alias("nx")).collect()), key=key)
    tgot = sorted((tuple(r) for r in seq_lag(
        tiny, ["user"], ["ts"], lags={"v": "p"}, leads={"v": "nx"},
        k=3, num_partitions=32).collect()), key=key)
    assert tgot == texp


def test_seq_lag_order_column_sources_and_multi_offset(spark):
    """Round-9 fixes: (a) a lag/lead SOURCE may be a key or order
    column (the payload struct dedupes — previously
    COLUMN_ALREADY_EXISTS, exactly the shape the order-gaps and SCD2
    consumers need: lag the order date, lead the timestamp); (b) one
    call may request DIFFERENT offsets per output via the triple-list
    form (lag 1 AND lag 2 of the same column — top_event_paths'
    n-gram shape) with the boundary exchange sized by max(offsets);
    (c) a lead-only call must not depend on the tail count. All
    value-exact against the plain window form at several partition
    counts."""
    import random

    from pyspark.sql import Window

    from imp_etl_spark.operators.window import seq_lag

    rng = random.Random(23)
    rows = [
        (rng.choice([None, "hot", "hot", "hot", "u1", "u2"]),
         rng.randint(0, 10**5), eid, rng.choice("abc"))
        for eid in range(800)
    ]
    df = spark.createDataFrame(
        rows, "user STRING, ts LONG, eid LONG, et STRING")
    w = Window.partitionBy("user").orderBy("ts", "eid")
    exp = sorted(
        (tuple(r) for r in df.select(
            "*",
            F.lag("ts", 1).over(w).alias("prev_ts"),
            F.lead("ts", 1).over(w).alias("next_ts"),
            F.lag("et", 1).over(w).alias("p1"),
            F.lag("et", 2).over(w).alias("p2")).collect()),
        key=lambda t: t[2])
    for n in (1, 5, 32):
        got = sorted(
            (tuple(r) for r in seq_lag(
                df, ["user"], ["ts", "eid"],
                lags=[("ts", "prev_ts", 1),
                      ("et", "p1", 1), ("et", "p2", 2)],
                leads={"ts": "next_ts"},
                num_partitions=n)
             .select("user", "ts", "eid", "et",
                     "prev_ts", "next_ts", "p1", "p2")
             .collect()),
            key=lambda t: t[2])
        assert got == exp, f"n={n}: first diff " + str(
            next((a, b) for a, b in zip(got, exp) if a != b))

    # lead-only call (no tail collect) on an order-column source
    le = sorted((tuple(r) for r in seq_lag(
        df, ["user"], ["ts", "eid"], leads={"eid": "nx"},
        num_partitions=7)
        .select("user", "ts", "eid", "et", "nx").collect()),
        key=lambda t: t[2])
    lexp = sorted((tuple(r) for r in df.select(
        "*", F.lead("eid", 1).over(w).alias("nx")).collect()),
        key=lambda t: t[2])
    assert le == lexp
