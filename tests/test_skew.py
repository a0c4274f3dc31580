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


def test_top_key_share_probe(spark):
    """top_key_share: exact verified share for any key above support
    (freqItems has no false negatives there), (0, None) when nothing
    crosses support or the frame is empty."""
    from imp_etl_spark.operators.window import top_key_share

    rows = ([("hot", i) for i in range(700)]
            + [(f"u{i}", i) for i in range(300)])
    df = spark.createDataFrame(rows, "user STRING, x LONG")
    share, key = top_key_share(df, ["user"], support=0.125)
    assert key == "hot" and abs(share - 0.7) < 1e-12

    uni = spark.createDataFrame(
        [(f"u{i % 97}", i) for i in range(970)], "user STRING, x LONG")
    share, key = top_key_share(uni, ["user"], support=0.125)
    # ~1% shares: freqItems may surface false candidates, but exact
    # verification keeps the share tiny and never promotes one
    assert share < 0.125

    empty = df.where(F.lit(False))
    assert top_key_share(empty, ["user"]) == (0.0, None)


def test_top_key_share_memo(spark, tmp_path):
    """The probe memo (round 9): a semantically identical frame read
    SEPARATELY from the same path must hit (expression ids are
    normalized by semanticHash/sameResult), different supports must
    not cross-hit, memo=False must bypass, and release_probe_memo
    must clear. Proven by poisoning: a sentinel planted under the
    first probe's memo slot comes back from the second, semantically
    equal probe — only a real lookup can return it."""
    from imp_etl_spark.operators.window import (
        _PROBE_MEMO,
        release_probe_memo,
        top_key_share,
    )

    p = str(tmp_path / "ev.parquet")
    spark.createDataFrame(
        [("hot" if i % 4 else f"u{i}", i) for i in range(400)],
        "user STRING, x LONG").write.parquet(p)
    release_probe_memo()

    probe1 = spark.read.parquet(p).select("user")
    share, key = top_key_share(probe1, ["user"])
    assert key == "hot" and abs(share - 0.75) < 1e-12
    assert sum(len(v) for v in _PROBE_MEMO.values()) == 1

    # poison the stored result; a fresh, separately-read but
    # semantically identical probe must return the sentinel
    slot = next(iter(_PROBE_MEMO.values()))
    slot[0] = (slot[0][0], (0.4242, "sentinel"))
    probe2 = spark.read.parquet(p).select("user")
    assert top_key_share(probe2, ["user"]) == (0.4242, "sentinel")

    # a different support is a different decision — no cross-hit
    share3, key3 = top_key_share(probe2, ["user"], support=0.3)
    assert key3 == "hot" and abs(share3 - 0.75) < 1e-12

    # memo=False bypasses the (still poisoned) slot
    share4, key4 = top_key_share(probe2, ["user"], memo=False)
    assert key4 == "hot" and abs(share4 - 0.75) < 1e-12

    # release clears; the next probe recomputes the true value
    assert release_probe_memo() >= 2
    assert top_key_share(probe2, ["user"])[1] == "hot"
    release_probe_memo()


def test_lag_dispatch_modes_and_auto(spark):
    """lag_dispatch: the window and seq shapes are value-identical;
    auto picks seq on a hot-key frame and window on a uniform one
    (resolve_lag_mode), and the conf override forces either."""
    import random

    from imp_etl_spark.operators.window import (
        lag_dispatch,
        resolve_lag_mode,
    )

    rng = random.Random(7)
    hot = spark.createDataFrame(
        [("bot" if i % 10 else f"u{i}", rng.randint(0, 10**6), i,
          float(i % 13)) for i in range(1000)],
        "user STRING, ts LONG, eid LONG, v DOUBLE")
    uni = spark.createDataFrame(
        [(f"u{i % 50}", rng.randint(0, 10**6), i, float(i % 13))
         for i in range(1000)],
        "user STRING, ts LONG, eid LONG, v DOUBLE")

    assert resolve_lag_mode(hot.select("user"), ["user"]) == "seq"
    assert resolve_lag_mode(uni.select("user"), ["user"]) == "window"
    assert resolve_lag_mode(hot.select("user"), ["user"],
                            mode="window") == "window"

    for df in (hot, uni):
        outs = {}
        for mode in ("window", "seq"):
            outs[mode] = sorted(
                (tuple(r) for r in lag_dispatch(
                    df, ["user"], ["ts", "eid"],
                    lags={"v": "pv"}, leads={"ts": "nts"},
                    mode=mode).collect()),
                key=lambda t: t[2])
        assert outs["window"] == outs["seq"]

    # conf override path
    spark.conf.set("spark.imp_etl.lagDispatch.mode", "seq")
    try:
        assert resolve_lag_mode(uni.select("user"), ["user"]) == "seq"
    finally:
        spark.conf.set("spark.imp_etl.lagDispatch.mode", "auto")


def test_state_intervals_dispatch_shapes_equal(spark):
    """state_intervals (SCD2) through the dispatch: forced window and
    forced seq produce identical interval sets, hot key included."""
    import random

    from imp_etl_spark.operators import behavior

    rng = random.Random(31)
    rows = [("bot" if i % 5 else f"u{i % 7}", rng.randint(0, 10**5), i,
             rng.choice("ab")) for i in range(600)]
    ev = spark.createDataFrame(
        rows, "user_id STRING, ts LONG, event_id LONG, event_type STRING")
    key = lambda t: tuple((x is None, str(x)) for x in t)  # noqa: E731
    got_w = sorted((tuple(r) for r in behavior.state_intervals(
        ev, mode="window").collect()), key=key)
    got_s = sorted((tuple(r) for r in behavior.state_intervals(
        ev, mode="seq").collect()), key=key)
    assert got_w == got_s and len(got_w) > 0
