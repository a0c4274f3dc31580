"""Tie-rounding parity of the micro-unit quantizers vs DuckDB.

Binary doubles DO produce exact .5 micro-unit ties (any odd multiple
of 2^-7 does: 0.0078125 -> 7812.5), and values like 3.5e-6 whose exact
binary expansion sits just below the tie while the shortest decimal
form IS the tie. DuckDB's double->DECIMAL(18,6) cast rounds the
shortest decimal representation with halves away from zero; the
quantizers in operators/agg.py and streaming/stateful.py must apply
the identical rule or the per_group_trend / stateful_user_stats
oracles diverge on plausible inputs. Round-2 advice item.
"""

from __future__ import annotations

import random
from decimal import ROUND_HALF_UP, Decimal

TIE_VALUES = [0.0078125, 0.1015625, 3.5e-6, 2.5e-6, -0.0078125,
              -0.1015625, -3.5e-6, 0.0234375, 1.25, 0.1, -7.5e-6,
              12345.6789012345, 1e-7, 4.999e-7, 0.9999995]


def _duck_micro(duck, v: float) -> int:
    d = duck.sql(
        f"SELECT CAST(CAST({v!r} AS DOUBLE) AS DECIMAL(18,6))"
    ).fetchone()[0]
    return int(d.scaleb(6))


def test_stateful_quantizer_matches_duckdb_on_ties(duck):
    from imp_etl_spark.streaming.stateful import _quantize_micro

    for v in TIE_VALUES:
        assert _quantize_micro([v]) == _duck_micro(duck, v), v
    # and sums are the quantize-then-add of the parts (order-free ints)
    assert _quantize_micro(TIE_VALUES) == sum(
        _duck_micro(duck, v) for v in TIE_VALUES)


def test_trend_quantizer_matches_duckdb_on_ties(duck):
    """per_group_trend quantizes inline (operators/agg.py _fit); assert
    the exact expression used there."""
    for v in TIE_VALUES:
        py = int(Decimal(repr(float(v))).scaleb(6)
                 .to_integral_value(rounding=ROUND_HALF_UP))
        assert py == _duck_micro(duck, v), v


def test_quantizer_matches_duckdb_randomized(duck):
    """Sweep random doubles, including values scaled near 2^-7 where
    exact .5 micro-unit ties are dense."""
    from imp_etl_spark.streaming.stateful import _quantize_micro

    rng = random.Random(7)
    vals = [rng.uniform(-1000, 1000) for _ in range(100)]
    vals += [rng.uniform(-1, 1) * 2 ** -7 for _ in range(100)]
    for v in vals:
        assert _quantize_micro([v]) == _duck_micro(duck, v), v


def test_wide_accumulate_survives_partial_long_overflow(spark):
    """The ANSI long-SUM abort class (round 9, found first in the
    bench calibration job): Spark's SUM over BIGINT raises
    ARITHMETIC_OVERFLOW the moment any PARTIAL accumulation crosses
    int64 — even when the true total fits — while the DuckDB oracle
    accumulates in HUGEINT and only casts the final. The registry's
    long-valued sums over unbounded user-controlled magnitudes
    (json_extract_props sum_k, rfm monetary/segment cents) therefore
    accumulate in DECIMAL(38,0) and cast the FINAL to long. This pins
    both halves: the naive expression aborts on a partial-overflow
    layout, the wide-accumulate form returns the exact total."""
    import pytest
    from pyspark.sql import functions as F

    five_e18 = 5_000_000_000_000_000_000
    rows = ([("a", five_e18)] * 3) + ([("b", -five_e18)] * 2)
    # range partition on the group: partition holding "a" accumulates
    # 1.5e19 > int64 max, but the true total is 5e18 — in range
    df = spark.createDataFrame(
        rows, "p STRING, k LONG").repartitionByRange(2, "p")
    with pytest.raises(Exception, match="ARITHMETIC_OVERFLOW|overflow"):
        df.agg(F.sum("k").alias("s")).collect()
    got = df.agg(
        F.sum(F.col("k").cast("decimal(38,0)")).cast("long").alias("s")
    ).collect()[0]["s"]
    assert got == five_e18
