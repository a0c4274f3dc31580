"""Aggregation operators (SURVEY.md §2.4) + the analytics extension
surface (§7.8): grouped aggregation, grouping sets/rollup/cube, top-k,
and the reference's counter/observe accounting.

Scale notes: all grouped aggregations compile to partial (map-side) +
final aggregation, so the shuffle carries one row per (partition, group),
not per input row. Top-k uses sort-limit which Spark executes as a
per-partition top-k + single-reduce merge — never a full sort of the
input. ``observe`` metrics ride the existing job (no extra pass), exactly
replacing the reference's per-batch counter accumulation
(etlService.js:473-477).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def filtered_count(df: DataFrame, predicate: Column) -> int:
    """A1 — COUNT(*) with predicate (models/EtlLogger.js:19-27)."""
    return df.filter(predicate).count()


def top_k(df: DataFrame, order: Sequence[Column], k: int) -> DataFrame:
    """O3/A7 — deterministic top-k (callers must make ``order`` total,
    e.g. by appending a unique key as tie-break)."""
    return df.orderBy(*order).limit(k)


def group_counts(df: DataFrame, keys: Sequence[str],
                 *aggs: Column) -> DataFrame:
    """A2 — per-key counters (processed/skipped shape)."""
    return df.groupBy(*keys).agg(*aggs)


def observe_counters(df: DataFrame, name: str = "etl") -> tuple[DataFrame, Observation]:
    """A3/A5 — attach processed/skipped counters to a plan without an
    extra pass. Mirrors the reference's run summary counters
    (etlService.js:512-519): read ``observation.get`` after the action.
    """
    obs = Observation(name)
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("processed"),
    )
    return observed, obs


def progress_pct(offset: Column | int, total: Column | int) -> Column:
    """A6 — clamped progress percentage (the reference logs an unclamped
    variant — quirk Q5; we clamp, as its own `Math.min` intends)."""
    o = F.lit(offset) if isinstance(offset, int) else offset
    t = F.lit(total) if isinstance(total, int) else total
    return F.least(F.round(o / t * 100), F.lit(100).cast("double"))


# x shift for the trend fit: 2024-01-01 UTC in epoch microseconds. Shifting
# x by a constant leaves slope/intercept(mean-y)/r2 unchanged but keeps the
# exact integer moments small enough for 128-bit accumulation in DuckDB.
TREND_EPOCH_US = 1_704_067_200_000_000


def per_group_trend(events, key: str = "user_id", x_col: str = "ts",
                    y_col: str = "value"):
    """Per-key least-squares trend (slope at µs->y-per-second scale,
    intercept = mean y, r2) via grouped-map ``applyInPandas`` — the batch
    Pandas-API shape for per-group model fitting. Arrow moves each group
    as one columnar batch; the shuffle is on ``key`` only, output is O(1)
    per group.

    Determinism (this op is oracle-checked, queries.py): all moments are
    EXACT integers — x as epoch-µs offsets from ``TREND_EPOCH_US``, y
    quantized to micro-units from the double's SHORTEST decimal repr
    with halves rounded away from zero (the rule DuckDB's
    double->DECIMAL cast applies, including on exact .5 ties like
    0.0078125 -> 7812.5; parity pinned in tests/test_quantize.py) —
    and only
    the final divisions run in IEEE double, one op per output. The same
    formula in DuckDB HUGEINT arithmetic is bit-equal. Exact summation is
    also numerically stronger than the float closed form (no
    cancellation); the integer loop costs more CPU per row than a numpy
    float fit — the price of a reproducible fit, still Arrow-batched and
    fully distributed.
    """
    from decimal import ROUND_HALF_UP, Decimal

    import pandas as pd

    def _fit(pdf: pd.DataFrame) -> pd.DataFrame:
        xs = [int(v) - TREND_EPOCH_US
              for v in pdf[x_col].astype("datetime64[us]").astype("int64")]
        ys = [int((Decimal(repr(float(v))).scaleb(6))
                  .to_integral_value(rounding=ROUND_HALF_UP))
              for v in pdf[y_col]]
        n = len(xs)
        sx = sum(xs); sy = sum(ys)
        sxy = sum(x * y for x, y in zip(xs, ys))
        sxx = sum(x * x for x in xs); syy = sum(y * y for y in ys)
        a = n * sxy - sx * sy
        b = n * sxx - sx * sx
        c = n * syy - sy * sy
        slope = 0.0 if (n < 2 or b == 0) else float(a) / float(b)
        intercept = 0.0 if n == 0 else float(sy) / float(n * 1_000_000)
        r2 = (0.0 if (n < 2 or b == 0 or c == 0)
              else (float(a) * float(a)) / (float(b) * float(c)))
        return pd.DataFrame({key: [pdf[key].iloc[0]], "n": [n],
                             "slope": [slope], "intercept": [intercept],
                             "r2": [r2]})

    return (events.select(key, x_col, y_col)
            .filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
            .groupBy(key)
            .applyInPandas(_fit, schema=f"{key} BIGINT, n BIGINT, "
                                        "slope DOUBLE, intercept DOUBLE, "
                                        "r2 DOUBLE"))
