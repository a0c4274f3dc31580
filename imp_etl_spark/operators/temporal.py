"""Temporal join operators: as-of join and banded range join.

The reference has no temporal joins (SURVEY.md §2.3 "not present"); these
are north-star operators for the events fixture, built as compositions of
DataFrame ops — no UDFs, no per-key cartesian products.

Scale design (the whole point of these formulations):

- ``asof_join`` uses the union + ordered-window trick: tag build rows 0
  and probe rows 1, union them, and run ``last(col, ignorenulls=True)``
  over ``partitionBy(key).orderBy(ts, side).rowsBetween(unboundedPreceding,
  currentRow)``. ONE shuffle on the key, linear work per partition — the
  naive ``l JOIN r ON l.key = r.key AND r.ts <= l.ts`` + max-per-probe
  plan explodes to |l_key|×|r_key| intermediate rows per key and dies on
  hot keys at 100 TB.
- ``range_join_binned`` converts the inequality join into an equi join on
  (key, time_bin): each probe row explodes to the (few) bins its
  admissible window overlaps, each build row lands in exactly one bin,
  then the exact predicate refines post-join. With bin width >= window
  width a probe hits <= 2 bins, so the blow-up factor is bounded and the
  shuffle is a plain hash exchange Catalyst can plan (vs a
  BroadcastNestedLoopJoin for a raw inequality condition).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    on: Sequence[str] | str,
    probe_ts: str,
    build_ts: str,
    build_cols: Mapping[str, str],
    tolerance: str | None = None,
) -> DataFrame:
    """Backward as-of join: for each probe row, attach the columns of the
    latest build row with the same key and ``build_ts <= probe_ts``
    (inclusive). Probe rows with no admissible build row keep nulls
    (left-join semantics, matching DuckDB's ``ASOF LEFT JOIN``).

    ``build_cols`` maps build column -> output name (output names must not
    collide with probe columns). ``tolerance`` (an INTERVAL string like
    ``'10 minutes'``) nulls out matches older than ``probe_ts - tolerance``.

    Build rows are deduplicated to the last one per (key, ts) — ordered by
    the first ``build_cols`` key — so the match is deterministic even with
    timestamp collisions.
    """
    on = [on] if isinstance(on, str) else list(on)
    out_names = list(build_cols.values())
    tiebreak = next(iter(build_cols))

    # temporal contract: an untimed build row can never be "the latest
    # at-or-before" anything — without this filter it sorts nulls-first
    # into the running-last window and leaks into every later probe row
    # (SQL's ts >= NULL comparison matches nothing). Untimed PROBE rows
    # keep left-join semantics: they sort first, find no prior build
    # row, and surface with null build columns — same as the oracle.
    # Null-KEY build rows match nothing either (equi-join semantics:
    # NULL = NULL is not a match; the window partition would otherwise
    # treat NULL as a real key and fill null-key probe rows).
    build = build.where(F.col(build_ts).isNotNull())
    for k in on:
        build = build.where(F.col(k).isNotNull())
    w_dedup = Window.partitionBy(*on, build_ts).orderBy(F.col(tiebreak).desc())
    b = (
        build.withColumn("__rn", F.row_number().over(w_dedup))
        .filter(F.col("__rn") == 1)
        .select(
            *on,
            F.col(build_ts).alias("__ts"),
            *[F.col(src).alias(dst) for src, dst in build_cols.items()],
        )
        .withColumn("__side", F.lit(0))
    )
    p = probe.withColumn("__ts", F.col(probe_ts)).withColumn("__side", F.lit(1))
    unioned = p.unionByName(b, allowMissingColumns=True)

    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # ROW-ATOMIC fill: carry the whole matched build row as one struct.
    # A per-column last(ignorenulls) would forward-fill each output
    # column independently, stitching a frankenrow from DIFFERENT build
    # rows whenever the latest one carries a NULL field (e.g. the
    # matched click's value is NULL but an older click's 0.0 leaks in).
    # The struct is non-null exactly on build rows, so ignorenulls
    # skips probe rows but never reaches past the latest build row.
    m = F.last(
        F.when(F.col("__side") == 0,
               F.struct(F.col("__ts").alias("__m_ts"),
                        *[F.col(c) for c in out_names])),
        ignorenulls=True,
    ).over(w).alias("__m")
    filled = unioned.select("*", m)
    result = filled.filter(F.col("__side") == 1)

    keep: Column = F.col("__m").isNotNull()
    if tolerance is not None:
        keep = keep & (F.col("__m")["__m_ts"]
                       >= F.col("__ts") - F.expr(f"INTERVAL {tolerance}"))
    out_cols = [c for c in probe.columns]
    matched = [
        F.when(keep, F.col("__m")[c]).alias(c) for c in out_names
    ]
    return result.select(*out_cols, *matched)


def range_join_binned(
    probe: DataFrame,
    build: DataFrame,
    on: Sequence[str] | str,
    probe_ts: str,
    build_ts: str,
    lower: str,
    upper: str,
    bin_width_s: int,
) -> DataFrame:
    """Inner join of probe×build rows with equal keys and
    ``probe_ts + lower <= build_ts <= probe_ts + upper`` (both inclusive;
    intervals may be negative, e.g. ``lower='-10 minutes', upper='0
    seconds'`` = "build within the 10 minutes before probe").

    Returns probe columns + build columns suffixed ``_r`` on collision.
    ``bin_width_s`` (seconds) should be >= the window span so each probe
    row explodes to at most 2 bins.
    """
    on = [on] if isinstance(on, str) else list(on)
    lo = F.expr(f"INTERVAL {lower}")
    hi = F.expr(f"INTERVAL {upper}")
    bin_sec = F.lit(int(bin_width_s)).cast("long")

    def _epoch_s(c: Column) -> Column:
        # NTZ -> LTZ is identity under the engine's pinned-UTC sessions
        # (session.py); unix_seconds then yields epoch seconds.
        return F.unix_seconds(c.cast("timestamp"))

    p = probe.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(_epoch_s(F.col(probe_ts) + lo) / bin_sec),
                F.floor(_epoch_s(F.col(probe_ts) + hi) / bin_sec),
            )
        ),
    )
    collide = set(probe.columns)
    b = build.select(
        *[F.col(c).alias(f"{c}_r" if c in collide else c) for c in build.columns]
    )
    b_ts = f"{build_ts}_r" if build_ts in collide else build_ts
    b_on = [(f"{c}_r" if c in collide else c) for c in on]
    b = b.withColumn("__bin", F.floor(_epoch_s(F.col(b_ts)) / bin_sec))

    joined = p.join(
        b,
        on=[p["__bin"] == b["__bin"]]
        + [p[k] == b[bk] for k, bk in zip(on, b_on)],
        how="inner",
    ).drop(b["__bin"]).drop(p["__bin"])
    refined = joined.filter(
        (F.col(b_ts) >= F.col(probe_ts) + lo)
        & (F.col(b_ts) <= F.col(probe_ts) + hi)
    )
    return refined.drop(*b_on)
