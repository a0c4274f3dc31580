"""Event-time windowed aggregation (SURVEY.md §2.8 north-star ops).

The reference's only 'streaming' is a cron-clocked micro-batch loop with
no event time at all (ordering by synthetic log_id — ST1-ST6). The
``events`` fixture adds real event time, so the engine provides the full
windowed-aggregation family. Each builder works on *both* batch and
streaming frames (``F.window``/``F.session_window`` are mode-agnostic);
``with_watermark`` only applies to streams.

Scale notes: tumbling/sliding windows are pure groupBy — partial
aggregation applies, and the shuffle carries (window, key) groups.
Sliding windows multiply rows by window/slide; keep the ratio small or
pre-bucket by slide then roll up (two-level aggregation) at extreme
rates. Session windows in streaming keep per-key state — the watermark
bounds state size; without it state grows forever.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tumbling(df: DataFrame, ts_col: str, duration: str,
             keys: Sequence[str] = (), aggs: Sequence[Column] = (),
             watermark: str | None = None) -> DataFrame:
    """Tumbling event-time windows: one row per (window, keys)."""
    if watermark and df.isStreaming:
        # watermarks require TimestampType; NTZ event time is cast here
        # (identity under the engine's pinned UTC session timezone)
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, duration), *keys)
        .agg(*aggs)
        .select(F.col("window.start").alias("window_start"),
                F.col("window.end").alias("window_end"), *keys,
                *[F.col(_agg_name(a)) for a in aggs])
    )


def _agg_name(c: Column) -> str:
    # aggregates passed here must be aliased; extract the alias
    s = c._jc.toString()
    if " AS " in s:
        return s.rsplit(" AS ", 1)[-1].strip("`")
    raise ValueError(f"aggregate column must be aliased: {s}")


def sliding(df: DataFrame, ts_col: str, duration: str, slide: str,
            keys: Sequence[str] = (), aggs: Sequence[Column] = (),
            watermark: str | None = None) -> DataFrame:
    """Sliding windows (duration, slide): each event lands in
    duration/slide windows."""
    if watermark and df.isStreaming:
        # watermarks require TimestampType; NTZ event time is cast here
        # (identity under the engine's pinned UTC session timezone)
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, duration, slide), *keys)
        .agg(*aggs)
        .select(F.col("window.start").alias("window_start"),
                F.col("window.end").alias("window_end"), *keys,
                *[F.col(_agg_name(a)) for a in aggs])
    )


def session(df: DataFrame, ts_col: str, gap: str,
            keys: Sequence[str] = (), aggs: Sequence[Column] = (),
            watermark: str | None = None) -> DataFrame:
    """Session windows: events within ``gap`` of each other merge; the
    window closes ``gap`` after the last event (Spark semantics:
    [first_event, last_event + gap))."""
    if watermark and df.isStreaming:
        # watermarks require TimestampType; NTZ event time is cast here
        # (identity under the engine's pinned UTC session timezone)
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.session_window(ts_col, gap), *keys)
        .agg(*aggs)
        .select(F.col("session_window.start").alias("session_start"),
                F.col("session_window.end").alias("session_end"), *keys,
                *[F.col(_agg_name(a)) for a in aggs])
    )


def stream_events(spark, src_dir: str, schema) -> DataFrame:
    """Structured-Streaming file source over an events directory (used by
    tests with per-file micro-batches)."""
    return spark.readStream.schema(schema).parquet(src_dir)
