"""Structured-Streaming execution tests: the same window builders that the
batch oracle checks, now on a real stream with watermarks; plus the
log-file source (S10/S11/T9)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from imp_etl_spark.schemas import EVENTS
from imp_etl_spark.sources.parquet import read_table
from imp_etl_spark.streaming.log_stream import (
    parse_log_lines,
    read_log_batch,
    tail_last,
)
from imp_etl_spark.streaming.windows import session, stream_events, tumbling
from tests.conftest import SF_DIR


def _prepare_stream_dir(spark, tmp_path) -> str:
    src = str(tmp_path / "events_stream")
    # two files -> two micro-batches; drop props (ns-timestamp already
    # normalized by read_table, so rewrite as NTZ parquet)
    ev = read_table(spark, SF_DIR, "events")
    ev.filter(F.col("event_id") % 2 == 0).coalesce(1).write.mode(
        "overwrite").parquet(src)
    ev.filter(F.col("event_id") % 2 == 1).coalesce(1).write.mode(
        "append").parquet(src)
    return src


def test_stream_tumbling_matches_batch(spark, tmp_path):
    src = _prepare_stream_dir(spark, tmp_path)
    schema = spark.read.parquet(src).schema
    stream = stream_events(spark, src, schema)
    assert stream.isStreaming

    agg = tumbling(stream, "ts", "1 hour", keys=["event_type"],
                   aggs=[F.count(F.lit(1)).alias("cnt")],
                   watermark="2 hours")
    q = (agg.writeStream.format("memory").queryName("tumbling_test")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = {(r["window_start"], r["event_type"]): r["cnt"]
           for r in spark.sql("select * from tumbling_test").collect()}
    batch = tumbling(read_table(spark, SF_DIR, "events"), "ts", "1 hour",
                     keys=["event_type"],
                     aggs=[F.count(F.lit(1)).alias("cnt")])
    want = {(r["window_start"], r["event_type"]): r["cnt"]
            for r in batch.collect()}
    assert got == want


def test_stream_session_window_runs(spark, tmp_path):
    src = _prepare_stream_dir(spark, tmp_path)
    schema = spark.read.parquet(src).schema
    stream = stream_events(spark, src, schema)
    agg = session(stream, "ts", "10 minutes", keys=["user_id"],
                  aggs=[F.count(F.lit(1)).alias("cnt")],
                  watermark="1 hour")
    q = (agg.writeStream.format("memory").queryName("session_test")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)
    n = spark.sql("select count(*) c from session_test").collect()[0]["c"]
    assert n > 0


def test_stateful_running_user_stats(spark, tmp_path):
    """applyInPandasWithState accumulates across micro-batches: the final
    per-user state must equal the batch groupBy over the same data."""
    from imp_etl_spark.streaming.stateful import running_user_stats

    src = _prepare_stream_dir(spark, tmp_path)
    schema = spark.read.parquet(src).schema
    stream = stream_events(spark, src, schema)

    out = running_user_stats(stream)
    q = (out.writeStream.format("memory").queryName("user_stats")
         .outputMode("update")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    # update mode appends one row per (user, batch); last one wins
    got = {
        r["user_id"]: (r["events"], r["value_sum_micro"])
        for r in spark.sql("""
            SELECT user_id, events, value_sum_micro FROM (
              SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY events DESC) AS rn FROM user_stats
            ) WHERE rn = 1
        """).collect()
    }
    # exact-integer state: equality against the decimal batch sum is
    # EXACT, not approximate (see streaming/stateful.py)
    batch = (
        read_table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("events"),
             (F.sum(F.col("value").cast("decimal(18,6)")) * 1_000_000)
             .cast("long").alias("value_sum_micro"))
    )
    want = {r["user_id"]: (r["events"], r["value_sum_micro"] or 0)
            for r in batch.collect()}
    assert got == want


def test_log_parse_batch_and_stream(spark, tmp_path):
    logdir = tmp_path / "logs"
    os.makedirs(logdir)
    (logdir / "etl.log").write_text(
        "[2025-05-07T14:40:00.970+08:00] ETL Process started\n"
        "\n"
        "no-timestamp line\n"
        "[2025-05-07T14:55:07.166+08:00] ETL Process done\n"
    )
    parsed = read_log_batch(spark, str(logdir / "etl.log"))
    rows = {r["message"]: r["ts_str"] for r in parsed.collect()}
    # blank line dropped (P8); [ts] split (T9); fallback NULL ts
    assert rows == {
        "ETL Process started": "2025-05-07T14:40:00.970+08:00",
        "no-timestamp line": None,
        "ETL Process done": "2025-05-07T14:55:07.166+08:00",
    }
    top = tail_last(parsed, 1).collect()
    assert top[0]["message"] == "ETL Process done"

    # streaming variant (S11): same parse over readStream.text
    stream = parse_log_lines(spark.readStream.text(str(logdir)))
    assert stream.isStreaming
    q = (stream.writeStream.format("memory").queryName("log_tail")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(60)
    assert spark.sql("select count(*) c from log_tail").collect()[0]["c"] == 3


def test_per_group_trend_matches_builtin_closed_form(spark):
    """applyInPandas grouped-map fit == the covar/var closed form."""
    from imp_etl_spark.operators.agg import per_group_trend

    ev = read_table(spark, SF_DIR, "events")
    got = {r["user_id"]: r for r in per_group_trend(ev).collect()}

    xs = (F.col("ts").cast("timestamp").cast("double"))
    want = {
        r["user_id"]: r for r in ev.groupBy("user_id").agg(
            (F.covar_pop(xs, F.col("value"))
             / F.var_pop(xs)).alias("slope"),
            F.count(F.lit(1)).alias("n")).collect()
    }
    assert set(got) == set(want)
    for k, w in want.items():
        assert got[k]["n"] == w["n"]
        if w["slope"] is not None:
            assert abs(got[k]["slope"] - w["slope"]) <= 1e-6 * max(
                1.0, abs(w["slope"]))
