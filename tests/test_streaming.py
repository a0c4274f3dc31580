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


# ---------------------------------------------------------------------------
# Batch-replay differentials (VERDICT r6 item 8): the streaming data
# entries recomputed with an equivalent BATCH plan over the same fixture,
# asserted equal row-for-row — so the check covers the streaming
# EXECUTION (epoch boundaries, cross-epoch state, watermark bookkeeping),
# not just the drained output the SQL oracle sees. Each test forces
# multiple micro-batches (maxFilesPerTrigger=1 / staged waves) and splits
# the interesting collisions ACROSS epochs.
# ---------------------------------------------------------------------------


def test_batch_replay_dedup_across_epochs(spark, tmp_path):
    """Duplicates delivered in LATER micro-batches than their originals
    (one file per epoch) must still dedup against cross-epoch state:
    streaming output == batch DISTINCT over the union of all waves."""
    from imp_etl_spark.streaming.etl_stream import dedup_stream

    src = str(tmp_path / "src")
    ev = read_table(spark, SF_DIR, "events").select(
        "event_id", "ts", "user_id", "event_type", "value")
    # wave 1: even events; wave 2: odd events PLUS exact copies of the
    # evens (duplicates straddle the epoch boundary); wave 3: copies of
    # everything (a full replay wave)
    ev.filter(F.col("event_id") % 2 == 0).coalesce(1).write.mode(
        "overwrite").parquet(src)
    ev.filter(F.col("event_id") % 2 == 1).unionByName(
        ev.filter(F.col("event_id") % 2 == 0)).coalesce(1).write.mode(
        "append").parquet(src)
    ev.coalesce(1).write.mode("append").parquet(src)

    schema = spark.read.parquet(src).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = (dedup_stream(stream, ["event_id"], "ts", within="3650 days")
         .writeStream.format("memory").queryName("replay_dedup")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    assert q.awaitTermination(300)

    got = sorted(map(tuple, spark.sql(
        "SELECT event_id, user_id, event_type FROM replay_dedup").collect()))
    want = sorted(map(tuple, spark.read.parquet(src)
                      .select("event_id", "user_id", "event_type")
                      .distinct().collect()))
    assert got == want and len(got) == ev.count()


def test_batch_replay_interval_join_across_epochs(spark, tmp_path):
    """Stream-stream interval join with the matching sides arriving in
    DIFFERENT micro-batches (clicks-file then purchases-file, one file
    per trigger): the buffered join state must still produce exactly the
    batch join's answer under a watermark that outlives the fixture."""
    from imp_etl_spark.streaming.etl_stream import interval_join_stream

    src = str(tmp_path / "src")
    ev = read_table(spark, SF_DIR, "events").select(
        "event_id", "ts", "user_id", "event_type", "value")
    ev.filter(F.col("event_type") == "click").coalesce(1).write.mode(
        "overwrite").parquet(src)
    ev.filter(F.col("event_type") == "purchase").coalesce(1).write.mode(
        "append").parquet(src)

    schema = spark.read.parquet(src).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    purchases = stream.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts")
    clicks = stream.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "value")
    joined = interval_join_stream(purchases, clicks, on="user_id",
                                  left_ts="ts", right_ts="ts",
                                  lower="interval 10 minutes",
                                  watermark="3650 days")
    out = joined.select("event_id",
                        F.col("__l_ts").alias("p_ts"),
                        F.col("__r_ts").alias("c_ts"), "value")
    q = (out.writeStream.format("memory").queryName("replay_ij")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    assert q.awaitTermination(300)

    got = sorted(map(tuple, spark.sql(
        "SELECT * FROM replay_ij").collect()))
    # equivalent batch plan: plain join, same condition, same casts
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", F.col("user_id").alias("p_user"),
        F.col("ts").cast("timestamp").alias("p_ts"))
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").cast("timestamp").alias("c_ts"), "value")
    want = sorted(map(tuple, p.join(
        c, (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") > F.col("p_ts") - F.expr("interval 10 minutes"))
        & (F.col("c_ts") <= F.col("p_ts")))
        .select("event_id", "p_ts", "c_ts", "value").collect()))
    assert got == want and len(got) > 0


def test_batch_replay_incremental_view_three_waves(spark, tmp_path):
    """The incremental materialized view maintained across THREE arrival
    waves (each its own streaming drain, re-merging partials into the
    snapshot sink) must equal the one-shot batch aggregation over the
    full orders table — the monoid-merge invariant under a different
    arrival split than the registered query exercises (mod-3, so most
    custkeys are touched by multiple epochs and their partials merge
    repeatedly)."""
    from imp_etl_spark.plans.upsert import read_target
    from imp_etl_spark.streaming.incremental_view import (
        run_incremental_view,
    )

    src, view, ck = (str(tmp_path / d) for d in ("src", "view", "ck"))
    orders = read_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
    stream = None
    for wave in range(3):
        orders.filter(F.col("o_orderkey") % 3 == wave).drop("o_orderkey") \
            .write.parquet(f"{src}/w{wave}", mode="overwrite")
        if stream is None:  # source path must exist at declaration
            stream = spark.readStream.schema(
                "o_custkey BIGINT, o_totalprice DOUBLE, "
                "o_orderdate TIMESTAMP_NTZ"
            ).option("recursiveFileLookup", "true").parquet(src)
        q = run_incremental_view(spark, stream, view, ["o_custkey"],
                                 "o_totalprice", "o_orderdate", ck)
        assert q.awaitTermination(300), f"wave {wave} did not drain"

    got = sorted(map(tuple, read_target(spark, view).select(
        "o_custkey", "n_rows",
        F.col("value_sum").cast("double").alias("value_sum"),
        "first_seen", "last_seen").collect()))
    want = sorted(map(tuple, orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double").alias("value_sum"),
        F.min("o_orderdate").alias("first_seen"),
        F.max("o_orderdate").alias("last_seen")).collect()))
    assert got == want and len(got) > 0
