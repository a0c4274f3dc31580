"""Property-based tests (hypothesis): operator invariants that must hold
for ANY input, not just the fixtures — the dedup/pagination/salting
contracts the pipeline builds on."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

KEYS = st.integers(min_value=0, max_value=5)
VALS = st.integers(min_value=-1000, max_value=1000)
ROWS = st.lists(st.tuples(KEYS, VALS, st.integers(0, 50)), min_size=1,
                max_size=40)

_PROPS = settings(max_examples=8, deadline=None,
                  suppress_health_check=[HealthCheck.function_scoped_fixture])


@given(rows=ROWS)
@_PROPS
def test_latest_per_key_one_row_per_key_and_max_order(spark, rows):
    from imp_etl_spark.operators.dedup import latest_per_key

    df = spark.createDataFrame(rows, "k INT, v INT, ord INT")
    out = latest_per_key(df, ["k"], ["ord"], desc=True).collect()
    keys = [r["k"] for r in out]
    assert len(keys) == len(set(keys)) == df.select("k").distinct().count()
    max_ord = {r["k"]: r["mo"] for r in
               df.groupBy("k").agg(F.max("ord").alias("mo")).collect()}
    for r in out:
        assert r["ord"] == max_ord[r["k"]]


@given(rows=ROWS)
@_PROPS
def test_salted_agg_equals_plain_agg(spark, rows):
    from imp_etl_spark.operators.skew import salted_agg

    df = spark.createDataFrame(rows, "k INT, v INT, ord INT")
    got = {
        r["k"]: (r["s"], r["c"]) for r in salted_agg(
            df, ["k"],
            partial=[F.sum("v").alias("s"), F.count(F.lit(1)).alias("c")],
            final=[F.sum("s").alias("s"), F.sum("c").alias("c")],
            buckets=4).collect()
    }
    want = {
        r["k"]: (r["s"], r["c"]) for r in df.groupBy("k").agg(
            F.sum("v").alias("s"), F.count(F.lit(1)).alias("c")).collect()
    }
    assert got == want


@given(rows=st.lists(st.integers(0, 10_000), min_size=1, max_size=60,
                     unique=True),
       offset=st.integers(0, 10), limit=st.integers(1, 20))
@_PROPS
def test_paginate_equals_sorted_slice(spark, rows, offset, limit):
    from imp_etl_spark.operators.window import paginate

    df = spark.createDataFrame([(x,) for x in rows], "k INT")
    got = sorted(r["k"] for r in paginate(df, "k", offset, limit).collect())
    assert got == sorted(rows)[offset:offset + limit]


@given(rows=st.lists(
    st.tuples(st.integers(0, 3), st.text(min_size=0, max_size=12)),
    min_size=1, max_size=30))
@_PROPS
def test_merge_preview_batch_beats_target(spark, rows):
    """After MERGE semantics, every batch key carries the batch value and
    all other target keys survive untouched."""
    from imp_etl_spark.plans.upsert import merge_preview

    target = spark.createDataFrame(
        [(k, "t", 0) for k in range(4)], "k INT, v STRING, ord INT")
    batch = spark.createDataFrame(
        [(k, "b:" + v, i + 1) for i, (k, v) in enumerate(rows)],
        "k INT, v STRING, ord INT")
    out = {r["k"]: r["v"] for r in
           merge_preview(batch, target, ["k"], "ord").collect()}
    batch_keys = {k for k, _ in rows}
    assert set(out) == set(range(4)) | batch_keys
    for k in range(4):
        if k in batch_keys:
            assert out[k].startswith("b:")
        else:
            assert out[k] == "t"


TEXTS = st.lists(st.text(alphabet="ab c", min_size=1, max_size=600),
                 min_size=1, max_size=10)


@given(texts=TEXTS)
@_PROPS
def test_chunking_covers_text_exactly(spark, texts):
    """chunk_array invariants for ANY text: stitching chunks back
    together (dropping each chunk's leading overlap) reconstructs the
    document exactly; every chunk is <= size; short docs give 1 chunk."""
    from imp_etl_spark.functions.text import chunk_array

    size, overlap, step = 16, 4, 12
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "id LONG, text STRING")
    rows = (df.select("id", "text",
                      chunk_array("text", size, overlap).alias("chunks"))
            .collect())
    for r in rows:
        chunks = r["chunks"]
        assert all(len(c) <= size for c in chunks)
        if len(r["text"]) <= size:
            assert chunks == [r["text"]]
        rebuilt = chunks[0] + "".join(c[overlap:] for c in chunks[1:])
        assert rebuilt == r["text"]


# --- sink state machine: merge/replay/compact vs a dict model -------------

_OPS = st.lists(
    st.one_of(
        # merge: batch of (key, value) pairs with an order stamp
        st.tuples(st.just("merge"),
                  st.lists(st.tuples(KEYS, VALS), min_size=1, max_size=6)),
        # stamped merge: same, plus an epoch number (replays included —
        # the strategy may repeat an epoch with a DIFFERENT batch, which
        # must be ignored)
        st.tuples(st.just("stamped"),
                  st.lists(st.tuples(KEYS, VALS), min_size=1, max_size=6),
                  st.integers(0, 3)),
        st.tuples(st.just("compact")),
    ),
    min_size=1, max_size=6)


@given(ops=_OPS)
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_merge_upsert_state_machine_matches_model(spark, tmp_path_factory,
                                                  ops):
    """The sink against a dict model under arbitrary op sequences:
    unstamped merges always apply (last-writer-wins per batch order);
    stamped merges apply only when the epoch exceeds the recorded one
    (at-least-once replays — possibly with different payloads — are
    no-ops); compaction never changes contents. After every op the
    table equals the model exactly."""
    from imp_etl_spark.plans import upsert as U

    path = str(tmp_path_factory.mktemp("sm")) + "/t"
    model: dict[int, int] = {}
    applied_epoch = -1
    seq = 0
    for op in ops:
        if op[0] == "merge":
            batch = [(k, v, seq + i) for i, (k, v) in enumerate(op[1])]
            seq += len(batch)
            df = spark.createDataFrame(batch, "k INT, v INT, ord INT")
            U.merge_upsert(spark, path, df, ["k"], "ord", n_buckets=4)
            for k, v, _ in batch:          # batch order = LWW order
                model[k] = v
        elif op[0] == "stamped":
            batch = [(k, v, seq + i) for i, (k, v) in enumerate(op[1])]
            seq += len(batch)
            df = spark.createDataFrame(batch, "k INT, v INT, ord INT")
            U.merge_upsert(spark, path, df, ["k"], "ord", n_buckets=4,
                           txn_app_id="sm", txn_version=op[2])
            if op[2] > applied_epoch:
                applied_epoch = op[2]
                for k, v, _ in batch:
                    model[k] = v
        else:
            if U._latest_version(path) is not None:
                U.compact_snapshot(spark, path)
        if U._latest_version(path) is None:
            assert not model
            continue
        got = {r["k"]: r["v"]
               for r in U.read_target(spark, path).collect()}
        assert got == model


def test_results_invariant_to_shuffle_partitioning(spark):
    """SEMANTICS.md's numeric-domain claim is that exact-decimal
    aggregation makes sums and moments bit-reproducible "across engines
    and partitionings" — the DuckDB differential checks the engine
    axis, but always at one partitioning, so the partitioning axis was
    asserted, never tested. This runs the float-sensitive tiers (second
    moments, EWMA recurrence, prefix-sum shares, quantile ranks,
    z-scores, time-weighted averages, histogram buckets, quality
    scores) at shuffle.partitions=5 and =47 and requires IDENTICAL
    results: a double-typed partial aggregate would make the partial
    grouping (and thus the addition order) leak into the answer,
    exactly what the DECIMAL(38) convention exists to prevent. The
    dedup tier is deliberately absent — its memoized shared artifacts
    would serve one partitioning's result to the other and mask the
    signal.
    """
    from imp_etl_spark.queries import REGISTRY
    from tests.conftest import SF_DIR

    names = ["agg_stats_moments", "ewma_user_value",
             "parts_pareto_cumshare", "rfm_customer_segments",
             "outlier_events_zscore", "twap_user_value",
             "events_value_histogram", "doc_quality"]

    def key(row):
        return tuple((v is None, str(v)) for v in row)

    def run_all():
        return {n: sorted(map(tuple, REGISTRY[n][0](
            spark, SF_DIR).collect()), key=key) for n in names}

    # AQE partition coalescing (on in session.py) can merge the
    # 5-partition and 47-partition shuffles toward similar final
    # groupings on a small fixture, which would weaken the very signal
    # this test exists to exercise — hold it off for both runs so the
    # aggregations genuinely group under different partitionings.
    old = spark.conf.get("spark.sql.shuffle.partitions")
    old_coalesce = spark.conf.get(
        "spark.sql.adaptive.coalescePartitions.enabled")
    try:
        spark.conf.set(
            "spark.sql.adaptive.coalescePartitions.enabled", "false")
        spark.conf.set("spark.sql.shuffle.partitions", "5")
        at5 = run_all()
        spark.conf.set("spark.sql.shuffle.partitions", "47")
        at47 = run_all()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
        spark.conf.set(
            "spark.sql.adaptive.coalescePartitions.enabled", old_coalesce)
    for n in names:
        assert at5[n] == at47[n], (
            f"{n}: result depends on shuffle partitioning "
            f"({len(at5[n])} vs {len(at47[n])} rows; first diff: "
            f"{next(((a, b) for a, b in zip(at5[n], at47[n]) if a != b), None)})")
