"""Dataset split / sampling invariants (operators/sampling.py).

The oracle-checkable mod-split is covered by test_oracle
(split_train_counts); these tests pin the properties the hash paths
promise: determinism across runs and partitionings, exhaustive +
disjoint assignment, proportion bounds, and nested-sample
composability.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from imp_etl_spark.operators.sampling import (
    sample_by_hash,
    split_by_hash,
    stratified_sample,
)
from imp_etl_spark.sources.parquet import read_table
from tests.conftest import ORACLE_SF_DIR

SPLITS = {"train": 0.8, "val": 0.1, "test": 0.1}


@pytest.fixture(scope="module")
def docs(spark):
    return read_table(spark, ORACLE_SF_DIR, "documents")


def test_split_exhaustive_and_deterministic(spark, docs):
    out = split_by_hash(docs, "doc_id", SPLITS)
    assert out.filter(F.col("split").isNull()).count() == 0
    a = {(r["doc_id"], r["split"]) for r in out.select("doc_id", "split").collect()}
    # re-run under a different partitioning: identical assignment
    out2 = split_by_hash(docs.repartition(7), "doc_id", SPLITS)
    b = {(r["doc_id"], r["split"]) for r in out2.select("doc_id", "split").collect()}
    assert a == b
    # every doc appears exactly once (assignment, not sampling)
    assert len(a) == docs.count()


def test_split_proportions(spark, docs):
    n = docs.count()
    counts = dict(
        (r["split"], r["c"])
        for r in split_by_hash(docs, "doc_id", SPLITS)
        .groupBy("split").agg(F.count(F.lit(1)).alias("c")).collect())
    assert set(counts) == set(SPLITS)
    for name, frac in SPLITS.items():
        # binomial tolerance: +/- 5 sigma on n Bernoulli(frac)
        sigma = (n * frac * (1 - frac)) ** 0.5
        assert abs(counts[name] - n * frac) <= 5 * sigma, (name, counts)


def test_split_md5_mode_exhaustive_disjoint_and_proportional(spark, docs):
    """The md5 compat hash must give the same split GUARANTEES as
    xxhash64: every row assigned exactly once, deterministic across
    runs, proportions near the weights (it is a different hash, so the
    actual assignment differs — only the structure is shared)."""
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = split_by_hash(docs, "doc_id", w, hash_fn="md5")
    n = docs.count()
    counts = {r["split"]: r["count"]
              for r in out.groupBy("split").count().collect()}
    assert sum(counts.values()) == n
    assert abs(counts["train"] / n - 0.8) < 0.05
    again = split_by_hash(docs, "doc_id", w, hash_fn="md5")
    assert out.exceptAll(again).count() == 0


def test_split_salt_derives_independent_folds(spark, docs):
    a = split_by_hash(docs, "doc_id", SPLITS, salt="exp1")
    b = split_by_hash(docs, "doc_id", SPLITS, salt="exp2")
    joined = a.select("doc_id", F.col("split").alias("sa")).join(
        b.select("doc_id", F.col("split").alias("sb")), "doc_id")
    differing = joined.filter(F.col("sa") != F.col("sb")).count()
    assert differing > 0  # different salts really re-deal the folds


def test_sample_by_hash_nested_and_stable(spark, docs):
    s10 = {r["doc_id"] for r in sample_by_hash(docs, "doc_id", 0.10).collect()}
    s50 = {r["doc_id"] for r in sample_by_hash(docs, "doc_id", 0.50).collect()}
    assert s10 <= s50  # smaller fraction is a strict subset (same salt)
    again = {r["doc_id"] for r in
             sample_by_hash(docs.repartition(5), "doc_id", 0.10).collect()}
    assert s10 == again  # partitioning-independent
    n = docs.count()
    assert abs(len(s50) - 0.5 * n) <= 5 * (n * 0.25) ** 0.5


def test_stratified_sample_rates(spark, docs):
    fracs = {"en": 0.2, "de": 1.0, "fr": 1.0, "es": 1.0, "zh": 1.0}
    base = dict((r["lang"], r["c"]) for r in docs.groupBy("lang")
                .agg(F.count(F.lit(1)).alias("c")).collect())
    got = dict((r["lang"], r["c"]) for r in
               stratified_sample(docs, "lang", fracs).groupBy("lang")
               .agg(F.count(F.lit(1)).alias("c")).collect())
    # fraction-1.0 strata come through whole; the downsampled stratum
    # lands within 5 sigma of its target rate
    for lang in ("de", "fr", "es", "zh"):
        assert got[lang] == base[lang]
    n_en = base["en"]
    sigma = (n_en * 0.2 * 0.8) ** 0.5
    assert abs(got.get("en", 0) - 0.2 * n_en) <= 5 * sigma


def test_mixture_sample_hash_rates_and_nesting(spark, docs):
    from imp_etl_spark.operators.sampling import mixture_sample

    base = dict((r["lang"], r["c"]) for r in docs.groupBy("lang")
                .agg(F.count(F.lit(1)).alias("c")).collect())
    fr = {"en": 0.3, "de": 1.0}
    kept = mixture_sample(docs, "lang", "doc_id", fr)
    got = dict((r["lang"], r["c"]) for r in kept.groupBy("lang")
               .agg(F.count(F.lit(1)).alias("c")).collect())
    assert set(got) <= {"en", "de"}  # unnamed strata dropped
    assert got["de"] == base["de"]
    sigma = (base["en"] * 0.3 * 0.7) ** 0.5
    assert abs(got.get("en", 0) - 0.3 * base["en"]) <= 5 * sigma
    # nesting: a lower en-rate keeps a subset of the higher rate
    low = {r["doc_id"] for r in mixture_sample(
        docs, "lang", "doc_id", {"en": 0.1}).select("doc_id").collect()}
    high = {r["doc_id"] for r in mixture_sample(
        docs, "lang", "doc_id", {"en": 0.3}).select("doc_id").collect()}
    assert low <= high


def test_pack_greedy_invariants(spark, docs):
    """Packing invariants: deterministic across invocations; ids within a
    (shard, bin) are contiguous in shard order (greedy fill); a bin's
    weight minus its LAST row stays under budget (a row only spills into
    the next bin once the running weight crosses the boundary)."""
    from imp_etl_spark.functions.text import token_count
    from imp_etl_spark.operators.sampling import pack_greedy

    d = docs.select("doc_id", token_count("text").alias("n_tok"))
    packed = pack_greedy(d, "doc_id", "n_tok", budget=512, shards=8)
    rows = packed.orderBy("shard", "doc_id").collect()
    again = pack_greedy(d, "doc_id", "n_tok", budget=512, shards=8) \
        .orderBy("shard", "doc_id").collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in again]

    by_bin: dict[tuple[int, int], list] = {}
    for r in rows:
        assert r["shard"] == r["doc_id"] % 8
        by_bin.setdefault((r["shard"], r["bin"]), []).append(r)
    for (_shard, _bin), members in by_bin.items():
        total = sum(m["n_tok"] for m in members)
        assert total - members[-1]["n_tok"] < 512
    # bins are consecutive per shard starting at 0
    for s in range(8):
        bins = sorted(b for (sh, b) in by_bin if sh == s)
        assert bins == list(range(len(bins)))


def test_weighted_sample_monotone_and_bounds(spark, docs):
    from imp_etl_spark.operators.sampling import weighted_sample

    zero = weighted_sample(docs, "doc_id", F.lit(0.0))
    assert zero.count() == 0
    full = weighted_sample(docs, "doc_id", F.lit(1.0))
    assert full.count() == docs.count()
    w = F.least(F.lit(1.0), F.col("n_chars") / F.lit(800.0))
    kept = {r["doc_id"] for r in
            weighted_sample(docs, "doc_id", w).select("doc_id").collect()}
    # halving every weight keeps a strict subset (same hash draw,
    # lower threshold) and is partitioning-independent
    kept_half = {r["doc_id"] for r in
                 weighted_sample(docs.repartition(5), "doc_id", w / 2)
                 .select("doc_id").collect()}
    assert kept_half <= kept
    assert len(kept_half) < len(kept)


def test_passage_dedup_first_occurrence(spark):
    from imp_etl_spark.operators.dedup import passage_dedup

    shared = " ".join(f"tok{i}" for i in range(16))  # one exact passage
    rows = [
        (1, shared + " tail one"),
        (2, shared + " tail two"),
        (3, "unique words only in doc three " + " ".join(
            f"w{i}" for i in range(10))),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = passage_dedup(df, "text", "doc_id", k=16).collect()
    got = {(r["doc_id"], r["passage_idx"]): r["passage"] for r in out}
    # the shared passage survives once, at its smallest (doc, idx)
    assert sum(1 for p in got.values() if p == shared) == 1
    assert (1, 0) in got and got[(1, 0)] == shared
    # doc 2's copy of the shared passage is gone, its tail survives
    assert (2, 0) not in got and (2, 1) in got
    # empty doc contributes nothing
    assert not any(d == 4 for d, _ in got)


def test_mixture_sample_empty_fractions_applies_default(spark, docs):
    """ADVICE r5: an empty fractions dict is the 'keep everything until
    configured' call — default=1.0 keeps the whole frame, default=0.0
    drops it, and a partial rate still samples (no AttributeError)."""
    from imp_etl_spark.operators.sampling import mixture_sample

    n = docs.count()
    assert mixture_sample(docs, "lang", "doc_id", {}, default=1.0) \
        .count() == n
    assert mixture_sample(docs, "lang", "doc_id", {}, default=0.0) \
        .count() == 0
    kept = mixture_sample(docs, "lang", "doc_id", {}, default=0.5).count()
    sigma = (n * 0.25) ** 0.5
    assert abs(kept - 0.5 * n) <= 5 * sigma
