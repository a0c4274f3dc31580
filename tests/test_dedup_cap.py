"""Degenerate-bucket cap for the banded LSH self-joins.

A boilerplate bucket (n identical docs in one band bucket) must yield
O(n) star pairs against the surviving representative — never the O(n²)
all-pairs blowup AQE cannot prevent — and must report the cap hit via
the ``observe()`` side-output. Below the cap, behavior is unchanged.
"""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F

from imp_etl_spark.operators.dedup import (
    minhash_lsh_candidates,
    simhash_near_dup_pairs,
)
from imp_etl_spark.sources.parquet import read_table
from tests.conftest import ORACLE_SF_DIR


def test_minhash_cap_bounds_identical_doc_bucket(spark):
    n = 10_000
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("the same boilerplate text repeated in every single "
              "document of this degenerate corpus").alias("text"))
    obs = Observation("minhash_cap")
    pairs = minhash_lsh_candidates(docs, "text", "doc_id",
                                   max_bucket=256, observation=obs)
    rows = pairs.collect()
    # star pairs only: linear in bucket size, one pair per non-min doc
    assert len(rows) == n - 1
    # every member links to the representative that survives dedup
    assert all(r.id_a == 0 for r in rows)
    m = obs.get
    assert m["capped_buckets"] == 4, m  # one capped bucket per band
    assert m["capped_rows"] == 4 * n, m


def test_simhash_cap_bounds_identical_doc_bucket(spark):
    n = 2_000
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("identical boilerplate body for the simhash cap").alias(
            "text"))
    obs = Observation("simhash_cap")
    pairs = simhash_near_dup_pairs(docs, "text", "doc_id", bits=48,
                                   max_hamming=6, bands=8,
                                   max_bucket=128, observation=obs)
    rows = pairs.collect()
    assert len(rows) == n - 1
    assert all(r.id_a == 0 and r.hamming == 0 for r in rows)
    assert obs.get["capped_buckets"] == 8  # all 8 blocks of the one sig


def test_cap_inactive_below_threshold_matches_uncapped(spark):
    docs = read_table(spark, ORACLE_SF_DIR, "documents")
    got = {tuple(r) for r in minhash_lsh_candidates(
        docs, max_bucket=256).collect()}
    want = {tuple(r) for r in minhash_lsh_candidates(
        docs, max_bucket=1 << 30).collect()}
    assert got == want and len(want) > 0


def test_simhash_cap_inactive_matches_uncapped(spark):
    docs = read_table(spark, ORACLE_SF_DIR, "documents").limit(150)
    kwargs = dict(bits=48, max_hamming=6, bands=8, hash_fn="md5")
    got = {tuple(r) for r in simhash_near_dup_pairs(
        docs, max_bucket=256, **kwargs).collect()}
    want = {tuple(r) for r in simhash_near_dup_pairs(
        docs, max_bucket=1 << 30, **kwargs).collect()}
    assert got == want


def test_cross_corpus_candidates_finds_planted_dup(spark):
    from imp_etl_spark.operators.dedup import (
        cross_corpus_candidates,
        minhash_stacked,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    ref_rows = [(i, base + f" ref tail {i}") for i in range(10)]
    # new doc 100 duplicates ref doc 3's text exactly; 101 is unrelated
    new_rows = [(100, ref_rows[3][1]),
                (101, "totally different words nothing shared here at all")]
    ref = spark.createDataFrame(ref_rows, ["doc_id", "text"])
    new = spark.createDataFrame(new_rows, ["doc_id", "text"])
    cand = cross_corpus_candidates(minhash_stacked(new),
                                   minhash_stacked(ref))
    got = {(r["id_new"], r["id_ref"]) for r in cand.collect()}
    assert (100, 3) in got
    assert not any(n == 101 for n, _ in got)


def test_cross_corpus_cap_collapse_keeps_match(spark):
    from imp_etl_spark.operators.dedup import (
        cross_corpus_candidates,
        minhash_stacked,
    )

    boiler = "the same boilerplate sentence repeated on every page"
    ref = spark.createDataFrame([(i, boiler) for i in range(20)],
                                ["doc_id", "text"])
    new = spark.createDataFrame([(500, boiler)], ["doc_id", "text"])
    cand = cross_corpus_candidates(minhash_stacked(new),
                                   minhash_stacked(ref), max_bucket=4)
    got = {(r["id_new"], r["id_ref"]) for r in cand.collect()}
    # over-cap ref bucket collapses to its min-id representative — the
    # new doc still matches, and ONLY via that representative
    assert got == {(500, 0)}


def test_capped_star_fallback_preserves_clusters_and_survivors(spark):
    """The experiment finding (SCALING.md, high-dup section) as a
    permanent guard: on an over-cap NEAR-identical group (perturbed
    variants, not byte-identical), the capped pipeline loses pair
    IDENTITIES but never cluster MEMBERSHIP — connected components and
    the survivor set match the uncapped ground truth exactly."""
    from imp_etl_spark.operators.dedup import ngram_jaccard_pairs
    from imp_etl_spark.operators.graph import cluster_assignments

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi")
    rows = [(i, base + f" variant {i}") for i in range(40)]  # one group
    rows += [(100 + i, f"unrelated content number {i} with words "
              f"{'x' * (i % 7)} {'y' * (i % 5)} padd{i}")
             for i in range(20)]  # singletons
    docs = spark.createDataFrame(rows, ["doc_id", "text"])

    def clusters(max_bucket):
        obs = Observation(f"cap_{max_bucket}")
        cands = minhash_lsh_candidates(docs, "text", "doc_id",
                                       max_bucket=max_bucket,
                                       observation=obs)
        ver = ngram_jaccard_pairs(docs, "text", "doc_id", n=5,
                                  threshold=0.5, candidates=cands)
        cl = {(r["doc_id"], r["cluster_id"])
              for r in cluster_assignments(
                  docs.select("doc_id"), ver, id_col="doc_id").collect()}
        return cl, obs.get

    capped, m = clusters(16)
    uncapped, m_un = clusters(1 << 30)
    assert m["capped_buckets"] > 0        # the cap actually engaged
    assert m_un["capped_buckets"] == 0
    assert capped == uncapped             # identical clusters
    # and therefore identical survivor (cluster-min) sets
    surv = lambda cl: {min(d for d, c in cl if c == cid)
                       for cid in {c for _, c in cl}}
    assert surv(capped) == surv(uncapped)


def test_minhash_index_roundtrip_matches_inline(spark, tmp_path):
    """build_minhash_index -> read_minhash_index reproduces the inline
    minhash_stacked frame bit-for-bit, and candidates off the persisted
    table equal candidates off the inline pass (the shared-artifact
    contract: consumers must not be able to tell the difference)."""
    from imp_etl_spark.operators.dedup import (
        build_minhash_index,
        minhash_candidates_from_stacked,
        minhash_lsh_candidates,
        minhash_stacked,
        read_minhash_index,
    )

    rows = [(i, f"the quick brown fox number {i % 7} jumps over the "
             f"lazy dog {i % 3} again and again tail {i % 5}")
            for i in range(60)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    path = str(tmp_path / "mh_index")
    params = build_minhash_index(docs, path, "text", "doc_id",
                                 shingle_k=3, num_hashes=12, bands=4)
    assert params["bands"] == 4
    stacked, got_params = read_minhash_index(spark, path)
    assert got_params == params
    inline = minhash_stacked(docs, "text", "doc_id", shingle_k=3,
                             num_hashes=12, bands=4)
    assert (sorted(map(tuple, stacked.collect()))
            == sorted(map(tuple, inline.collect())))
    got_pairs = sorted(map(tuple, minhash_candidates_from_stacked(
        stacked, "doc_id").collect()))
    want_pairs = sorted(map(tuple, minhash_lsh_candidates(
        docs, "text", "doc_id", shingle_k=3, num_hashes=12,
        bands=4).collect()))
    assert got_pairs == want_pairs


def test_minhash_index_append_equals_rebuild(spark, tmp_path):
    """Appending a crawl batch must leave the index bit-identical to a
    full rebuild over the union (signatures are stateless per-doc
    functions), and the appended table must serve cross-corpus
    candidate matching unchanged."""
    from imp_etl_spark.operators.dedup import (
        build_minhash_index,
        minhash_index_append,
        minhash_stacked,
        read_minhash_index,
    )

    def corpus(lo, hi):
        return spark.createDataFrame(
            [(i, f"shared boilerplate header words {i % 4} "
              f"then body text number {i} with tail {i % 6}")
             for i in range(lo, hi)], ["doc_id", "text"])

    path = str(tmp_path / "mh_index")
    build_minhash_index(corpus(0, 40), path, "text", "doc_id",
                        shingle_k=3, num_hashes=12, bands=4)
    params = minhash_index_append(spark, path, corpus(40, 60))
    assert params["shingle_k"] == 3
    stacked, _ = read_minhash_index(spark, path)
    rebuilt = minhash_stacked(corpus(0, 60), "text", "doc_id",
                              shingle_k=3, num_hashes=12, bands=4)
    assert (sorted(map(tuple, stacked.collect()))
            == sorted(map(tuple, rebuilt.collect())))


def test_shared_minhash_index_invalidates_on_corpus_rewrite(spark, tmp_path):
    """A rewritten documents table at the same path must invalidate the
    process-level index memo (fresh signatures, no stale reads) and
    remove the superseded temp index dir."""
    import os
    import shutil
    import time

    import imp_etl_spark.queries  # noqa: F401 — registry first (import order)
    from imp_etl_spark import queries_llm as ql
    from tests.conftest import SF_DIR

    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    shutil.copy(os.path.join(SF_DIR, "documents.parquet"), sf)
    ql._shared_minhash_stacked(spark, sf).count()
    abspath = os.path.abspath(sf)
    old_dir = os.path.dirname(
        [v for k, v in ql._MINHASH_IDX.items() if k[0] == abspath][0])
    time.sleep(1.1)
    os.utime(os.path.join(sf, "documents.parquet"))  # simulate rewrite
    ql._shared_minhash_stacked(spark, sf).count()
    assert not os.path.exists(old_dir)
    assert sum(1 for k in ql._MINHASH_IDX if k[0] == abspath) == 1


def test_pairwise_verify_equals_posting_join_on_all_pairs(spark):
    """Round-6 guard for the pairwise verify path: with candidates =
    EVERY (a < b) pair, the pairwise array_intersect scorer must emit
    exactly the posting-join path's output (same pairs, same jaccard
    values) — including docs with shared grams below threshold, empty
    docs, and exact duplicates."""
    import random

    from imp_etl_spark.operators.dedup import ngram_jaccard_pairs

    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(30)]
    rows = [(i, " ".join(rng.choice(vocab)
                         for _ in range(rng.randint(0, 40))))
            for i in range(60)]
    rows += [(100, rows[5][1]), (101, ""), (102, None)]  # dup/empty/null
    docs = spark.createDataFrame(rows, ["doc_id", "text"])

    ids = docs.select(F.col("doc_id").alias("id_a"))
    all_pairs = (ids.crossJoin(docs.select(F.col("doc_id")
                                           .alias("id_b")))
                 .filter(F.col("id_a") < F.col("id_b")))
    via_pairs = {(r["id_a"], r["id_b"]): r["jaccard"]
                 for r in ngram_jaccard_pairs(
                     docs, "text", "doc_id", n=3, threshold=0.3,
                     candidates=all_pairs).collect()}
    via_postings = {(r["id_a"], r["id_b"]): r["jaccard"]
                    for r in ngram_jaccard_pairs(
                        docs, "text", "doc_id", n=3,
                        threshold=0.3).collect()}
    assert via_pairs == via_postings
    assert via_pairs  # non-vacuous: the random corpus has near-dups


def test_whitespace_only_docs_carry_no_signature(spark):
    """ADVICE r6 (high): trim() strips only ASCII space while tokens()
    splits on \\s+, so a tab/newline-only doc used to pass the cheap
    zero-shingle filter, reach minhash_int with zero shingles, and emit
    the constant sentinel signature [p]*12 — band-colliding every
    contentless doc with every other. The rlike(\\S) predicate must drop
    the FULL whitespace class, matching the oracle's UNNEST (no hash
    rows for an empty shingle list)."""
    from imp_etl_spark.operators.dedup import (
        minhash_lsh_candidates,
        minhash_stacked,
    )

    rows = [(1, "\t"), (2, "\n"), (3, "\r\n"), (4, " \t\n\r "),
            (5, "\f"), (6, ""), (7, None), (8, " "),
            (9, "real words appear only here"),
            (10, "\t real words around tabs \n")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    stacked = minhash_stacked(docs, "text", "doc_id", shingle_k=3)
    sigged = {r["doc_id"] for r in stacked.collect()}
    assert sigged == {9, 10}  # every whitespace-only/empty/null doc dropped
    # and therefore no two contentless docs ever pair with each other
    pairs = minhash_lsh_candidates(docs, "text", "doc_id",
                                   shingle_k=3).collect()
    assert pairs == []


def test_minhash_int_self_defends_on_degenerate_input(spark):
    """ADVICE r6 (low x2): minhash_int must yield NULL for an EMPTY
    hashes array (not the valid-looking [p]*n seed) independent of any
    caller filter, and must raise loudly when num_hashes exceeds the
    permutation table instead of NULL-padding the signature tail into a
    shared constant."""
    import pytest

    from imp_etl_spark.functions.hashing import MINHASH_A, minhash_int

    df = spark.createDataFrame(
        [(1, []), (2, [7, 11])],
        "id long, hs array<long>",
    ).select("id", minhash_int(F.col("hs"), 4).alias("sig"))
    got = {r["id"]: r["sig"] for r in df.collect()}
    assert got[1] is None          # empty input -> NULL, not the seed
    assert len(got[2]) == 4 and all(v is not None for v in got[2])

    with pytest.raises(ValueError, match="permutation table"):
        minhash_int(F.col("hs"), len(MINHASH_A) + 1)


def test_three_epoch_incremental_crawl_equals_batch_first_wins(
        spark, tmp_path):
    """Multi-epoch incremental-crawl dedup is EXACTLY equivalent to a
    from-scratch batch "first occurrence wins" pass — pinned over three
    crawl waves with planted intra-wave, cross-wave and CHAINED
    duplicates.

    The equivalence theorem (and the policy it forces): at each epoch
    the FULL wave — survivors and dropped docs alike — is appended to
    the reference signature index. Then "new doc d is dropped iff some
    earlier-seen doc verified-matches d" is the same predicate on both
    paths, because (a) append == rebuild (signatures are stateless
    per-doc functions, pinned above), (b) the batch LSH self-join and
    the incremental cross/intra joins share the identical (band, sig)
    bucket-match condition below the cap, and (c) pairwise Jaccard
    verification scores a pair identically whatever frame it rides in.
    The chained-duplicate case (A in wave 1; B = A with one word
    changed, wave 2, dropped; C = B with ANOTHER word changed, wave 3 —
    so C matches B above threshold but A only below it) is the reason
    the dropped-doc-still-indexed policy is load-bearing: an index of
    survivors only would let C resurface, and this test would fail.
    """
    from imp_etl_spark.operators.dedup import (
        build_minhash_index,
        cross_corpus_candidates,
        minhash_index_append,
        minhash_lsh_candidates,
        minhash_stacked,
        ngram_jaccard_pairs,
        read_minhash_index,
    )

    # 30-word docs: 28 grams at n=3 -> one-word change ~0.81 Jaccard,
    # two-word change ~0.65 (threshold 0.7 splits them with margin)
    def doc(i, mutate=()):
        words = [f"t{i}x{j}" for j in range(30)]
        for pos, tok in mutate:
            words[pos] = tok
        return " ".join(words)

    a_text = doc(0)
    b_text = doc(0, [(8, "mutB")])            # 1 word off A  -> ~0.81
    c_text = doc(0, [(8, "mutB"), (20, "mutC")])  # 1 off B, 2 off A -> ~0.65 vs A
    waves = {
        1: [(1, a_text), (2, doc(2)), (3, doc(2)),   # 3 = intra-wave exact dup
            (4, doc(4))],
        2: [(11, b_text),                            # chained near-dup of A
            (12, doc(4)),                            # cross-wave exact dup
            (13, doc(13))],
        3: [(21, c_text),                            # matches B (dropped), not A
            (22, doc(22)), (23, doc(13, [(5, "zz")]))],  # near-dup of 13
    }
    K = dict(shingle_k=3, num_hashes=12, bands=4)
    V = dict(n=3, threshold=0.7)
    all_rows = [r for w in waves.values() for r in w]
    union = spark.createDataFrame(all_rows, ["doc_id", "text"])

    # sanity: the chain behaves as constructed
    jac = {(r.id_a, r.id_b): r.jaccard for r in ngram_jaccard_pairs(
        union, n=3, threshold=0.0).collect()}
    assert jac[(1, 11)] >= 0.7 and jac[(11, 21)] >= 0.7
    assert jac.get((1, 21), 0.0) < 0.7

    # ---- batch path: first occurrence (lowest doc_id == arrival) wins
    cand = minhash_lsh_candidates(union, **K)
    ver = ngram_jaccard_pairs(union, candidates=cand, **V)
    batch_dropped = {r.id_b for r in ver.collect()}  # id_a < id_b
    batch_survivors = sorted(
        i for i, _ in all_rows if i not in batch_dropped)

    # ---- incremental path: per-epoch intra self-dedup + cross match,
    # then FULL-wave append
    path = str(tmp_path / "crawl_index")
    inc_survivors = []
    for epoch in (1, 2, 3):
        wave = spark.createDataFrame(waves[epoch], ["doc_id", "text"])
        dropped = set()
        if epoch == 1:
            build_minhash_index(wave, path, "text", "doc_id", **K)
        else:
            ref_stacked, _ = read_minhash_index(spark, path)
            new_stacked = minhash_stacked(wave, "text", "doc_id", **K)
            cross = cross_corpus_candidates(new_stacked, ref_stacked)
            cross_pairs = cross.select(
                F.least("id_new", "id_ref").alias("id_a"),
                F.greatest("id_new", "id_ref").alias("id_b")).distinct()
            cross_ver = ngram_jaccard_pairs(
                union, candidates=cross_pairs, **V)
            # ids are assigned in arrival order, so id_b is the new doc
            dropped |= {r.id_b for r in cross_ver.collect()}
            minhash_index_append(spark, path, wave)
        intra = minhash_lsh_candidates(wave, **K)
        intra_ver = ngram_jaccard_pairs(union, candidates=intra, **V)
        dropped |= {r.id_b for r in intra_ver.collect()}
        inc_survivors.extend(
            i for i, _ in waves[epoch] if i not in dropped)

    assert sorted(inc_survivors) == batch_survivors
    # the planted structure actually fired: chained C (21), exact dups
    # (3, 12), near-dup 23 all dropped; uniques survive
    assert batch_survivors == [1, 2, 4, 13, 22]
