"""IVF ANN quality gates: recall vs the exact brute-force baseline, and
determinism (sampled seeds + Lloyd steps contain no RNG state)."""

from __future__ import annotations

from pyspark.sql import functions as F

from imp_etl_spark.operators import similarity
from imp_etl_spark.sources.parquet import read_table
from tests.conftest import ORACLE_SF_DIR


def _sets(df):
    return {(r.query_id, r.vec_id) for r in df.collect()}


def test_ivf_recall_and_determinism(spark):
    emb = read_table(spark, ORACLE_SF_DIR, "embeddings")
    q = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding")
    exact = _sets(similarity.brute_force_topk(emb, q, k=10))

    kwargs = dict(k=10, nlist=10, nprobe=3, kmeans_iters=2)
    approx = _sets(similarity.ivf_topk(emb, q, **kwargs))
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"IVF recall@10 degraded: {recall}"
    # every query answered with a full top-k (lists are big enough)
    assert len(approx) == len(exact)

    again = _sets(similarity.ivf_topk(emb, q, **kwargs))
    assert again == approx


def test_ivf_nprobe_full_scan_is_exact(spark):
    """Probing every list must recover the exact answer — IVF's only
    loss is unprobed lists, not the within-list scoring."""
    emb = read_table(spark, ORACLE_SF_DIR, "embeddings").limit(120)
    q = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding")
    exact = _sets(similarity.brute_force_topk(emb, q, k=5))
    full = _sets(similarity.ivf_topk(
        emb, q, k=5, nlist=6, nprobe=6, kmeans_iters=1))
    assert full == exact


def test_srp_multiprobe_improves_recall_and_stays_subset_exact(spark):
    """probe_bits=1 candidates strictly include the probe_bits=0 ones
    (exact bucket is always probed), so multi-probe recall can only go
    up; and on planted near-identical duplicates it must recover
    >=90% of pairs while single-probe is theory-bound near 0.89."""
    emb = read_table(spark, ORACLE_SF_DIR, "embeddings")
    q = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding")
    exact = similarity.brute_force_topk(emb, q, k=10)
    r0 = similarity.recall_at_k(
        similarity.srp_bucket_topk(emb, q, k=10, dim=64, planes=6), exact)
    r1 = similarity.recall_at_k(
        similarity.srp_bucket_topk(emb, q, k=10, dim=64, planes=6,
                                   probe_bits=1), exact)
    assert r1 >= r0

    # planted duplicates: one slightly perturbed copy per vector
    planted = emb.select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: x + 0.01 * F.when(
                F.xxhash64(i).bitwiseAND(F.lit(1)) == 1, 1.0).otherwise(-1.0)
        ).alias("embedding"))
    corpus2 = emb.select("vec_id", "embedding").unionByName(planted)
    n = emb.count()
    got = similarity.embedding_near_dup_pairs(
        corpus2, 0.99, dim=64, planes=8, probe_bits=1)
    hits = got.filter(F.col("id_b") - F.col("id_a") == 1_000_000).count()
    assert hits / n >= 0.90, f"multi-probe planted recall {hits/n}"


def test_srp_bare_default_recall(spark):
    """A bare srp_bucket_topk() call must be useful out of the box: the
    defaults (planes=4, probe_bits=1) pin recall@10 >= 0.5 at fixture
    scale (the old defaults planes=8/probe_bits=0 measured 0.12)."""
    emb = read_table(spark, ORACLE_SF_DIR, "embeddings")
    q = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding")
    exact = similarity.brute_force_topk(emb, q, k=10)
    r = similarity.recall_at_k(
        similarity.srp_bucket_topk(emb, q, k=10, dim=64), exact)
    assert r >= 0.5, f"bare-call SRP recall@10 {r}"


def test_simhash_near_dup_matches_brute_force(spark):
    """Pigeonhole banding (bands > max_hamming) must find EXACTLY the
    brute-force hamming-ball pairs — no recall loss, no extras."""
    from imp_etl_spark.functions.hashing import hamming64, simhash
    from imp_etl_spark.functions.text import tokens
    from imp_etl_spark.operators.dedup import simhash_near_dup_pairs
    from imp_etl_spark.sources.parquet import read_table
    from tests.conftest import SF_DIR
    from pyspark.sql import functions as F

    docs = read_table(spark, SF_DIR, "documents").limit(150)
    got = sorted(
        tuple(r) for r in simhash_near_dup_pairs(
            docs, "text", "doc_id", bits=48, max_hamming=6, bands=8
        ).collect()
    )

    sigs = docs.select(
        "doc_id", simhash(tokens(F.col("text")), bits=48).alias("sig"))
    a, b = sigs.alias("a"), sigs.alias("b")
    want = sorted(
        tuple(r) for r in a.crossJoin(b)
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("id_a"),
                F.col("b.doc_id").alias("id_b"),
                hamming64(F.col("a.sig"), F.col("b.sig")).alias("hamming"))
        .filter(F.col("hamming") <= 6).collect()
    )
    assert got == want and len(want) > 0


def test_ivf_indexed_matches_inline_and_prunes_partitions(spark, tmp_path):
    """The persisted IVF index must return the same top-k as the inline
    variant, and the probe scan must prune to the probed list
    partitions (PartitionFilters at the scan)."""
    from imp_etl_spark.operators.similarity import (
        build_ivf_index,
        ivf_topk,
        ivf_topk_indexed,
    )
    from imp_etl_spark.sources.parquet import read_table
    from tests.conftest import SF_DIR
    from pyspark.sql import functions as F

    emb = read_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding")

    path = str(tmp_path / "ivf")
    build_ivf_index(emb, path, nlist=8, kmeans_iters=2)
    got = ivf_topk_indexed(spark, path, queries, k=5, nprobe=2)
    want = ivf_topk(emb, queries, k=5, nlist=8, nprobe=2, kmeans_iters=2)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))

    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "__list" in plan.split("PartitionFilters:")[1].split("]")[0]


def test_arrow_udf_cosine_matches_builtin(spark):
    """The Arrow-UDF escape hatch must agree with the codegen builtin
    (double-precision fold vs numpy matmul: equal to ~1e-12 relative)."""
    from imp_etl_spark.functions.vector import cosine, cosine_arrow_udf
    from imp_etl_spark.sources.parquet import read_table
    from tests.conftest import SF_DIR
    from pyspark.sql import functions as F

    emb = read_table(spark, SF_DIR, "embeddings").limit(100)
    qvec = [float(x) for x in emb.first()["embedding"]]
    udf = cosine_arrow_udf(qvec)
    got = emb.select(
        "vec_id",
        cosine(F.col("embedding"),
               F.array(*[F.lit(x) for x in qvec])).alias("builtin"),
        udf(F.col("embedding")).alias("arrow"),
    ).collect()
    assert len(got) == 100
    for r in got:
        assert abs(r["builtin"] - r["arrow"]) <= 1e-9 * max(1.0, abs(r["builtin"]))


def test_ivf_index_append_matches_full_assignment(spark, tmp_path):
    """Incremental ingest: appending a second batch to a persisted IVF
    index must yield EXACTLY the results of assigning the full corpus
    to the same frozen centroids — and the probe scan must still
    partition-prune."""
    from imp_etl_spark.operators.similarity import (
        _probe_and_rank, assign_ivf_lists, build_ivf_index,
        ivf_index_append, ivf_topk_indexed)

    emb = spark.read.parquet(f"{ORACLE_SF_DIR}/embeddings.parquet")
    first = emb.filter(F.col("vec_id") % 2 == 0)
    rest = emb.filter(F.col("vec_id") % 2 == 1)
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding")
    path = str(tmp_path / "ivf")

    cents = build_ivf_index(first, path, nlist=8, kmeans_iters=2)
    cents2 = ivf_index_append(spark, path, rest)
    assert cents2 == cents  # frozen centroids

    got = ivf_topk_indexed(spark, path, queries, k=5, nprobe=4)
    expected = _probe_and_rank(
        assign_ivf_lists(emb, cents), queries, cents, 5, 4,
        "vec_id", "embedding", "query_id")
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, expected.collect()))
    # index now holds the full corpus
    assert spark.read.parquet(path).count() == emb.count()


def test_ivf_index_schema_uniform_with_extra_corpus_columns(spark, tmp_path):
    """Regression: a corpus carrying payload columns must not leak them
    into the persisted index — build projects to (id, vec, list), so
    appended batches share ONE physical parquet schema (mixed footers
    under a partition dir resolve nondeterministically) and probes read
    no payload bytes."""
    from imp_etl_spark.operators.similarity import (
        build_ivf_index, ivf_index_append, ivf_topk_indexed)

    emb = spark.read.parquet(f"{ORACLE_SF_DIR}/embeddings.parquet")
    wide = emb.withColumn("payload", F.concat_ws("-", "vec_id", "vec_id"))
    first = wide.filter(F.col("vec_id") % 2 == 0)
    rest = wide.filter(F.col("vec_id") % 2 == 1).select(
        "vec_id", "embedding")  # append path takes (id, vec) only
    path = str(tmp_path / "ivf_wide")

    build_ivf_index(first, path, nlist=8, kmeans_iters=2)
    ivf_index_append(spark, path, rest)
    resident = spark.read.parquet(path)
    assert set(resident.columns) == {"vec_id", "embedding", "__list"}
    assert resident.count() == wide.count()

    queries = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding")
    got = ivf_topk_indexed(spark, path, queries, k=5, nprobe=4)
    assert got.count() == 4 * 5
