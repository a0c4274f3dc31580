"""Adversarial-embedding sweep: the ANN tier over vectors a real corpus
serves — zero-norm (encoder padding), NaN/Inf components, magnitudes
beyond the exact-quantization domain, null vectors, tiny corpora with
fewer rows than nlist. Crash-freedom contract: every similarity query
executes; undefined similarities surface as NULL (try_divide cosine),
never as a job abort.

Found (round 5): ANSI DIVIDE_BY_ZERO from cosine on zero-norm vectors
taking down 4 of 5 ANN queries; decimal(18,6) overflow aborting IVF
training on |x| >= 1e12 components; and an IndexError when the corpus
seeds fewer centroids than nlist.
"""

from __future__ import annotations

import os
import re

import pytest

from imp_etl_spark import schemas
from imp_etl_spark.queries import REGISTRY

DIM = 64

EMB_QUERIES = [n for n, (_f, s) in REGISTRY.items()
               if s is not None and re.search(r"\bembeddings\b", s.lower())]


@pytest.fixture(scope="module")
def adv_emb_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("sf_embadv")
    rows = [
        (1, [0.0] * DIM, 0),                   # zero vector (norm 0)
        (2, [1.0] * DIM, 1),
        (3, [-1.0] * DIM, 0),
        (4, [float("nan")] * DIM, 1),          # NaN components
        (5, [float("inf")] * DIM, 0),          # Inf components
        (6, [1e38] * DIM, 1),                  # beyond decimal(18,6)
        (7, [1e-38] * DIM, 0),                 # denormal-adjacent
        (8, [0.0] * (DIM - 1) + [1.0], 1),     # near-zero support
        (9, [0.5] * DIM, 0),
        (10, [0.5] * DIM, 1),                  # duplicate of 9
        (11, None, 0),                         # null embedding
    ]
    spark.createDataFrame(rows, schemas.FIXTURE_TABLES["embeddings"]) \
        .write.mode("overwrite").parquet(
            os.path.join(str(d), "embeddings.parquet"))
    return str(d)


def test_embedding_queries_discovered():
    for must in ("ann_cosine_topk", "srp_bucket_topk", "ivf_cosine_topk",
                 "ivf_indexed_topk", "embedding_near_dup"):
        assert must in EMB_QUERIES


@pytest.mark.parametrize("name", EMB_QUERIES)
def test_ann_queries_survive_adversarial_vectors(spark, adv_emb_dir, name):
    fn, _ = REGISTRY[name]
    df = fn(spark, adv_emb_dir)
    df.write.format("noop").mode("overwrite").save()


def test_cosine_of_zero_vector_is_null(spark):
    from pyspark.sql import functions as F

    from imp_etl_spark.functions.vector import cosine

    df = spark.createDataFrame(
        [([0.0, 0.0], [1.0, 2.0]), ([1.0, 0.0], [1.0, 2.0])],
        "a array<double>, b array<double>")
    got = [r[0] for r in
           df.select(cosine(F.col("a"), F.col("b"))).collect()]
    assert got[0] is None            # undefined, not an abort
    assert abs(got[1] - 1.0 / 5.0 ** 0.5) < 1e-12  # real pairs unchanged


def test_ivf_trains_when_corpus_smaller_than_nlist(spark):
    from imp_etl_spark.operators.similarity import train_ivf_centroids

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [1.0, 1.0])],
        "vec_id bigint, embedding array<float>")
    cents = train_ivf_centroids(df, nlist=16, kmeans_iters=2)
    assert 1 <= len(cents) <= 3
