"""LLM-data-pipeline queries (registered into queries.REGISTRY).

Portability strategy per operator:
- text stats / lang-ID / fingerprint / jaccard: pure integer or
  same-order double arithmetic -> bit-exact DuckDB oracles.
- MinHash-LSH: md5-hex permutation hashes (functions/hashing.py) -> the
  *entire* LSH pipeline (shingle -> signature -> band -> bucket join) is
  reproduced in SQL and must match pair-for-pair.
- SimHash: md5 compat hash (``simhash(..., hash_fn='md5')``) -> per-doc
  signatures AND the banded hamming pair query are reproduced in SQL.
- SRP-bucketed ANN / embedding near-dup: hyperplane components are a
  Python-side ±1 literal matrix (similarity.srp_plane_components) shared
  by the Spark plan and the generated SQL -> bucket assignment, probing
  and cosine re-rank are all oracle-checked (the fold order of every
  double sum matches list_reduce's sequential chain).
- IVF ANN: the Lloyd update step uses EXACT integer micro-unit sums
  (shared double->decimal(18,6) quantization, tests/test_quantize.py)
  and md5-ordered seeds, so training itself is reproduced in SQL
  (_ivf_sql) -> the full train/assign/probe/re-rank is oracle-checked.
- approx sketches / libm transcendentals: rows-only by nature (the
  only two left).
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from imp_etl_spark.functions.hashing import minhash_hex, shingles, simhash
from imp_etl_spark.functions.text import (
    LANG_MARKERS,
    bpe_ish_tokens,
    lang_id,
    mean_token_len,
    punct_ratio,
    quality_score,
    stopword_ratio,
    token_count,
    tokens,
)
from imp_etl_spark.functions.vector import cosine
from imp_etl_spark.operators import similarity
from imp_etl_spark.registry import register
from imp_etl_spark.sources.parquet import read_table

from imp_etl_spark.queries_sqlfrag import DUCK_TOKS as _DUCK_TOKS
from imp_etl_spark.queries_sqlfrag import lang_sql as _lang_sql

# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------

_STOPWORDS_SQL = "['the','a','an','and','or','of','to','in','on','for','with','is','are','was','be','this','that','it','as','at','by']"

@register("text_stats", f"""
WITH toks AS (
  SELECT doc_id, n_chars, {_DUCK_TOKS} AS t, text FROM documents
)
SELECT doc_id, n_chars,
       len(t) AS n_tokens,
       COALESCE(
         CAST(len(list_filter(t, x -> list_contains({_STOPWORDS_SQL}, x))) AS DOUBLE)
           / len(t), 0.0) AS stopword_ratio,
       COALESCE(
         CAST(length(regexp_replace(text, '[^.,;:!?''"()\\[\\]{{}}-]', '', 'g')) AS DOUBLE)
           / length(text), 0.0) AS punct_ratio,
       COALESCE(
         CAST(list_aggregate(list_transform(t, x -> length(x)), 'sum') AS DOUBLE)
           / len(t), 0.0) AS mean_token_len
FROM toks
""")
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", "n_chars",
        token_count("text").alias("n_tokens"),
        stopword_ratio("text").alias("stopword_ratio"),
        punct_ratio("text").alias("punct_ratio"),
        mean_token_len("text").alias("mean_token_len"),
    )


@register("lang_id_docs", _lang_sql())
def lang_id_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language ID next to the fixture's lang label."""
    docs = read_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.col("lang").alias("lang_label"),
        lang_id("text").alias("lang_pred"),
    )


@register("fingerprint_docs", f"""
WITH toks AS (SELECT doc_id, {_DUCK_TOKS} AS t FROM documents)
SELECT doc_id,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
           list_transform(t, x -> ('0x' || substr(md5(x), 1, 8))::BIGINT)),
         (a, b) -> (a * 31 + b) % 2147483647) AS fp
FROM toks
""")
def fingerprint_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling polynomial document fingerprint, md5-portable: identical
    fold in both engines (mod 2^31-1 keeps every step in exact i64)."""
    docs = read_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    fp = F.aggregate(
        toks, F.lit(0).cast("long"),
        lambda acc, t: F.pmod(
            acc * F.lit(31).cast("long")
            + F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long"),
            F.lit(2147483647).cast("long")),
    )
    return docs.select("doc_id", fp.alias("fp"))


@register("explode_tokens", f"""
WITH toks AS (
  SELECT doc_id, {_DUCK_TOKS} AS t FROM documents WHERE doc_id % 50 = 0
), z AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(t) + 1),
                               i -> {{'pos': i - 1, 'tok': t[i]}})) AS s
  FROM toks
)
SELECT doc_id, s.pos AS pos, s.tok AS tok FROM z
""")
def explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral-view positional explode (array -> rows). Narrow op: no
    shuffle; row count fans out by tokens-per-doc."""
    docs = read_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 50 == 0)
    return (
        docs.select("doc_id", F.posexplode(tokens(F.col("text"))))
        .select("doc_id", F.col("pos").cast("long").alias("pos"),
                F.col("col").alias("tok"))
    )


@register("word_counts_top50", f"""
WITH toks AS (SELECT {_DUCK_TOKS} AS t FROM documents)
SELECT tok, COUNT(*) AS cnt FROM (SELECT unnest(t) AS tok FROM toks)
GROUP BY tok
ORDER BY cnt DESC, tok ASC
LIMIT 50
""")
def word_counts_top50(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical explode -> groupBy -> top-k corpus word count.
    Partial (map-side) aggregation absorbs the fan-out before the
    shuffle: the exchange carries distinct (token, partial-count) pairs,
    not one row per token occurrence."""
    docs = read_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(tokens(F.col("text"))).alias("tok"))
        .groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("tok").asc())
        .limit(50)
    )


@register("doc_quality", f"""
WITH s AS (
  SELECT doc_id, text, {_DUCK_TOKS} AS t FROM documents
), r AS (
  SELECT doc_id,
         least(length(text) / 500.0, 1.0) AS len_band,
         CASE WHEN len(t) > 0
              THEN CAST(len(list_filter(t, x -> list_contains({_STOPWORDS_SQL}, x))) AS DOUBLE) / len(t)
              ELSE 0.0 END AS sr,
         CASE WHEN length(text) > 0
              THEN CAST(length(regexp_replace(text, '[^.,;:!?''"()\\[\\]{{}}-]', '', 'g')) AS DOUBLE) / length(text)
              ELSE 0.0 END AS pr
  FROM s
)
SELECT doc_id,
       floor((0.4 * len_band + 0.3 * least(sr * 4, 1.0)
              + 0.3 * greatest(1.0 - pr * 5, 0.0)) * 1000000 + 0.5)
         / 1000000.0 AS quality
FROM r
""")
def doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite heuristic quality score (functions/text.py
    quality_score): length band + stopword presence + punctuation
    penalty, all codegen built-ins."""
    docs = read_table(spark, sf_dir, "documents")
    return docs.select("doc_id", quality_score("text").alias("quality"))


@register("bpe_token_count", r"""
SELECT doc_id,
       COALESCE(len(regexp_extract_all(lower(text),
                    '([a-z]+|[0-9]+|[^a-z0-9\s])', 1)), 0) AS n_bpe,
       COALESCE(len(list_filter(string_split_regex(lower(text), '\s+'),
                    x -> x <> '')), 0) AS n_ws
FROM documents
""")
def bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-word-ish (BPE-flavoured regex) vs whitespace token counts —
    the token-accounting stage of a training-data pipeline."""
    docs = read_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(bpe_ish_tokens("text")).alias("n_bpe"),
        token_count("text").alias("n_ws"),
    )


# ---------------------------------------------------------------------------
# Near-dup: n-gram Jaccard on a deterministic sample of doc pairs
# ---------------------------------------------------------------------------

@register("doc_token_rarity", f"""
WITH toks AS (
  SELECT doc_id, unnest(t) AS tok
  FROM (SELECT doc_id, {_DUCK_TOKS} AS t FROM documents)
), cnts AS (
  SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok
), tot AS (
  SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM cnts
), per AS (
  SELECT t.doc_id, CAST(SUM(c.cnt) AS BIGINT) AS s,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM toks t JOIN cnts c USING (tok) GROUP BY t.doc_id
)
SELECT doc_id, s AS tok_count_sum, n AS n_toks,
       s::DOUBLE / (n * total) AS familiarity
FROM per, tot
""")
def doc_token_rarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-frequency familiarity score — the log-free unigram-LM
    quality signal (rare-token-heavy docs score low, boilerplate scores
    high). Exactness: the per-doc sum of corpus token counts and the
    token totals are INTEGERS, and familiarity is one double division
    of exact integers — bit-equal across engines with no transcendental
    anywhere (a true logprob would hit libm ulp drift; see
    math_transcendental). Scale shape: one explode -> count shuffle on
    the token, one posting join on the token (the word-count exchange is
    reused), one 1-row broadcast total."""
    docs = read_table(spark, sf_dir, "documents")
    # the token stream feeds BOTH the corpus counts and the posting
    # join, so the two-aggregation shape tokenized the corpus twice.
    # r13 (VERDICT r12 item 5): share ONE tokenize pass via a gated
    # persist — the token frame is ~corpus bytes, so the gate has both
    # a lower crossover (tiny corpora recompute for free) and an UPPER
    # cap (a corpus-scale cache would spill ~its own input to local
    # disk; past the cap the two-pass streaming plan is the cheaper
    # side of the trade, the r12 position, now conf-tunable).
    toks = _track_persist_if_token_scale(
        docs.select("doc_id",
                    F.explode(tokens(F.col("text"))).alias("tok")),
        docs)
    cnts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    total = cnts.agg(F.sum("cnt").alias("total"))
    per = (toks.join(cnts, "tok")
           .groupBy("doc_id")
           .agg(F.sum("cnt").alias("tok_count_sum"),
                F.count(F.lit(1)).alias("n_toks")))
    return per.crossJoin(F.broadcast(total)).select(
        "doc_id", "tok_count_sum", "n_toks",
        (F.col("tok_count_sum").cast("double")
         / (F.col("n_toks") * F.col("total"))).alias("familiarity"))


@register("contamination_overlap", f"""
WITH grams AS (
  SELECT doc_id, unnest(list_distinct(
           CASE WHEN len(t) >= 5
                THEN list_transform(range(1, len(t) - 3),
                                    i -> array_to_string(t[i:i+4], ' '))
                WHEN len(t) > 0 THEN [array_to_string(t, ' ')]
                ELSE [] END)) AS g
  FROM (SELECT doc_id, {_DUCK_TOKS} AS t FROM documents)
), bench AS (
  SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS hits
FROM grams JOIN bench USING (g)
WHERE doc_id % 97 <> 0
GROUP BY doc_id
""")
def contamination_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination check: flag corpus docs sharing any
    5-gram with the held-out set (docs with doc_id % 97 == 0 stand in
    for the benchmark), with the distinct-shared-gram count. The join
    is an inverted index on the gram with the (small) benchmark gram
    set broadcast — candidate docs never pair with each other, so cost
    is O(corpus grams), not O(corpus x benchmark)."""
    docs = read_table(spark, sf_dir, "documents")
    grams = docs.select(
        "doc_id",
        F.explode(F.array_distinct(
            shingles(tokens(F.col("text")), 5))).alias("g"))
    bench = grams.filter(F.col("doc_id") % 97 == 0).select("g").distinct()
    return (grams.filter(F.col("doc_id") % 97 != 0)
            .join(F.broadcast(bench), "g")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("hits")))


@register("tfidf_top_term", f"""
WITH toks AS (
  SELECT doc_id, unnest(t) AS tok
  FROM (SELECT doc_id, {_DUCK_TOKS} AS t FROM documents)
), tf AS (
  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
  FROM toks GROUP BY doc_id, tok
), df AS (
  SELECT tok, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
  FROM toks GROUP BY tok
)
SELECT doc_id, tok AS top_term, tf, df, score FROM (
  SELECT tf.doc_id, tf.tok, tf.tf, df.df,
         tf.tf::DOUBLE / df.df AS score,
         ROW_NUMBER() OVER (PARTITION BY tf.doc_id
                            ORDER BY tf.tf::DOUBLE / df.df DESC,
                                     tf.tok ASC) AS rn
  FROM tf JOIN df USING (tok)
) WHERE rn = 1
""")
def tfidf_top_term(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most-distinctive term per document by tf/df ratio (log-free
    tf-idf: same argmax as tf*idf under any monotone idf, without libm
    drift — tf and df are exact integers, the score is one double
    division, ties break on the term). The per-doc argmax is a window
    over the tf join; both aggregations partial-combine before their
    single exchange."""
    docs = read_table(spark, sf_dir, "documents")
    # shared tokenize pass (r13) — same two-sided gate as
    # doc_token_rarity: tf and df are two aggregations over one
    # token stream
    toks = _track_persist_if_token_scale(
        docs.select("doc_id",
                    F.explode(tokens(F.col("text"))).alias("tok")),
        docs)
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    df_ = toks.groupBy("tok").agg(
        F.countDistinct("doc_id").alias("df"))
    scored = tf.join(df_, "tok").withColumn(
        "score", F.col("tf").cast("double") / F.col("df"))
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("tok").asc())
    return (scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("doc_id", F.col("tok").alias("top_term"),
                    "tf", "df", "score"))


_JACCARD_SAMPLE_CAP = 64

@register("jaccard_sampled_pairs", f"""
WITH sub0 AS (
  SELECT doc_id, text FROM documents
  ORDER BY md5(doc_id::VARCHAR), doc_id
  LIMIT {_JACCARD_SAMPLE_CAP}
), sub AS (
  SELECT doc_id, list_distinct(
           CASE WHEN len(t) >= 3
                THEN list_transform(range(1, len(t) - 1),
                                    i -> array_to_string(t[i:i+2], ' '))
                WHEN len(t) > 0 THEN [array_to_string(t, ' ')]
                ELSE [] END) AS grams
  FROM (SELECT doc_id, {_DUCK_TOKS} AS t FROM sub0)
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(len(list_filter(a.grams, x -> list_contains(b.grams, x))) AS DOUBLE)
         / (len(a.grams) + len(b.grams)
            - len(list_filter(a.grams, x -> list_contains(b.grams, x)))) AS jaccard
FROM sub a JOIN sub b ON a.doc_id < b.doc_id
""")
def jaccard_sampled_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard over an ABSOLUTE-size doc sample: the 64
    lowest docs by md5(doc_id) order (content-uncorrelated, portable,
    deterministic). The all-pairs scorer is bounded at cap*(cap-1)/2
    pairs REGARDLESS of corpus size — unlike a rate-based sample, whose
    pair count grows quadratically with the corpus. The production
    verification path is ``ngram_jaccard_pairs`` with an LSH candidate
    frame (O(candidates)); this query is the bounded exact scorer.
    Integer set sizes -> one double division -> bit-exact across
    engines."""
    docs = (
        read_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .orderBy(F.md5(F.col("doc_id").cast("string")).asc(),
                 F.col("doc_id").asc())
        .limit(_JACCARD_SAMPLE_CAP)
    )
    grams = F.array_distinct(shingles(tokens(F.col("text")), 3))
    g = docs.select(F.col("doc_id"), grams.alias("grams"))
    a, b = g.alias("a"), g.alias("b")
    inter = F.size(F.array_intersect(F.col("a.grams"), F.col("b.grams")))
    union = (F.size(F.col("a.grams")) + F.size(F.col("b.grams")) - inter)
    return (
        a.crossJoin(b)
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("id_a"),
                F.col("b.doc_id").alias("id_b"),
                # try_divide: two empty gram sets (null/blank texts) have
                # undefined Jaccard — NULL, DuckDB's 0/0, not an ANSI abort
                F.try_divide(inter.cast("double"), union).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# Shared SQL builders for the portable-hash tier
# ---------------------------------------------------------------------------

def _banded_pair_sql(cap: int, fullsig: bool = False) -> str:
    """SQL mirror of operators/dedup._capped_band_pairs: expects a CTE
    named ``banded`` with (doc_id, band, sig[, fullsig]); emits ``bstat``
    and ``rawpairs`` CTEs. Buckets <= cap yield all intra-bucket pairs,
    larger buckets yield star pairs against the bucket-min row."""
    fs_ab = ", a.fullsig AS fs_a, b.fullsig AS fs_b" if fullsig else ""
    fs_star = ", r.fullsig AS fs_a, b.fullsig AS fs_b" if fullsig else ""
    rep_cols = "band, sig, bmin" + (", fullsig" if fullsig else "")
    return f"""bstat AS (
  SELECT *, COUNT(*) OVER (PARTITION BY band, sig) AS bsz,
         MIN(doc_id) OVER (PARTITION BY band, sig) AS bmin
  FROM banded
), rawpairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b{fs_ab}
  FROM bstat a JOIN bstat b ON a.band = b.band AND a.sig = b.sig
  WHERE a.doc_id < b.doc_id AND a.bsz <= {cap}
  UNION ALL
  SELECT r.bmin AS id_a, b.doc_id AS id_b{fs_star}
  FROM bstat b JOIN (
    SELECT DISTINCT {rep_cols} FROM bstat WHERE doc_id = bmin
  ) r ON r.band = b.band AND r.sig = b.sig
  WHERE b.bsz > {cap} AND b.doc_id > b.bmin
)"""


def _simhash_ctes(bits: int, src: str = "documents") -> str:
    """Per-doc md5-mode SimHash as SQL (mirrors functions/hashing.simhash
    with hash_fn='md5'): one md5 per token, integer ±1 votes per bit,
    vote>0 sets the bit; docs with no tokens hash to 0 via the LEFT
    JOIN (a false WHEN on NULL votes contributes 0)."""
    hex_chars = (bits + 3) // 4
    votes = ",\n         ".join(
        f"SUM(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS v{j}"
        for j in range(bits))
    bitsum = " + ".join(
        f"CASE WHEN v{j} > 0 THEN {1 << j} ELSE 0 END" for j in range(bits))
    return f"""toks AS (SELECT doc_id, {_DUCK_TOKS} AS t FROM {src}),
th AS (
  SELECT doc_id, ('0x' || substr(md5(tok), 1, {hex_chars}))::BIGINT AS h
  FROM toks, UNNEST(toks.t) AS u(tok)
), v AS (
  SELECT doc_id,
         {votes}
  FROM th GROUP BY doc_id
), sims AS (
  SELECT toks.doc_id, CAST({bitsum} AS BIGINT) AS sim
  FROM toks LEFT JOIN v ON toks.doc_id = v.doc_id
)"""


def _srp_bucket_sql(vec: str, planes: int, dim: int) -> str:
    """SRP bucket id as SQL: the SAME ±1 plane matrix as the Spark plan
    (similarity.srp_plane_components generates both sides), and the same
    sequential double fold — ``0 + x1 - x2 + ...`` evaluated
    left-to-right is bit-identical to zip_with-multiply + aggregate-add
    from 0.0, because x*±1.0 and a±x are exact in IEEE."""
    comps = similarity.srp_plane_components(planes, dim)
    terms = []
    for p in range(planes):
        chain = " ".join(
            f"{'+' if comps[p][i] > 0 else '-'} {vec}[{i + 1}]::DOUBLE"
            for i in range(dim))
        terms.append(f"CASE WHEN (0 {chain}) >= 0 THEN {1 << p} ELSE 0 END")
    return "(" + " + ".join(terms) + ")"


def _cos_sql(a: str, b: str, dim: int) -> str:
    """Cosine as SQL with the exact fold order of functions/vector.cosine
    (sequential left-to-right double sums — the ann_cosine_topk pattern)."""
    def dot(x: str, y: str) -> str:
        return (f"list_reduce(list_transform(range(1, {dim + 1}), "
                f"i -> {x}[i]::DOUBLE * {y}[i]::DOUBLE), (x, y) -> x + y)")
    return f"{dot(a, b)} / (sqrt({dot(a, a)}) * sqrt({dot(b, b)}))"


# ---------------------------------------------------------------------------
# MinHash-LSH candidate pairs — fully oracle-checked (portable md5)
# ---------------------------------------------------------------------------

def _minhash_ctes(k: int = 5, num_hashes: int = 12, bands: int = 4) -> str:
    """Shared CTE chain: tokens -> shingles -> hashed -> signatures ->
    banded rows (reused by the pairs query and the composed pipeline)."""
    from imp_etl_spark.functions.hashing import MERSENNE31, MINHASH_A, MINHASH_B

    rows = num_hashes // bands
    mins = ",\n         ".join(
        f"min((h * {MINHASH_A[i]} + {MINHASH_B[i]}) % {MERSENNE31}) AS h{i}"
        for i in range(num_hashes))
    band_rows = []
    for b in range(bands):
        cols = " || '|' || ".join(
            f"h{i}::VARCHAR" for i in range(b * rows, (b + 1) * rows))
        band_rows.append(
            f"SELECT doc_id, {b} AS band, {cols} AS sig FROM sig")
    banded = "\nUNION ALL\n".join(band_rows)
    return f"""toks AS (
  SELECT doc_id, {_DUCK_TOKS} AS t FROM documents
), sh AS (
  SELECT doc_id,
         CASE WHEN len(t) >= {k}
              THEN list_transform(range(1, len(t) - {k} + 2),
                                  i -> array_to_string(t[i:i+{k - 1}], ' '))
              WHEN len(t) > 0 THEN [array_to_string(t, ' ')]
              ELSE [] END AS shingles
  FROM toks
), exploded AS (
  SELECT doc_id,
         ('0x' || substr(md5(s), 1, 15))::BIGINT % {MERSENNE31} AS h
  FROM sh, UNNEST(sh.shingles) AS u(s)
), sig AS (
  SELECT doc_id,
         {mins}
  FROM exploded GROUP BY doc_id
), banded AS (
{banded}
)"""


def _minhash_sql(k: int = 5, num_hashes: int = 12, bands: int = 4,
                 cap: int = 256) -> str:
    return f"""
WITH {_minhash_ctes(k, num_hashes, bands)},
{_banded_pair_sql(cap)}
SELECT DISTINCT id_a, id_b FROM rawpairs
"""


def _verified_pair_ctes(k: int = 5, num_hashes: int = 12, bands: int = 4,
                        threshold: float = 0.5, cap: int = 256) -> str:
    """CTE chain through ``verified`` (id_a, id_b): MinHash banding ->
    capped bucket pairs -> exact n-gram-Jaccard verification. Shared by
    the survivor, cluster-assignment and pipeline queries."""
    return f"""{_minhash_ctes(k, num_hashes, bands)},
{_banded_pair_sql(cap)},
cand AS (
  SELECT DISTINCT id_a, id_b FROM rawpairs
), gramsets AS (
  SELECT doc_id, list_distinct(shingles) AS gs FROM sh
), verified AS (
  SELECT c.id_a, c.id_b
  FROM cand c
  JOIN gramsets ga ON ga.doc_id = c.id_a
  JOIN gramsets gb ON gb.doc_id = c.id_b
  WHERE CAST(len(list_filter(ga.gs, x -> list_contains(gb.gs, x))) AS DOUBLE)
        / (len(ga.gs) + len(gb.gs)
           - len(list_filter(ga.gs, x -> list_contains(gb.gs, x))))
        >= {threshold}
)"""


def _dedup_pipeline_sql(k: int = 5, num_hashes: int = 12, bands: int = 4,
                        threshold: float = 0.5, cap: int = 256) -> str:
    return f"""
WITH {_verified_pair_ctes(k, num_hashes, bands, threshold, cap)},
removed AS (SELECT DISTINCT id_b FROM verified)
SELECT d.doc_id, d.n_chars FROM documents d
WHERE NOT EXISTS (SELECT 1 FROM removed r WHERE r.id_b = d.doc_id)
"""


def _dedup_cluster_sql(k: int = 5, num_hashes: int = 12, bands: int = 4,
                       threshold: float = 0.5, cap: int = 256) -> str:
    """Cluster oracle: transitive closure of the verified pair graph via
    a recursive CTE (reach set per node), label = min reachable id.
    Exponential in nothing here — components are tiny — but the CLOSURE
    formulation is oracle-only; the Spark side propagates min labels in
    O(diameter) rounds without materializing reach sets."""
    return f"""
WITH RECURSIVE {_verified_pair_ctes(k, num_hashes, bands, threshold, cap)},
edges AS (
  SELECT id_a AS a, id_b AS b FROM verified
  UNION
  SELECT id_b AS a, id_a AS b FROM verified
), walk AS (
  SELECT a AS node, b AS reach FROM edges
  UNION
  SELECT w.node, e.b AS reach FROM walk w JOIN edges e ON e.a = w.reach
), labels AS (
  SELECT node, LEAST(node, MIN(reach)) AS cluster_id
  FROM walk GROUP BY node
)
SELECT d.doc_id, COALESCE(l.cluster_id, d.doc_id) AS cluster_id
FROM documents d LEFT JOIN labels l ON l.node = d.doc_id
"""


# one banded-signature build per (process, corpus version); every
# dedup-tier consumer below reads the persisted table instead of
# re-running the shingle->md5->minhash pass (VERDICT r4 item 5 — the
# disk artifact the cross-corpus matcher already presumes for its
# reference side)
_MINHASH_IDX: dict[tuple, str] = {}
# created at import: a lazily check-then-set lock is itself racy (two
# first callers would each mint their own lock and both run the build)
_MINHASH_IDX_LOCK = threading.Lock()

# Session-scoped persists the dedup tier creates (candidate-pair and
# verified-pair frames). NOTHING reclaims these implicitly: this list
# holds strong references and Spark's CacheManager keeps cache entries
# until an explicit unpersist (ContextCleaner only collects frames with
# NO live reference — these always have one, so it never fires).
# release_dedup_caches() is therefore the ONLY release path; the
# controller invokes it after every run_once and every scheduled epoch
# (plans/control.py _release_query_caches — VERDICT r6 item 3), and
# run_etl_stream's ``on_epoch_end`` DEFAULTS to the same hook (VERDICT
# r7 item 4), so both the wrapped and the direct streaming entry get
# the bounded lifecycle — the same explicit discipline
# operators/window.global_index exposes via its ``release`` parameter
# (VERDICT r5 item 4). The registered query signature is fixed at
# (spark, sf_dir), so the hook is module-level rather than a per-call
# argument. Growth between releases is bounded by persists-per-query ×
# queries-run, and each frame is pairs-only (tiny); a one-shot process
# can skip the release entirely.
_DEDUP_PERSISTS: list[DataFrame] = []
_DEDUP_PERSISTS_LOCK = threading.Lock()


def _track_persist(df: DataFrame) -> DataFrame:
    """Persist MEMORY_AND_DISK and record the frame for explicit
    release. Returns the persisted frame."""
    from pyspark.storagelevel import StorageLevel

    d = df.persist(StorageLevel.MEMORY_AND_DISK)
    with _DEDUP_PERSISTS_LOCK:
        _DEDUP_PERSISTS.append(d)
    return d


def _track_persist_if_token_scale(toks: DataFrame,
                                  docs: DataFrame) -> DataFrame:
    """Gated persist for a per-doc exploded token stream (r13, VERDICT
    r12 item 5): the two-aggregation corpus queries (tfidf_top_term,
    doc_token_rarity, oov_rate_docs) consume their token frame twice,
    so one persisted tokenize pass replaces two — but the frame is
    ~corpus bytes, so the gate is two-sided: below
    ``spark.imp_etl.persist.minTokenSourceRows`` docs the recompute is
    free (fused plan), at/above ``...maxTokenSourceRows`` docs the
    cache would spill roughly the corpus to local disk and the
    streaming two-pass plan wins (the r12 trade, kept, now with a
    measured crossover window between the bounds)."""
    from imp_etl_spark.operators.util import persist_if_big

    rel: list[DataFrame] = []
    out = persist_if_big(
        toks, docs, release=rel,
        min_rows_conf="spark.imp_etl.persist.minTokenSourceRows",
        default_min_rows=2048,
        max_rows_conf="spark.imp_etl.persist.maxTokenSourceRows",
        default_max_rows=16_777_216)
    if rel:
        with _DEDUP_PERSISTS_LOCK:
            _DEDUP_PERSISTS.extend(rel)
    return out


def _track_persist_if_big(df: DataFrame, source: DataFrame,
                          min_rows_conf: str,
                          default_min_rows: int) -> DataFrame:
    """``persist_if_big`` routed through the dedup tier's release
    registry (r13, VERDICT r12 item 2): the query-level persists that
    stayed unconditional in r12 (verified pairs, candidate pairs, the
    HLL sketch frame) now gate on the SOURCE's footer row bound like
    the operator-level ones, each family with its own conf-overridable
    crossover. Returns ``df`` unchanged (fused plan) below the gate."""
    from imp_etl_spark.operators.util import persist_if_big

    rel: list[DataFrame] = []
    out = persist_if_big(df, source, release=rel,
                         min_rows_conf=min_rows_conf,
                         default_min_rows=default_min_rows)
    if rel:
        with _DEDUP_PERSISTS_LOCK:
            _DEDUP_PERSISTS.extend(rel)
    return out


def release_dedup_caches(blocking: bool = False) -> int:
    """Unpersist every dedup-tier frame tracked by ``_track_persist``
    and clear the registry; returns how many were released. The shared
    MinHash signature artifact (``_MINHASH_IDX``) is a DISK parquet
    memo, not a block-manager persist — it holds no executor memory and
    is invalidated by corpus mtime, so it is deliberately not touched
    here."""
    with _DEDUP_PERSISTS_LOCK:
        frames, _DEDUP_PERSISTS[:] = list(_DEDUP_PERSISTS), []
    for d in frames:
        try:
            d.unpersist(blocking=blocking)
        except Exception:
            pass  # session already stopped — nothing to release
    return len(frames)


def _shared_minhash_stacked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup tier's shared signature artifact: (doc_id, band, sig)
    for the documents table at 12 hashes / 4 bands / 5-token shingles,
    built once via operators/dedup.build_minhash_index and re-read as a
    narrow band-partitioned parquet scan by all four consumers
    (minhash_lsh_pairs, dedup_pipeline_survivors, dedup_cluster_assign,
    cross_corpus_survivors).

    The memo key includes the documents table's mtime, so a rewritten
    corpus at the same path invalidates the cached index (signatures
    must never go stale vs the live table the oracle reads); a lock
    serializes first-build so concurrent callers don't duplicate the
    signature pass.
    """
    import os
    import tempfile

    from imp_etl_spark.operators.dedup import (
        build_minhash_index,
        read_minhash_index,
    )

    doc_path = os.path.join(sf_dir, "documents.parquet")
    try:
        mtime = os.path.getmtime(doc_path)
    except OSError:
        mtime = None  # remote/unstattable path: fall back to path-only key
    key = (os.path.abspath(sf_dir), mtime)
    with _MINHASH_IDX_LOCK:
        if key not in _MINHASH_IDX:
            # a rewritten corpus supersedes its old index: drop the
            # stale temp dir so invalidations don't accumulate on disk
            import shutil

            for old in [k for k in _MINHASH_IDX if k[0] == key[0]]:
                shutil.rmtree(os.path.dirname(_MINHASH_IDX.pop(old)),
                              ignore_errors=True)
            path = os.path.join(tempfile.mkdtemp(prefix="minhash_idx_"),
                                "index")
            docs = read_table(spark, sf_dir, "documents")
            build_minhash_index(docs, path, "text", "doc_id", shingle_k=5,
                                num_hashes=12, bands=4)
            _MINHASH_IDX[key] = path
    stacked, _params = read_minhash_index(spark, _MINHASH_IDX[key])
    return stacked


@register("dedup_pipeline_survivors", _dedup_pipeline_sql())
def dedup_pipeline_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed LLM dedup pipeline end-to-end: MinHash-LSH candidate
    generation -> exact n-gram-Jaccard verification of ONLY the
    candidates -> survivor selection (lowest doc_id of each verified
    near-dup pair survives, via anti join).

    Scale shape: the O(n^2) pair space never materializes — candidates
    come from band-bucket collisions, verification touches candidate
    pairs only, and the final anti join broadcasts the removal set —
    the small side by the LSH-bounded candidate contract (at a
    high-dup-rate crawl where removals are a corpus-scale fraction, the
    hint comes off and the join shuffles ids; see SCALING.md)."""
    from imp_etl_spark.operators.dedup import (
        minhash_candidates_from_stacked,
        ngram_jaccard_pairs,
    )

    docs = read_table(spark, sf_dir, "documents")
    # candidates come off the SHARED banded-signature artifact (one
    # build per corpus, _shared_minhash_stacked); the pair frame feeds
    # BOTH the posting-list prune and the pair semi-join inside
    # ngram_jaccard_pairs, so persist it (tiny — pairs only; tracked
    # for explicit release via release_dedup_caches). Gated (r13) on
    # the corpus footer bound like every other staged persist: the
    # Jaccard verify these frames cache is expensive per doc, so the
    # crossover sits at hundreds of docs, far below the operator-level
    # 16384 default — only toy corpora keep the fused plan.
    _rel: list[DataFrame] = []
    cands = _track_persist_if_big(
        minhash_candidates_from_stacked(_shared_minhash_stacked(
            spark, sf_dir), release=_rel),
        docs, "spark.imp_etl.persist.minVerifySourceRows", 256)
    # the verified-pair table is the NEXT staged artifact after the
    # signatures: survivor selection here and cluster assignment
    # (dedup_cluster_assign) consume the SAME pairs, so persist them —
    # the cache manager dedupes by logical plan and the second consumer
    # skips the whole Jaccard verify (a production crawl materializes
    # exactly this table between its verify and cluster stages)
    verified = _track_persist_if_big(
        ngram_jaccard_pairs(docs, "text", "doc_id", n=5,
                            threshold=0.5, candidates=cands,
                            release=_rel),
        docs, "spark.imp_etl.persist.minVerifySourceRows", 256)
    with _DEDUP_PERSISTS_LOCK:
        _DEDUP_PERSISTS.extend(_rel)
    removed = verified.select(F.col("id_b").alias("doc_id")).distinct()
    return docs.join(F.broadcast(removed), on="doc_id",
                     how="left_anti").select("doc_id", "n_chars")


def _cross_corpus_sql(k: int = 5, num_hashes: int = 12, bands: int = 4,
                      threshold: float = 0.5, cap: int = 256) -> str:
    """NEW corpus = doc_id % 10 >= 7, REFERENCE = the rest. A new doc is
    dropped when it band-collides with the reference AND exact Jaccard
    vs the collided ref doc clears the threshold. Over-cap ref buckets
    collapse to their min-id representative (match preserved — the
    decision is bucket-level)."""
    return f"""
WITH {_minhash_ctes(k, num_hashes, bands)},
refb AS (
  SELECT doc_id, band, sig,
         COUNT(*) OVER (PARTITION BY band, sig) AS bsz,
         MIN(doc_id) OVER (PARTITION BY band, sig) AS bmin
  FROM banded WHERE doc_id % 10 < 7
), refc AS (
  SELECT doc_id AS id_ref, band, sig FROM refb
  WHERE bsz <= {cap} OR doc_id = bmin
), cand AS (
  SELECT DISTINCT n.doc_id AS id_new, r.id_ref
  FROM banded n JOIN refc r ON n.band = r.band AND n.sig = r.sig
  WHERE n.doc_id % 10 >= 7
), gramsets AS (
  SELECT doc_id, list_distinct(shingles) AS gs FROM sh
), verified AS (
  SELECT c.id_new
  FROM cand c
  JOIN gramsets ga ON ga.doc_id = c.id_new
  JOIN gramsets gb ON gb.doc_id = c.id_ref
  WHERE CAST(len(list_filter(ga.gs, x -> list_contains(gb.gs, x))) AS DOUBLE)
        / (len(ga.gs) + len(gb.gs)
           - len(list_filter(ga.gs, x -> list_contains(gb.gs, x))))
        >= {threshold}
)
SELECT d.doc_id, d.n_chars FROM documents d
WHERE d.doc_id % 10 >= 7
  AND NOT EXISTS (SELECT 1 FROM verified v WHERE v.id_new = d.doc_id)
"""


@register("cross_corpus_survivors", _cross_corpus_sql())
def cross_corpus_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-crawl dedup: new docs (doc_id %% 10 >= 7) that do NOT
    near-duplicate the existing reference corpus (the rest). Band-bucket
    match against the reference's precomputable signature table
    (operators/dedup.cross_corpus_candidates), then exact Jaccard
    verification of candidates only, then anti join.

    Scale: the reference corpus is touched only through its banded
    signature table (reused across crawl batches at 100 TB); no
    new∪ref self-join ever forms, and the verify cost is O(candidates).
    The signature table IS the shared disk artifact
    (_shared_minhash_stacked) — exactly the precomputed reference-side
    index this operator's design assumes."""
    from imp_etl_spark.operators.dedup import (
        cross_corpus_candidates,
        ngram_jaccard_pairs,
    )

    docs = read_table(spark, sf_dir, "documents")
    stacked = _shared_minhash_stacked(spark, sf_dir)
    is_new = F.col("doc_id") % 10 >= 7
    cand = cross_corpus_candidates(stacked.filter(is_new),
                                   stacked.filter(~is_new))
    # reuse the self-join verifier on the union frame: ids are globally
    # unique, and the candidate set already constrains pairs to new↔ref
    pairs = _track_persist_if_big(cand.select(
        F.least("id_new", "id_ref").alias("id_a"),
        F.greatest("id_new", "id_ref").alias("id_b"),
    ), docs, "spark.imp_etl.persist.minVerifySourceRows", 256)
    # persist the verified pairs too (r12): the removed-set union below
    # consumes them through BOTH legs (id_a and id_b), and without the
    # persist each leg re-ran the whole Jaccard verify — including its
    # two gramset joins — so the before plan re-scanned documents four
    # times (plans/r12/cross_corpus_survivors_before.txt). Same staged
    # pair-table treatment as dedup_pipeline_survivors' verified frame;
    # pairs-only, tiny, released via release_dedup_caches; gated (r13)
    # on the corpus footer bound with the verify-tier crossover.
    _rel: list[DataFrame] = []
    verified = _track_persist_if_big(
        ngram_jaccard_pairs(docs, "text", "doc_id", n=5,
                            threshold=0.5, candidates=pairs,
                            release=_rel),
        docs, "spark.imp_etl.persist.minVerifySourceRows", 256)
    with _DEDUP_PERSISTS_LOCK:
        _DEDUP_PERSISTS.extend(_rel)
    removed = (
        verified.select(F.col("id_a").alias("doc_id"))
        .unionByName(verified.select(F.col("id_b").alias("doc_id")))
        .filter(F.col("doc_id") % 10 >= 7)
        .distinct()
    )
    return (
        docs.filter(is_new)
        .join(F.broadcast(removed), on="doc_id", how="left_anti")
        .select("doc_id", "n_chars")
    )


@register("weighted_sample_docs", """
SELECT doc_id, lang, n_chars FROM documents
WHERE (('0x' || substr(md5(doc_id::VARCHAR || 'w1'), 1, 15))::BIGINT % 10000)
      < LEAST(1.0, n_chars / 800.0) * 10000
""")
def weighted_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-weighted corpus pruning (operators/sampling.weighted_sample,
    md5 compat mode): each doc survives with probability
    min(1, n_chars/800) decided by its own id hash — narrow one-pass
    filter, retry/append-stable, monotone in the weight."""
    from imp_etl_spark.operators.sampling import weighted_sample

    docs = read_table(spark, sf_dir, "documents")
    w = F.least(F.lit(1.0), F.col("n_chars") / F.lit(800.0))
    return weighted_sample(docs, "doc_id", w, salt="w1",
                           hash_fn="md5").select("doc_id", "lang", "n_chars")


@register("passage_dedup_docs", """
WITH toks AS (
  SELECT doc_id, """ + _DUCK_TOKS + """ AS t FROM documents
), plist AS (
  SELECT doc_id,
         CASE WHEN len(t) > 0
              THEN list_transform(range(1, CAST(CEIL(len(t) / 16.0) AS INT) + 1),
                                  i -> array_to_string(t[(i-1)*16+1 : (i-1)*16+16], ' '))
              ELSE [] END AS ps
  FROM toks
), passages AS (
  SELECT doc_id, i - 1 AS passage_idx, ps[i] AS passage
  FROM plist, UNNEST(range(1, len(ps) + 1)) AS u(i)
), ranked AS (
  SELECT doc_id, passage_idx, passage,
         ROW_NUMBER() OVER (PARTITION BY passage
                            ORDER BY doc_id, passage_idx) AS rn
  FROM passages
)
SELECT doc_id, passage_idx, passage FROM ranked WHERE rn = 1
""")
def passage_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Passage-level (16-token) first-occurrence dedup
    (operators/dedup.passage_dedup): the boilerplate-removal pass.
    Spark shuffles 8-byte xxhash64 passage keys; the oracle partitions by
    the passage text itself — identical output unless xxhash64 collides
    (none at fixture scale; at 100 TB a collision merges two passages,
    the standard accepted trade of hash-keyed dedup)."""
    from imp_etl_spark.operators.dedup import passage_dedup

    docs = read_table(spark, sf_dir, "documents")
    return passage_dedup(docs, "text", "doc_id", k=16)


@register("dedup_cluster_assign", _dedup_cluster_sql())
def dedup_cluster_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS, not just pairs: LSH candidates -> exact Jaccard
    verification -> connected components (operators/graph.py, iterative
    min-label propagation) -> every doc labeled with its component's min
    doc_id (its own id for singletons). Cluster-aware dedup then keeps
    one row per cluster_id — correct on chains a~b~c where pair-based
    survivor picks can disagree.

    Scale: the pair graph is the near-dup subset; per CC round the
    shuffle carries 16-byte (node,label) rows; the final corpus join
    broadcasts the component map (cluster_assignments' broadcast_map
    knob turns that off for high-dup corpora where the map is a
    corpus-scale fraction)."""
    from imp_etl_spark.operators.dedup import (
        minhash_candidates_from_stacked,
        ngram_jaccard_pairs,
    )
    from imp_etl_spark.operators.graph import cluster_assignments

    docs = read_table(spark, sf_dir, "documents")
    _rel: list[DataFrame] = []
    cands = _track_persist_if_big(
        minhash_candidates_from_stacked(_shared_minhash_stacked(
            spark, sf_dir), release=_rel),
        docs, "spark.imp_etl.persist.minVerifySourceRows", 256)
    # same logical plan as dedup_pipeline_survivors' verified frame —
    # the persist makes the shared Jaccard verify a cache hit when both
    # run in one session (the staged pair-table artifact; tracked for
    # release_dedup_caches in long-lived drivers); gated (r13) on the
    # corpus footer bound with the verify-tier crossover
    verified = _track_persist_if_big(
        ngram_jaccard_pairs(docs, "text", "doc_id", n=5,
                            threshold=0.5, candidates=cands,
                            release=_rel),
        docs, "spark.imp_etl.persist.minVerifySourceRows", 256)
    with _DEDUP_PERSISTS_LOCK:
        _DEDUP_PERSISTS.extend(_rel)
    return cluster_assignments(docs.select("doc_id"), verified,
                               id_col="doc_id")


@register("minhash_lsh_pairs", _minhash_sql())
def minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-pair listing off the shared banded-signature artifact
    (operators/dedup.build_minhash_index + minhash_candidates_from_
    stacked): a 3-column parquet scan and one (band, sig) exchange —
    the signature pass itself is amortized across the dedup tier."""
    from imp_etl_spark.operators.dedup import minhash_candidates_from_stacked

    _rel: list[DataFrame] = []
    out = minhash_candidates_from_stacked(
        _shared_minhash_stacked(spark, sf_dir), release=_rel)
    if _rel:
        with _DEDUP_PERSISTS_LOCK:
            _DEDUP_PERSISTS.extend(_rel)
    return out


# ---------------------------------------------------------------------------
# Similarity search over embeddings
# ---------------------------------------------------------------------------

@register("ann_cosine_topk", """
WITH q AS (SELECT vec_id AS query_id, embedding AS qvec FROM embeddings
           WHERE vec_id < 8),
scored AS (
  SELECT q.query_id, e.vec_id,
         list_reduce(list_transform(range(1, 65),
             i -> e.embedding[i]::DOUBLE * q.qvec[i]::DOUBLE),
             (x, y) -> x + y)
         / (sqrt(list_reduce(list_transform(range(1, 65),
                i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE),
                (x, y) -> x + y))
            * sqrt(list_reduce(list_transform(range(1, 65),
                i -> q.qvec[i]::DOUBLE * q.qvec[i]::DOUBLE),
                (x, y) -> x + y))) AS cos
  FROM embeddings e, q
)
SELECT query_id, vec_id, cos, rnk FROM (
  SELECT query_id, vec_id, cos,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, vec_id ASC) AS rnk
  FROM scored
) WHERE rnk <= 10
""")
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 for 8 query vectors. The fold order is
    identical in both engines (sequential over the array, double
    accumulation), so cos is bit-exact — no rounding tricks needed."""
    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding")
    return similarity.brute_force_topk(emb, queries, k=10)


def _srp_topk_sql(planes: int = 4, dim: int = 64, k: int = 10) -> str:
    bucket = _srp_bucket_sql("embedding", planes, dim)
    probes = ", ".join(["qb"] + [f"xor(qb, {1 << p})" for p in range(planes)])
    return f"""
WITH cb AS (
  SELECT vec_id, embedding, {bucket} AS bkt FROM embeddings
), q0 AS (
  SELECT vec_id AS query_id, embedding AS qvec, {bucket} AS qb
  FROM embeddings WHERE vec_id < 8
), qp AS (
  SELECT query_id, qvec, UNNEST([{probes}]) AS bkt FROM q0
), scored AS (
  SELECT qp.query_id, cb.vec_id,
         {_cos_sql('cb.embedding', 'qp.qvec', dim)} AS cos
  FROM cb JOIN qp ON cb.bkt = qp.bkt
)
SELECT query_id, vec_id, cos, rnk FROM (
  SELECT query_id, vec_id, cos,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, vec_id ASC) AS rnk
  FROM scored
) WHERE rnk <= {k}
"""


@register("srp_bucket_topk", _srp_topk_sql())
def srp_bucket_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale path: SRP-LSH bucketed ANN with Hamming-1 multi-probe.
    Fully oracle-checked: the ±1 plane literals, bucket bits, probe set
    and cosine re-rank are reproduced in SQL from the same Python plane
    matrix (measured recall vs brute force in SCALING.md)."""
    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding")
    return similarity.srp_bucket_topk(emb, queries, k=10, dim=64, planes=4,
                                      probe_bits=1)


def _ivf_sql(nlist: int = 10, nprobe: int = 3, iters: int = 2,
             k: int = 10, dim: int = 64, qmax: int = 8) -> str:
    """Full IVF — seed sample, ``iters`` Lloyd steps, probe, re-rank —
    as one generated SQL query. Reproducible because the Spark trainer
    (similarity.train_ivf_centroids) is exact: md5-ordered seeds,
    integer micro-unit sums for the update step (the decimal(18,6)
    quantization rule both engines share — tests/test_quantize.py), and
    single IEEE divisions; every cosine uses the sequential fold of
    _cos_sql, so centroids, assignments, probe lists and the final
    ranking are all bit-identical."""
    def assign(prev_c: str, name: str, src: str = "train") -> str:
        # WHERE cos IS NOT NULL mirrors Spark's argmax over an all-NULL
        # score array (zero-norm vector): no list assignment at all
        return f"""{name}_s AS (
  SELECT {src}.vec_id, {prev_c}.idx,
         {_cos_sql(f'{src}.v', f'{prev_c}.v', dim)} AS cos
  FROM {src}, {prev_c}
), {name} AS (
  SELECT vec_id, idx AS lst FROM (
    SELECT vec_id, idx,
           ROW_NUMBER() OVER (PARTITION BY vec_id
                              ORDER BY cos DESC, idx ASC) AS rn
    FROM {name}_s WHERE cos IS NOT NULL
  ) WHERE rn = 1
)"""

    def update(a: str, prev_c: str, name: str) -> str:
        return f"""{name}_m AS (
  SELECT {a}.lst, p.i AS pos, SUM(micro.m[p.i]) AS s, COUNT(*) AS n
  FROM {a} JOIN micro USING (vec_id),
       (SELECT unnest(range(1, {dim + 1})) AS i) p
  GROUP BY {a}.lst, p.i
), {name} AS (
  SELECT {prev_c}.idx, COALESCE(nc.v, {prev_c}.v) AS v
  FROM {prev_c} LEFT JOIN (
    SELECT lst AS idx,
           list(s::DOUBLE / (n * 1000000)::DOUBLE ORDER BY pos) AS v
    FROM {name}_m GROUP BY lst
  ) nc ON nc.idx = {prev_c}.idx
)"""

    parts = [f"""corpus AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
  FROM embeddings
), train AS (
  -- mirror of similarity.train_ivf_centroids' geometry filter: null,
  -- NaN/Inf, and beyond-quantization-domain vectors train nothing
  SELECT vec_id, v FROM corpus
  WHERE v IS NOT NULL
    AND len(list_filter(v, x -> isnan(x) OR abs(x) >= 1e12)) = 0
), micro AS (
  SELECT vec_id,
         list_transform(v, x -> CAST(CAST(x AS DECIMAL(18,6)) * 1000000 AS BIGINT)) AS m
  FROM train
), c0 AS (
  SELECT ROW_NUMBER() OVER (ORDER BY md5(vec_id::VARCHAR), vec_id) - 1 AS idx, v
  FROM (SELECT vec_id, v FROM train
        ORDER BY md5(vec_id::VARCHAR), vec_id LIMIT {nlist})
)"""]
    prev = "c0"
    for it in range(1, iters + 1):
        parts.append(assign(prev, f"a{it}"))
        parts.append(update(f"a{it}", prev, f"c{it}"))
        prev = f"c{it}"
    # the FINAL assignment probes the whole corpus (weird vectors score
    # NULL and stay unassigned — exactly Spark's assign_ivf_lists)
    parts.append(assign(prev, "af", src="corpus"))
    parts.append(f"""q AS (
  SELECT vec_id AS query_id, v AS qv FROM corpus WHERE vec_id < {qmax}
), qs AS (
  SELECT q.query_id, q.qv, {prev}.idx,
         {_cos_sql('q.qv', f'{prev}.v', dim)} AS cos
  FROM q, {prev}
), qp AS (
  SELECT query_id, qv, idx FROM (
    SELECT query_id, qv, idx,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY cos DESC, idx ASC) AS rn
    FROM qs
  ) WHERE rn <= {nprobe}
), scored AS (
  SELECT qp.query_id, af.vec_id,
         {_cos_sql('corpus.v', 'qp.qv', dim)} AS cos
  FROM qp JOIN af ON af.lst = qp.idx
  JOIN corpus ON corpus.vec_id = af.vec_id
)""")
    return ("WITH " + ",\n".join(parts) + f"""
SELECT query_id, vec_id, cos, rnk FROM (
  SELECT query_id, vec_id, cos,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, vec_id ASC) AS rnk
  FROM scored
) WHERE rnk <= {k}
""")


@register("ivf_cosine_topk", _ivf_sql(nlist=10, nprobe=3))
def ivf_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF scale path: centroid-bucketed ANN, nprobe=3 of nlist=10 lists
    scored per query. Oracle-checked end to end INCLUDING the k-means
    training (exact-integer Lloyd updates reproduce bit-for-bit in SQL
    — see _ivf_sql); recall vs brute force pinned in
    tests/test_similarity.py."""
    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding")
    return similarity.ivf_topk(emb, queries, k=10, nlist=10, nprobe=3,
                               kmeans_iters=2)


@register("ivf_indexed_topk", _ivf_sql(nlist=16, nprobe=4))
def ivf_indexed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disk-backed IVF: build the partitioned index, probe with
    partition-pruned scans. Same oracle as the inline IVF at these
    params (the index roundtrip must not change a single bit of the
    answer — also pinned in tests/test_similarity.py)."""
    import tempfile

    from imp_etl_spark.operators.similarity import (
        build_ivf_index,
        ivf_topk_indexed,
    )

    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding")
    path = tempfile.mkdtemp(prefix="ivf_idx_") + "/index"
    build_ivf_index(emb, path, nlist=16, kmeans_iters=2)
    return ivf_topk_indexed(spark, path, queries, k=10, nprobe=4)


def _near_dup_sql(planes: int = 8, dim: int = 64,
                  threshold: float = 0.99) -> str:
    bucket = _srp_bucket_sql("v", planes, dim)
    probes = ", ".join(["bkt0"]
                       + [f"xor(bkt0, {1 << p})" for p in range(planes)])
    return f"""
WITH base AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
  FROM embeddings
), planted AS (
  SELECT vec_id + 1000000 AS vec_id,
         list_transform(range(1, {dim + 1}),
             i -> v[i] + 0.01 * (CASE WHEN (i - 1) % 2 = 1
                                      THEN 1.0 ELSE -1.0 END)) AS v
  FROM base
), corpus AS (
  SELECT * FROM base UNION ALL SELECT * FROM planted
), bk AS (
  SELECT vec_id, v, {bucket} AS bkt0 FROM corpus
), aprobe AS (
  SELECT vec_id, v, UNNEST([{probes}]) AS bkt FROM bk
), pairs AS (
  SELECT a.vec_id AS id_a, c.vec_id AS id_b,
         {_cos_sql('a.v', 'c.v', dim)} AS cos
  FROM aprobe a JOIN bk c ON c.bkt0 = a.bkt AND a.vec_id < c.vec_id
)
SELECT id_a, id_b, cos FROM pairs WHERE cos >= {threshold}
"""


@register("embedding_near_dup", _near_dup_sql())
def embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via SRP buckets with
    Hamming-1 multi-probe — fully oracle-checked (shared plane matrix,
    identical fold order; see _srp_bucket_sql). The fixture vectors are
    near-random (no organic pairs at cos>=0.99), so the query plants one
    deterministically-perturbed copy per vector (alternating ±0.01 per
    dimension, cos~0.999 — portable arithmetic, no RNG) and detects the
    planted pairs — measured recall table in SCALING.md."""
    emb = read_table(spark, sf_dir, "embeddings")
    planted = emb.select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: x + 0.01 * F.when(
                i % 2 == 1, F.lit(1.0)).otherwise(F.lit(-1.0))
        ).alias("embedding"))
    corpus = emb.select("vec_id", "embedding").unionByName(planted)
    return similarity.embedding_near_dup_pairs(corpus, threshold=0.99,
                                               dim=64, planes=8,
                                               probe_bits=1)


@register("simhash_docs", f"""
WITH {_simhash_ctes(32)}
SELECT doc_id, sim AS simhash FROM sims
""")
def simhash_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash (32-bit) per document, md5 compat mode — the signature
    computation (one md5 per token, integer bit votes) is reproduced
    bit-for-bit by the SQL oracle. Production corpora can flip to the
    ~3x-cheaper xxhash64 token hash; only the hash primitive differs."""
    docs = read_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        simhash(tokens(F.col("text")), bits=32,
                hash_fn="md5").alias("simhash"))


@register("multimodal_frame_sample", """
SELECT doc_id AS media_id,
       CAST(f AS BIGINT) AS frame_no,
       CAST(f * 64 AS BIGINT) AS byte_offset
FROM (
  SELECT doc_id,
         unnest(generate_series(
           0, least(strlen(text) // 64, 7))) AS f
  FROM documents WHERE doc_id < 200
)
""")
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing over opaque media payloads (video shape):
    byte-offset samples via pure built-ins, no codec required. Oracle
    recomputes the offsets from the payload byte length (frames every
    64 bytes, capped at 8)."""
    from imp_etl_spark.operators.multimodal import attach_media, frame_sample

    docs = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    media = attach_media(docs, "text", "video", "raw", "doc_id")
    return frame_sample(media, every_n_bytes=64, max_frames=8).select(
        "media_id",
        F.col("frame_no").cast("long").alias("frame_no"),
        F.col("byte_offset").cast("long").alias("byte_offset"))


def _simhash_near_dup_sql(bits: int = 48, max_hamming: int = 6,
                          bands: int = 8, cap: int = 256) -> str:
    block_bits = bits // bands
    mask = (1 << block_bits) - 1
    band_list = ", ".join(str(b) for b in range(bands))
    return f"""
WITH {_simhash_ctes(bits)},
banded AS (
  SELECT doc_id, sim AS fullsig, b.band AS band,
         (sim >> (b.band * {block_bits})) & {mask} AS sig
  FROM sims, UNNEST([{band_list}]) AS b(band)
),
{_banded_pair_sql(cap, fullsig=True)}
SELECT DISTINCT id_a, id_b,
       CAST(bit_count(xor(fs_a, fs_b)) AS BIGINT) AS hamming
FROM rawpairs
WHERE bit_count(xor(fs_a, fs_b)) <= {max_hamming}
"""


@register("simhash_near_dup", _simhash_near_dup_sql())
def simhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash hamming-ball near-dup pairs via pigeonhole banding
    (operators/dedup.py) in md5 compat mode — signatures, banded
    bucket join, degenerate-bucket cap AND hamming re-check are all
    reproduced by the SQL oracle. Exact recall vs brute force is pinned
    in tests/test_similarity.py."""
    from imp_etl_spark.operators.dedup import simhash_near_dup_pairs

    docs = read_table(spark, sf_dir, "documents")
    # the operator persists its banded-signature frame (r12); hand the
    # handle to the dedup tier's tracker so long-lived drivers release
    # it with the other staged pair-table artifacts
    rel: list[DataFrame] = []
    out = simhash_near_dup_pairs(docs, "text", "doc_id",
                                 bits=48, max_hamming=6, bands=8,
                                 hash_fn="md5", release=rel)
    with _DEDUP_PERSISTS_LOCK:
        _DEDUP_PERSISTS.extend(rel)
    return out


@register("multimodal_features", """
SELECT doc_id AS media_id,
       CAST(CASE WHEN doc_id % 2 = 0
            THEN 54 + ((((1 + doc_id % 64) * 3 + 3) // 4) * 4) * (1 + doc_id % 48)
            ELSE 44 + 2 * (100 + doc_id % 50) END AS BIGINT) AS n_bytes,
       CASE WHEN doc_id % 2 = 0 THEN 'bmp' ELSE 'wav' END AS format_detected,
       CAST(CASE WHEN doc_id % 2 = 0 THEN 1 + doc_id % 64 END AS INT) AS width,
       CAST(CASE WHEN doc_id % 2 = 0 THEN 1 + doc_id % 48 END AS INT) AS height,
       CAST(CASE WHEN doc_id % 2 = 0 THEN 24 ELSE 16 END AS INT) AS bit_depth,
       CAST(CASE WHEN doc_id % 2 = 1 THEN 1 END AS INT) AS channels,
       CAST(CASE WHEN doc_id % 2 = 1 THEN 8000 END AS INT) AS sample_rate_hz,
       CASE WHEN doc_id % 2 = 1
            THEN CAST(100 + doc_id % 50 AS DOUBLE) / CAST(8000 AS DOUBLE)
            END AS duration_s
FROM documents WHERE doc_id < 256
""")
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL multimodal decode, oracle-checked: synthesize genuine BMP/WAV
    containers distributively (operators/multimodal.synthesize_media —
    dims are closed-form in doc_id), then parse the actual file headers
    back via Arrow-batched mapInPandas (decode_media). The oracle
    recomputes the expected header fields (incl. BMP 4-byte row stride
    and WAV duration = samples/rate) directly from the id formulas — so a
    green row proves the writer AND the parser agree with the spec. The
    byte-histogram feature column is exercised in tests; dropped here
    (array columns aren't driver-hashable)."""
    from imp_etl_spark.operators.multimodal import (
        extract_features,
        synthesize_media,
    )

    docs = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 256)
    media = synthesize_media(docs, "doc_id")
    return extract_features(media).drop("features")


@register("split_train_counts", """
SELECT CASE WHEN doc_id % 100 < 80 THEN 'train'
            WHEN doc_id % 100 < 90 THEN 'val'
            ELSE 'test' END AS split,
       COUNT(*) AS docs,
       CAST(SUM(n_chars) AS BIGINT) AS chars
FROM documents
GROUP BY split
""")
def split_train_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment (operators/sampling.py
    split_by_mod, the SQL-portable mirror of split_by_hash) rolled up to
    per-split volume — the narrow, shuffle-free split a training job
    reads."""
    from imp_etl_spark.operators.sampling import split_by_mod

    docs = read_table(spark, sf_dir, "documents")
    return (
        split_by_mod(docs, "doc_id",
                     {"train": 0.8, "val": 0.1, "test": 0.1}, buckets=100)
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("docs"), F.sum("n_chars").alias("chars"))
    )


_MD5_BUCKET_SQL = ("('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT"
                   " % 10000")


@register("split_hash_counts", f"""
SELECT CASE WHEN b < 8000 THEN 'train'
            WHEN b < 9000 THEN 'val'
            ELSE 'test' END AS split,
       COUNT(*) AS docs
FROM (SELECT {_MD5_BUCKET_SQL} AS b FROM documents)
GROUP BY split
""")
def split_hash_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production split path: id-hash-bucketed assignment (stable under
    retries/appends, uncorrelated with id order), in md5 compat mode so
    the bucket arithmetic is oracle-checked. xxhash64 is the cheaper
    production default (identical split structure; determinism,
    disjointness and proportion bounds pinned in tests/test_sampling.py
    for both hashes)."""
    from imp_etl_spark.operators.sampling import split_by_hash

    docs = read_table(spark, sf_dir, "documents")
    return (
        split_by_hash(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1},
                      hash_fn="md5")
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("docs"))
    )


@register("stratified_sample_langs", f"""
SELECT lang, COUNT(*) AS docs
FROM documents
WHERE {_MD5_BUCKET_SQL} <
      CASE lang WHEN 'en' THEN 2000 ELSE 10000 END
GROUP BY lang
""")
def stratified_sample_langs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-rebalanced corpus sample: downsample the dominant
    stratum (en at 20%), keep the rest — via the DETERMINISTIC
    per-stratum hash predicate (mixture_sample, md5 compat mode), so the
    kept set is a pure function of row identity (retry/append-stable)
    AND oracle-checked. The seeded-Bernoulli ``stratified_sample``
    (sampleBy) stays available for API parity; its rate bounds are
    pinned in tests/test_sampling.py."""
    from imp_etl_spark.operators.sampling import mixture_sample

    docs = read_table(spark, sf_dir, "documents")
    sampled = mixture_sample(
        docs, "lang", "doc_id",
        {"en": 0.2, "de": 1.0, "fr": 1.0, "es": 1.0, "zh": 1.0},
        method="md5", default=1.0)  # keep langs unseen at config time
        # whole — the oracle's ELSE branch; only the dominant stratum
        # is downsampled
    return sampled.groupBy("lang").agg(F.count(F.lit(1)).alias("docs"))


@register("chunk_documents", """
SELECT doc_id, i AS chunk_id, substr(text, i * 224 + 1, 256) AS chunk
FROM (
  SELECT doc_id, text,
         unnest(generate_series(0,
             GREATEST(1, CAST(CEIL((LENGTH(text) - 32) / 224.0) AS INT)) - 1
         )) AS i
  FROM documents
)
""")
def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-window chunking (functions/text.py chunk_array:
    256-char windows, 32 overlap) exploded to one row per chunk — the
    narrow, UDF-free pre-tokenization pass."""
    from imp_etl_spark.functions.text import chunk_array

    docs = read_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.posexplode(chunk_array("text", 256, 32)).alias("chunk_id", "chunk"),
    ).select("doc_id", F.col("chunk_id").cast("long"), "chunk")


@register("mixture_by_source", """
SELECT source, COUNT(*) AS docs, CAST(SUM(n_chars) AS BIGINT) AS chars
FROM documents
WHERE doc_id % 100 < CASE source
    WHEN 'src0' THEN 100 WHEN 'src1' THEN 50 WHEN 'src2' THEN 25
    ELSE 0 END
GROUP BY source
""")
def mixture_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic corpus mixture (operators/sampling.py
    mixture_sample, mod method — the SQL-portable mirror of the xxhash64
    path): keep src0 whole, src1 at 50%, src2 at 25%, drop the rest."""
    from imp_etl_spark.operators.sampling import mixture_sample

    docs = read_table(spark, sf_dir, "documents")
    return (
        mixture_sample(docs, "source", "doc_id",
                       {"src0": 1.0, "src1": 0.5, "src2": 0.25},
                       method="mod", buckets=100)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("docs"), F.sum("n_chars").alias("chars"))
    )


# ---------------------------------------------------------------------------
# PII scrubbing + repetition quality rules (training-pipeline stages)
# ---------------------------------------------------------------------------

@register("pii_redact_docs", r"""
SELECT doc_id,
  regexp_replace(regexp_replace(regexp_replace(
     text || ' Contact user' || doc_id || '@example.com or +1 555-01'
          || (doc_id % 100) || ' at 10.0.0.' || (doc_id % 256) || '.',
     '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
     '\+?[0-9][0-9\- ]{7,}[0-9]', '<PHONE>', 'g'),
     '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g')
   AS redacted
FROM documents
""")
def pii_redact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing (functions/text.pii_redact): plant a deterministic
    email + phone + IPv4 per document (the fixture text has no organic
    PII), then redact with typed placeholders. The oracle chains the
    identical regexes with DuckDB's 'g' flag — a green row pins that the
    Java and RE2 engines agree on these patterns byte-for-byte."""
    from imp_etl_spark.functions.text import pii_redact

    docs = read_table(spark, sf_dir, "documents")
    planted = F.concat(
        F.col("text"), F.lit(" Contact user"),
        F.col("doc_id").cast("string"), F.lit("@example.com or +1 555-01"),
        (F.col("doc_id") % 100).cast("string"), F.lit(" at 10.0.0."),
        (F.col("doc_id") % 256).cast("string"), F.lit("."))
    return docs.select("doc_id", pii_redact(planted).alias("redacted"))


@register("text_quality_gopher", """
WITH t AS (
  SELECT doc_id,
         list_filter(string_split(text, chr(10)), x -> x <> '') AS lines,
         list_filter(string_split_regex(lower(text), '\\s+'),
                     x -> x <> '') AS toks
  FROM documents
)
SELECT doc_id,
  CASE WHEN len(lines) > 0
       THEN CAST(len(lines) - len(list_distinct(lines)) AS DOUBLE)
            / CAST(len(lines) AS DOUBLE) ELSE 0.0 END AS dup_line_frac,
  CASE WHEN len(lines) > 0
       THEN CAST(len(list_filter(lines,
              x -> starts_with(x, '-') OR starts_with(x, '*'))) AS DOUBLE)
            / CAST(len(lines) AS DOUBLE) ELSE 0.0 END AS bullet_line_frac,
  CASE WHEN len(toks) > 0
       THEN CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
            / CAST(len(toks) AS DOUBLE) ELSE 0.0 END AS mean_word_len
FROM t
""")
def text_quality_gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition/shape quality rules from published LLM data-quality
    filters (duplicate-line fraction, bullet-line fraction, mean word
    length). All counts are exact integers; each ratio is ONE IEEE
    division of exact operands -> bit-equal across engines."""
    from imp_etl_spark.functions.text import (
        bullet_line_fraction,
        dup_line_fraction,
        tokens,
    )

    docs = read_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    sum_len = F.aggregate(toks, F.lit(0).cast("long"),
                          lambda acc, t: acc + F.length(t))
    mean_wl = F.when(
        F.size(toks) > 0,
        sum_len.cast("double") / F.size(toks).cast("double")
    ).otherwise(F.lit(0.0))
    return docs.select(
        "doc_id",
        dup_line_fraction("text").alias("dup_line_frac"),
        bullet_line_fraction("text").alias("bullet_line_frac"),
        mean_wl.alias("mean_word_len"),
    )


@register("pack_sequences", f"""
WITH w AS (
  SELECT doc_id, doc_id % 32 AS shard,
         len({_DUCK_TOKS}) AS n_tok
  FROM documents
), c AS (
  SELECT shard, doc_id, n_tok,
         SUM(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
                          ROWS UNBOUNDED PRECEDING) AS cum
  FROM w
)
SELECT shard, CAST(FLOOR((cum - n_tok) / 512.0) AS BIGINT) AS bin,
       COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS tokens,
       MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
FROM c GROUP BY shard, bin
""")
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing (operators/sampling.pack_greedy): documents
    packed into 512-token bins per deterministic shard — the
    batch-construction step of an LLM training pipeline. The oracle
    recomputes the same running-sum bin assignment; exact integer
    counts make the rollup hash-stable."""
    from imp_etl_spark.operators.sampling import pack_greedy

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", token_count("text").alias("n_tok"))
    packed = pack_greedy(docs, "doc_id", "n_tok", budget=512, shards=32)
    return packed.groupBy("shard", "bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )
