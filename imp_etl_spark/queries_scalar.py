"""Scalar-function suites (registered into queries.REGISTRY).

The reference's scalar surface is upper/trim/regex/parseFloat/Date only
(SURVEY.md §2.5 'not present' list); a usable engine needs the full
string/date/math families. Each suite exercises a batch of functions
whose semantics are IDENTICAL in Spark and DuckDB so the oracle pins
them exactly. Transcendentals (sqrt/ln/exp/pow) are deliberately kept
OUT of oracle-checked output: both engines delegate to their platform
libm, which may differ in the last ulp — they're exercised rows-only.

All pure narrow projections: no shuffle, full whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from imp_etl_spark.registry import register
from imp_etl_spark.sources.parquet import read_table


@register("string_funcs_suite", """
SELECT c_custkey,
       levenshtein(c_name, 'Customer#000000042') AS lev,
       split_part(c_name, '#', 2) AS cust_no,
       lpad(CAST(c_custkey AS VARCHAR), 9, '0') AS padded,
       translate(c_mktsegment, 'AEIOU', 'aeiou') AS lowered_vowels,
       substring(c_name, 1, 8) AS prefix,
       reverse(c_mktsegment) AS seg_rev,
       concat_ws('|', c_mktsegment, CAST(c_nationkey AS VARCHAR)) AS seg_nat,
       length(c_name) AS name_len,
       replace(c_name, 'Customer', 'Cust') AS short_name,
       position('#' IN c_name) AS hash_pos
FROM customer
""")
def string_funcs_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.levenshtein("c_name", F.lit("Customer#000000042")).alias("lev"),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(2)).alias("cust_no"),
        F.lpad(F.col("c_custkey").cast("string"), 9, "0").alias("padded"),
        F.translate("c_mktsegment", "AEIOU", "aeiou").alias("lowered_vowels"),
        F.substring("c_name", 1, 8).alias("prefix"),
        F.reverse("c_mktsegment").alias("seg_rev"),
        F.concat_ws("|", "c_mktsegment",
                    F.col("c_nationkey").cast("string")).alias("seg_nat"),
        F.length("c_name").alias("name_len"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust"))
        .alias("short_name"),
        F.instr("c_name", "#").cast("bigint").alias("hash_pos"),
    )


@register("date_funcs_suite", """
SELECT o_orderkey,
       date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since,
       last_day(CAST(o_orderdate AS DATE)) AS month_end,
       CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
       o_orderdate + INTERVAL 7 DAY AS plus_week,
       EXTRACT(year FROM o_orderdate) AS yr,
       EXTRACT(month FROM o_orderdate) AS mth,
       EXTRACT(day FROM o_orderdate) AS dom,
       dayofweek(CAST(o_orderdate AS DATE)) + 1 AS dow,
       CAST(strftime(o_orderdate, '%Y-%m') AS VARCHAR) AS ym
FROM orders WHERE o_orderkey < 500
""")
def date_funcs_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date arithmetic/extraction family. Conventions aligned explicitly:
    DuckDB dayofweek is 0=Sunday, Spark's is 1=Sunday — the oracle adds
    1 rather than hiding the difference."""
    o = read_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    return o.select(
        "o_orderkey",
        F.datediff(F.col("o_orderdate").cast("date"),
                   F.lit("1995-01-01").cast("date")).cast("bigint")
        .alias("days_since"),
        F.last_day(F.col("o_orderdate")).alias("month_end"),
        F.date_trunc("month", F.col("o_orderdate")).cast("date")
        .alias("month_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 7 DAYS")).alias("plus_week"),
        F.year("o_orderdate").cast("bigint").alias("yr"),
        F.month("o_orderdate").cast("bigint").alias("mth"),
        F.dayofmonth("o_orderdate").cast("bigint").alias("dom"),
        F.dayofweek(F.col("o_orderdate")).cast("bigint").alias("dow"),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
    )


@register("math_funcs_suite", """
SELECT l_orderkey, l_linenumber,
       abs(l_discount - 0.05) AS disc_dev,
       CAST(ceil(l_extendedprice) AS DOUBLE) AS price_ceil,
       CAST(floor(l_extendedprice) AS DOUBLE) AS price_floor,
       round(l_discount + l_tax, 3) AS rate_sum,
       CAST(trunc(l_quantity) AS BIGINT) % 7 AS qty_mod,
       greatest(l_discount, l_tax) AS max_rate,
       least(l_discount, l_tax) AS min_rate,
       CAST(sign(l_discount - 0.05) AS DOUBLE) AS disc_sign,
       CAST(trunc(l_quantity) AS BIGINT)
         * CAST(trunc(l_quantity) AS BIGINT) AS qty_sq
FROM lineitem WHERE l_orderkey < 200
""")
def math_funcs_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-on-doubles math family (abs/ceil/floor/round/mod/greatest/
    least/sign — no libm, so bit-identical across engines). The
    double->BIGINT cast TRUNCATES toward zero (Spark semantics; DuckDB's
    bare cast rounds to nearest, so the oracle states trunc())."""
    li = read_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 200)
    return li.select(
        "l_orderkey", "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.ceil("l_extendedprice").cast("double").alias("price_ceil"),
        F.floor("l_extendedprice").cast("double").alias("price_floor"),
        # round() on a post-division double hits representation-dependent
        # .5 ties (engines disagree on 1033.215); rate sums stay far from
        # rounding boundaries, so this stays bit-portable
        F.round(F.col("l_discount") + F.col("l_tax"), 3).alias("rate_sum"),
        (F.col("l_quantity").cast("bigint") % 7).alias("qty_mod"),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
        F.least("l_discount", "l_tax").alias("min_rate"),
        F.signum(F.col("l_discount") - 0.05).alias("disc_sign"),
        (F.col("l_quantity").cast("bigint")
         * F.col("l_quantity").cast("bigint")).alias("qty_sq"),
    )


@register("math_transcendental", None)
def math_transcendental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sqrt/ln/exp/pow — rows-only (platform libm may differ in the last
    ulp between engines; values are still deterministic per engine)."""
    li = read_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 200)
    return li.select(
        "l_orderkey", "l_linenumber",
        F.sqrt("l_extendedprice").alias("price_sqrt"),
        F.log(F.col("l_extendedprice")).alias("price_ln"),
        F.exp(F.col("l_discount")).alias("disc_exp"),
        F.pow(F.col("l_quantity"), F.lit(1.5)).alias("qty_pow"),
    )


@register("null_cond_suite", """
SELECT c_custkey,
       coalesce(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_or_other,
       CASE WHEN c_acctbal < 0 THEN 'neg'
            WHEN c_acctbal < 5000 THEN 'mid'
            ELSE 'high' END AS bal_band,
       CASE WHEN c_nationkey % 2 = 0 THEN NULL ELSE c_nationkey END AS odd_nation,
       ifnull(CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END, 0.0) AS bal_nonneg,
       (c_acctbal IS NULL) AS bal_is_null,
       (c_acctbal IS NOT DISTINCT FROM 0.0) AS bal_is_zero
FROM customer
""")
def null_cond_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-handling + conditional family: coalesce/nullif/ifnull, CASE
    chains, null-safe equality (<=> / IS NOT DISTINCT FROM)."""
    c = read_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")),
                   F.lit("OTHER")).alias("seg_or_other"),
        F.when(F.col("c_acctbal") < 0, "neg")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("high").alias("bal_band"),
        F.when(F.col("c_nationkey") % 2 == 0, F.lit(None).cast("bigint"))
        .otherwise(F.col("c_nationkey")).alias("odd_nation"),
        F.ifnull(F.when(F.col("c_acctbal") < 0, F.lit(None).cast("double"))
                 .otherwise(F.col("c_acctbal")), F.lit(0.0))
        .alias("bal_nonneg"),
        F.isnull("c_acctbal").alias("bal_is_null"),
        F.col("c_acctbal").eqNullSafe(F.lit(0.0)).alias("bal_is_zero"),
    )


@register("regex_funcs_suite", r"""
SELECT doc_id,
       regexp_extract(text, '([0-9]+)', 1) AS first_number,
       regexp_replace(text, '[0-9]+', '#', 'g') AS numberless,
       regexp_matches(text, '[A-Z][a-z]+') AS has_capitalized,
       len(regexp_extract_all(text, '([a-zA-Z]{5,})', 1)) AS long_words,
       (text LIKE '%the%') AS has_the,
       regexp_matches(text, '[.!?]\z') AS ends_sentence
FROM documents WHERE doc_id % 10 = 0
""")
def regex_funcs_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex family over documents (conservative syntax — identical
    semantics in Java regex and RE2).

    End anchoring is the one place "conservative" needs care (fuzz
    seed 2018, round 9): Java's ``$`` matches BEFORE a final line
    terminator while RE2's does not, and ``SIMILAR TO`` is implicitly
    anchored so its ``.*`` prefix cannot cross an embedded newline —
    a text like ``'line\\nbreak .'`` made the two sides disagree in
    BOTH directions. ``\\z`` (end of text, no newline quirk) means the
    same thing in both engines, so ends_sentence is exactly "the last
    character is sentence punctuation" everywhere; curated regression
    in test_adversarial_text.py."""
    docs = read_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 10 == 0)
    return docs.select(
        "doc_id",
        F.regexp_extract("text", r"([0-9]+)", 1).alias("first_number"),
        F.regexp_replace("text", r"[0-9]+", "#").alias("numberless"),
        F.col("text").rlike(r"[A-Z][a-z]+").alias("has_capitalized"),
        F.size(F.regexp_extract_all("text", F.lit(r"([a-zA-Z]{5,})"), 1))
        .cast("bigint").alias("long_words"),
        F.col("text").like("%the%").alias("has_the"),
        # \z, not $: see docstring — Java's $ accepts a trailing
        # newline after the punctuation, RE2's does not
        F.col("text").rlike(r"[.!?]\z").alias("ends_sentence"),
    )


from imp_etl_spark.queries_sqlfrag import DUCK_TOKS as _DUCK_TOKS  # noqa: E402


@register("hof_array_suite", f"""
WITH toks AS (
  SELECT doc_id, {_DUCK_TOKS} AS t FROM documents WHERE doc_id % 20 = 0
)
SELECT doc_id,
       COALESCE(array_to_string(list_transform(t[1:4], x -> upper(x)),
                                '|'), '') AS head_upper,
       COALESCE(array_to_string(list_filter(t, x -> length(x) > 4),
                                '|'), '') AS long_toks,
       len(list_filter(t, x -> length(x) > 4)) > 0 AS has_long,
       len(list_filter(t, x -> length(x) <= 20)) = len(t) AS all_short,
       list_reduce(list_prepend(0, list_transform(t, x -> length(x))),
                   (a, b) -> a + b) AS char_total,
       COALESCE(array_to_string(list_sort(list_distinct(t[1:7])), '|'),
                '') AS head_vocab
FROM toks
""")
def hof_array_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions: transform/filter/exists/forall/
    aggregate/slice/distinct — all codegen lambdas, zero UDFs. The array
    results are '|'-serialized for the comparison surface (the driver's
    pandas canonicalizer can't hash Python lists — same treatment as
    nested_types_suite); the HOF pipeline itself still runs on real
    arrays."""
    from imp_etl_spark.functions.text import tokens

    docs = read_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 20 == 0)
    t = tokens(F.col("text"))
    return docs.select(
        "doc_id",
        F.array_join(F.transform(F.slice(t, 1, 4), lambda x: F.upper(x)), "|")
        .alias("head_upper"),
        F.array_join(F.filter(t, lambda x: F.length(x) > 4), "|")
        .alias("long_toks"),
        F.exists(t, lambda x: F.length(x) > 4).alias("has_long"),
        F.forall(t, lambda x: F.length(x) <= 20).alias("all_short"),
        F.aggregate(t, F.lit(0).cast("bigint"),
                    lambda acc, x: acc + F.length(x)).alias("char_total"),
        F.array_join(F.array_sort(F.array_distinct(F.slice(t, 1, 7))), "|")
        .alias("head_vocab"),
    )
