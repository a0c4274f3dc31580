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

from imp_etl_spark.queries import register
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
       CAST(l_quantity AS BIGINT) % 7 AS qty_mod,
       greatest(l_discount, l_tax) AS max_rate,
       least(l_discount, l_tax) AS min_rate,
       CAST(sign(l_discount - 0.05) AS DOUBLE) AS disc_sign,
       CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT) AS qty_sq
FROM lineitem WHERE l_orderkey < 200
""")
def math_funcs_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-on-doubles math family (abs/ceil/floor/round/mod/greatest/
    least/sign — no libm, so bit-identical across engines)."""
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
