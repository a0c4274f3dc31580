"""Driver-facing query registry.

Each entry maps one implemented operator (SURVEY.md §2 / §7.8) onto the
TPC-H-ish fixture tables (FIXTURES.md §A mapping: ``orders`` plays the
work queue, ``customer`` the entity table, ``lineitem`` the detail
table), paired with the ANSI-SQL oracle DuckDB runs on the same parquet.

Determinism rules (the driver hash-compares values):
- every aggregate/computed column is aliased identically on both sides;
- money/quantity aggregates go through DECIMAL casts
  (``SUM(CAST(x AS DECIMAL(18,2)))``) then one final cast to DOUBLE, so
  both engines do exact decimal arithmetic and one deterministic
  IEEE conversion — no float-summation-order flakiness;
- per-row float arithmetic (products, cosines) is identical IEEE ops on
  identical operands, hence bit-equal across engines;
- top-k orderings always carry a unique tie-break key.

``REGISTRY[name] = (spark_fn, oracle_sql_or_None)``; None means
non-SQL-expressible (streaming/stateful) -> driver runs rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from imp_etl_spark.functions import cleanse
from imp_etl_spark.functions.text import (
    lang_id,
    punct_ratio,
    quality_score,
    stopword_ratio,
    token_count,
)
from imp_etl_spark.functions.vector import cosine
from imp_etl_spark.operators import dedup, join, similarity
from imp_etl_spark.sources.parquet import read_table

QueryFn = Callable[[SparkSession, str], DataFrame]

REGISTRY: dict[str, tuple[QueryFn, str | None]] = {}


def register(name: str, sql: str | None):
    def deco(fn: QueryFn):
        REGISTRY[name] = (fn, sql)
        return fn
    return deco


def _dec_sum(col, alias, scale=2):
    """SUM over exact decimals, surfaced as double (see module doc)."""
    return F.sum(col.cast(f"decimal(18,{scale})")).cast("double").alias(alias)


# ---------------------------------------------------------------------------
# Flagship: pricing summary (TPC-H Q1 shape) — scan -> filter -> partial+
# final agg. One shuffle of (flag,status) groups only.
# ---------------------------------------------------------------------------

@register("q1_pricing_summary", """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""")
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dec_sum(F.col("l_quantity"), "sum_qty"),
            _dec_sum(F.col("l_extendedprice"), "sum_base_price"),
            _dec_sum(disc_price, "sum_disc_price", 6),
            _dec_sum(charge, "sum_charge", 6),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# S1/A1 — work-queue count with NOT NULL conjunction (EtlLogger.js:19-27)
# ---------------------------------------------------------------------------

@register("s1_workqueue_count", """
SELECT COUNT(*) AS total
FROM orders
WHERE o_custkey IS NOT NULL AND o_orderstatus IS NOT NULL
""")
def s1_workqueue_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_custkey").isNotNull() & F.col("o_orderstatus").isNotNull())
        .agg(F.count(F.lit(1)).alias("total"))
    )


# ---------------------------------------------------------------------------
# S2/O1/O2/P1 — paginated ordered scan (EtlLogger.js:6-17): project 3 cols,
# NOT NULL filter, total order on the log key, rows (offset, offset+limit].
# ---------------------------------------------------------------------------

@register("s2_paginated_scan", """
SELECT o_orderkey, o_custkey, o_orderstatus
FROM (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         ROW_NUMBER() OVER (ORDER BY o_orderkey ASC) AS rn
  FROM orders
  WHERE o_custkey IS NOT NULL AND o_orderstatus IS NOT NULL
)
WHERE rn > 100 AND rn <= 300
""")
def s2_paginated_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    filtered = o.filter(
        F.col("o_custkey").isNotNull() & F.col("o_orderstatus").isNotNull()
    ).select("o_orderkey", "o_custkey", "o_orderstatus")
    w = Window.orderBy(F.col("o_orderkey").asc())
    return (
        filtered.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") > 100) & (F.col("rn") <= 300))
        .drop("rn")
    )


# ---------------------------------------------------------------------------
# J1 — key-lookup join: entity rows for the deduped work-queue key set
# (etlService.js:446-449 as one broadcast semi join)
# ---------------------------------------------------------------------------

@register("j1_lookup_semi_join", """
SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
FROM customer
WHERE c_custkey IN (
  SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 150000
)
""")
def j1_lookup_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, sf_dir, "customer")
    keys = (
        read_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 150000)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return join.semi_prune(cust, keys, "c_custkey")


# ---------------------------------------------------------------------------
# J3 — missing-match detection (left anti): queue keys with no entity rows
# (etlService.js:452-471 'No voucher data found' warnings)
# ---------------------------------------------------------------------------

@register("j3_anti_missing", """
SELECT c_custkey, c_name
FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_custkey IS NOT NULL)
""")
def j3_anti_missing(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    orders = read_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return join.anti_missing(cust, orders, "c_custkey")


# ---------------------------------------------------------------------------
# J2 — composite-key existence semi join (the dead-code intent at
# etlService.js:25-34): lineitem rows whose (l_orderkey) exists among
# high-priority orders, on the two-column key shape (orderkey, linenumber)
# checked against itself after a filter.
# ---------------------------------------------------------------------------

@register("j2_exists_composite", """
SELECT l.l_orderkey, l.l_linenumber, l.l_quantity
FROM lineitem l
WHERE EXISTS (
  SELECT 1 FROM lineitem e
  WHERE e.l_quantity >= 45
    AND e.l_orderkey = l.l_orderkey AND e.l_suppkey = l.l_suppkey
)
""")
def j2_exists_composite(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    existing = li.filter(F.col("l_quantity") >= 45).select("l_orderkey", "l_suppkey")
    return join.exists_keys(
        li, existing, ["l_orderkey", "l_suppkey"]
    ).select("l_orderkey", "l_linenumber", "l_quantity")


# ---------------------------------------------------------------------------
# §2.7 — latest-per-key dedup (last-writer-wins before MERGE)
# ---------------------------------------------------------------------------

@register("dedup_latest_per_key", """
SELECT o_custkey, o_orderkey, o_totalprice
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderkey DESC) AS rn
  FROM orders
)
WHERE rn = 1
""")
def dedup_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_totalprice"
    )
    return dedup.latest_per_key(o, ["o_custkey"], ["o_orderkey"], desc=True)


# ---------------------------------------------------------------------------
# T1-T5 cleanse suite on fixture columns (FIXTURES.md family-A mapping)
# ---------------------------------------------------------------------------

@register("t_cleanse_suite", """
SELECT l_orderkey, l_linenumber,
       CASE WHEN l_returnflag IS NOT NULL AND l_returnflag <> ''
            THEN TRIM(UPPER(l_returnflag)) ELSE l_returnflag END AS flag_norm,
       CASE WHEN l_linestatus IS NULL OR l_linestatus = '' THEN NULL
            WHEN TRIM(UPPER(l_linestatus)) IN ('O','F') THEN TRIM(UPPER(l_linestatus))
            ELSE NULL END AS status_enum,
       NULLIF(l_discount, 0.0) AS discount_q1,
       STRFTIME(l_shipdate, '%Y-%m-%d') AS shipdate_iso,
       CASE WHEN l_returnflag = '1' THEN '1' ELSE '0' END AS flag_char
FROM lineitem
""")
def t_cleanse_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey", "l_linenumber",
        cleanse.upper_trim("l_returnflag").alias("flag_norm"),
        cleanse.enum_domain("l_linestatus", ["O", "F"]).alias("status_enum"),
        cleanse.zero_null("l_discount").alias("discount_q1"),
        F.date_format("l_shipdate", "yyyy-MM-dd").alias("shipdate_iso"),
        cleanse.char_flag("l_returnflag").alias("flag_char"),
    )


# ---------------------------------------------------------------------------
# O3/A7 — deterministic top-k
# ---------------------------------------------------------------------------

@register("topk_orders", """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 100
""")
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )


# ---------------------------------------------------------------------------
# A2/A3 — processed/skipped accounting as grouped counters: per queue key,
# how many detail rows are valid vs skipped under the falsy-key rule
# (P4/P5, etlService.js:65-75) — the {processed, skipped} contract.
# ---------------------------------------------------------------------------

@register("a2_processed_skipped", """
SELECT o_orderstatus,
       COUNT(*) AS total,
       COUNT(*) FILTER (WHERE o_custkey IS NOT NULL AND CAST(o_custkey AS VARCHAR) <> ''
                          AND o_orderkey IS NOT NULL AND CAST(o_orderkey AS VARCHAR) <> '') AS processed,
       COUNT(*) FILTER (WHERE o_custkey IS NULL OR CAST(o_custkey AS VARCHAR) = ''
                           OR o_orderkey IS NULL OR CAST(o_orderkey AS VARCHAR) = '') AS skipped
FROM orders
GROUP BY o_orderstatus
""")
def a2_processed_skipped(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    valid = ~cleanse.any_falsy_key(["o_custkey"]) & ~cleanse.falsy_key("o_orderkey")
    return o.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("total"),
        F.count(F.when(valid, 1)).alias("processed"),
        F.count(F.when(~valid, 1)).alias("skipped"),
    )
