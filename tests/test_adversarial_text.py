"""Adversarial-text differential: every documents-only oracle query runs
on Spark AND DuckDB over a corpus of edge-case texts — empty, whitespace,
CJK/RTL/emoji/astral unicode, zero-width and C0 control characters, huge
single tokens, exact and near duplicates — and must match value-for-value.

This is the driver's correctness gate pointed at the content a real crawl
actually serves. It found (round 5): contentless docs sharing the ""
MinHash band signature (every empty page paired with every other),
Spark/DuckDB disagreeing on zero-token ratio semantics in text_stats, and
`mixture_sample` dropping strata its config never named while the oracle
kept them.
"""

from __future__ import annotations

import os
import re

import pytest

from imp_etl_spark import schemas
from imp_etl_spark.queries import REGISTRY
from tests.test_oracle import _rows

ADVERSARIAL_TEXTS = [
    "",                                     # empty
    "   \t\n  ",                            # whitespace only
    # TWO more contentless docs with NO 0x20 at the edges (r6 advice):
    # trim() strips only ASCII space, so tab/newline-only text passed
    # the old zero-shingle filter and reached minhash with an empty
    # shingle list — and the failure mode (every contentless doc
    # band-collides with every other via the sentinel signature) only
    # SURFACES when at least two such docs exist to pair. One
    # whitespace doc in this corpus was why round 5's sweep missed it.
    "\t",                                   # tab only
    "\n\r\f",                               # newline/CR/FF only
    "héllo wörld çafé naïve résumé",        # latin diacritics
    "你好世界 测试 文本 数据",               # CJK
    "\U0001f389\U0001f38a party \U0001f389 emoji\U0001f680text",
    "مرحبا بالعالم هذا نص عربي",            # RTL
    "éclair créme",             # combining accents
    "a​b‌c zero‍width",      # zero-width chars
    "line1\nline2\r\nline3\ttab\tsep",      # control whitespace
    "nbsp separated words",       # non-breaking space
    "!!! ??? ... ;;; ---",                  # punctuation only
    "12345 67890 3.14159 -42 1e10",         # numerics
    "quote\"d 'single' \\back\\slash\\",    # quotes + backslashes
    "\U0001d518\U0001d52b\U0001d526\U0001d520\U0001d52c\U0001d521"
    "\U0001d522 \U0001d55e\U0001d552\U0001d565\U0001d559 astral "
    "\U00010348 plane",                     # astral-plane codepoints
    "x" * 10000,                            # one huge token
    ("repeat me " * 2000).strip(),          # long repetitive doc
    "The quick brown fox jumps over the lazy dog. " * 3,
    "The quick brown fox jumps over the lazy dog. " * 3,  # exact dup
    "The quick brown fox jumps over the lazy dog! " * 3,  # near dup
    "short",
    "ALLCAPS SHOUTING TEXT HERE",
    "MiXeD CaSe wEiRd TeXt",
    "email test@example.com phone 555-123-4567 ssn 123-45-6789",
    "\x01low\x02control\x03chars\x04",      # C0 control bytes
]

_OTHER_TABLES = ["region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem", "events", "embeddings"]

# every oracle query whose SQL touches only the documents table
DOC_ONLY = [
    n for n, (_f, s) in REGISTRY.items()
    if s is not None and "documents" in s.lower()
    and not any(re.search(rf"\b{t}\b", s.lower()) for t in _OTHER_TABLES)
]


@pytest.fixture(scope="module")
def adv_sf_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("sf_adv")
    rows = [
        (i + 1, t, ["en", "zh", "ar", "und"][i % 4],
         ["web", "books", "code"][i % 3], len(t))
        for i, t in enumerate(ADVERSARIAL_TEXTS)
    ]
    spark.createDataFrame(rows, schemas.FIXTURE_TABLES["documents"]) \
        .write.mode("overwrite").parquet(
            os.path.join(str(d), "documents.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def adv_duck(adv_sf_dir):
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{adv_sf_dir}/documents.parquet/*.parquet')")
    return con


def test_doc_only_queries_cover_the_text_tier():
    # the filter above is a heuristic — pin that it keeps catching the
    # operators this suite exists for
    for must in ("text_stats", "minhash_lsh_pairs", "dedup_exact_content",
                 "pii_redact_docs", "chunk_documents", "pack_sequences"):
        assert must in DOC_ONLY


@pytest.mark.parametrize("name", DOC_ONLY)
def test_query_matches_oracle_on_adversarial_text(spark, adv_duck,
                                                  adv_sf_dir, name):
    fn, sql = REGISTRY[name]
    sdf = fn(spark, adv_sf_dir)
    rel = adv_duck.sql(sql)
    duck_cols = [c.lower() for c in rel.columns]
    spark_rows = [
        tuple(row[c] for c in duck_cols)
        for row in (r.asDict() for r in sdf.collect())
    ]
    duck_rows = [tuple(r) for r in rel.fetchall()]
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}")
    sn, dn = _rows(spark_rows), _rows(duck_rows)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(sn, dn)) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:5]}"


def test_case_folding_engine_boundary(spark):
    """Pin the documented lower() boundary (SEMANTICS.md): the JVM does
    full-Unicode, context-sensitive lowercasing while DuckDB's utf8proc
    does simple folding. The two known disagreement points are Turkish
    dotted capital I and word-final Greek capital sigma; everything
    else probed (sharp S, ligatures, titlecase digraphs, IJ) agrees.
    This test exists so the SEMANTICS.md claim stays honest: if either
    engine changes behavior, it fails and the doc gets updated —
    and it documents WHY fixtures exclude U+0130 and Greek capitals."""
    import duckdb

    from pyspark.sql import functions as F

    cases = {
        # text: (spark_expected, duck_expected) — DIFFER
        "İ": ("i̇", "i"),
        "ΣΑΣ": ("σας", "σασ"),
        # text: same on both engines — the boundary is NARROW
        "ẞ": ("ß", "ß"),
        "ﬁ": ("ﬁ", "ﬁ"),
        "ǅ": ("ǆ", "ǆ"),
        "IJ": ("ij", "ij"),
    }
    # upper() diverges wherever the FULL uppercase is multi-char: the
    # JVM expands, utf8proc stays 1:1 — hence the wider fixture
    # exclusion list for upper()-touching queries (cleanse,
    # string_funcs_suite)
    upper_cases = {
        "straße": ("STRASSE", "STRAẞE"),
        "ﬁle": ("FILE", "ﬁLE"),
        "ŉoo": ("ʼNOO", "ŉOO"),
        "é è ç": ("É È Ç", "É È Ç"),   # 1:1 Latin-1 — SAME
        "ǆungla": ("Ǆungla".upper(), "ǄUNGLA"),  # titlecase digraph — SAME
    }
    sdf = spark.createDataFrame(
        [(t,) for t in {**cases, **upper_cases}], "t string").select(
        "t", F.lower("t").alias("lo"), F.upper("t").alias("up"))
    got = {r["t"]: (r["lo"], r["up"]) for r in sdf.collect()}
    con = duckdb.connect()
    for t, (want_s, want_d) in cases.items():
        got_d = con.execute("SELECT lower(?)", [t]).fetchone()[0]
        assert got[t][0] == want_s, (t, got[t][0])
        assert got_d == want_d, (t, got_d)
    for t, (want_s, want_d) in upper_cases.items():
        got_d = con.execute("SELECT upper(?)", [t]).fetchone()[0]
        assert got[t][1] == want_s, (t, got[t][1])
        assert got_d == want_d, (t, got_d)
