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
    # fuzz seed 2018 (round 9): sentence punctuation at end-of-text
    # with an EMBEDDED newline earlier, and punctuation followed by a
    # trailing newline — the two end-anchor divergence shapes (Java $
    # matches before a final line terminator, RE2 $ does not; SIMILAR
    # TO is implicitly anchored so its .* cannot cross a newline)
    "of and the .. the xy line\nbreak ; data in .",
    "ends with punct then newline.\n",
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


def test_regex_end_anchor_engine_boundary(spark, tmp_path):
    """Curated regression for fuzz seed 2018 (round 9): 'ends with
    sentence punctuation' must mean the same thing in Java regex and
    RE2. Java's ``$`` (no MULTILINE) matches before a FINAL line
    terminator; RE2's ``$`` matches only at end of text; ``SIMILAR
    TO`` is implicitly anchored, so a ``.*`` prefix cannot cross an
    embedded newline — three different answers for texts like
    ``'line\\nbreak .'`` (old oracle said False, Spark said True) and
    ``'abc.\\n'`` (Java True, RE2 False). The portable anchor is
    ``\\z`` — end of text in BOTH engines — which regex_funcs_suite
    now uses on both sides. Every row here passes the query's
    ``doc_id % 10 = 0`` gate so the whole class is exercised."""
    import os as _os

    import duckdb

    texts = [
        "of and the .. the xy line\nbreak ; data in .",  # the finding
        "abc.",           # plain end punct — True
        "abc.\n",         # punct then trailing newline — False (\z)
        "a\nb?",          # embedded newline, ends with punct — True
        "!\n!",           # punct both sides of a newline — True
        "no punct",       # False
        "\n",             # newline only — False
        "",               # empty — False
    ]
    d = tmp_path / "sf_anchor"
    rows = [((i + 1) * 10, t, "en", "web", len(t))
            for i, t in enumerate(texts)]
    spark.createDataFrame(rows, schemas.FIXTURE_TABLES["documents"]) \
        .write.mode("overwrite").parquet(
            _os.path.join(str(d), "documents.parquet"))
    fn, sql = REGISTRY["regex_funcs_suite"]
    got_s = {r["doc_id"]: r["ends_sentence"]
             for r in fn(spark, str(d)).collect()}
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{d}/documents.parquet/*.parquet')")
    got_d = {r[0]: r[6] for r in con.sql(sql).fetchall()}
    want = {(i + 1) * 10: t.endswith((".", "!", "?"))
            for i, t in enumerate(texts)}
    assert got_s == want, got_s
    assert got_d == want, got_d


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


def test_string_order_and_reverse_engine_boundary(spark):
    """Pin two proactively-probed string boundaries (SEMANTICS.md "Text").

    1. ORDER BY / comparison on strings AGREES across engines — both
       compare raw UTF-8 bytes. This is NOT automatic: java.lang.String
       compares UTF-16 code units, under which surrogate pairs (astral
       chars, 0xD800-0xDFFF units) sort BELOW the high-BMP block
       [U+E000, U+FFFF], the exact opposite of UTF-8 byte order. Spark
       is safe only because Tungsten's UTF8String stores and compares
       UTF-8 bytes directly — so this pin exists to catch any future
       collation/config change that re-routes comparison through Java
       semantics. The probe set straddles the trap: U+E000/U+F8FF/
       U+FFFD (3-byte UTF-8, high UTF-16 units) vs U+10000/U+1F389
       (4-byte UTF-8, surrogate UTF-16 units).

    2. reverse() DIVERGES by engine design: Spark reverses code points
       (UTF8String.reverse), DuckDB reverses extended grapheme
       clusters — so any multi-code-point cluster (combining marks,
       ZWJ emoji, conjoining jamo) comes out different: the JVM splits
       the cluster (combining mark migrates to the PRECEDING char),
       utf8proc keeps it intact. ASCII and astral-without-combining
       agree (a pair surrogate is one code point, not two). The
       registry's only reverse() (string_funcs_suite, queries_scalar)
       sits on c_mktsegment, ASCII in the testdata and in both fixture
       pools — this test documents WHY that column must stay
       grapheme-cluster-free rather than it being an accident.
    """
    import duckdb

    from pyspark.sql import functions as F

    con = duckdb.connect()

    # -- 1. sort order: agreement, including across the UTF-16 trap
    strs = ["abc", "znormal", "森", "\uE000", "\uF8FF", "\uFFFD",
            "\U00010000", "\U0001F389", "", "a\U0001F389", "a\uFFFD"]
    got_s = [r.s for r in spark.createDataFrame(
        [(x,) for x in strs], "s string").orderBy("s").collect()]
    got_d = [r[0] for r in con.execute(
        "SELECT s FROM (VALUES " + ",".join("(?)" for _ in strs)
        + ") t(s) ORDER BY s", strs).fetchall()]
    assert got_s == got_d, (got_s, got_d)
    # the UTF-16 ordering WOULD have flipped these two:
    assert got_s.index("\uFFFD") < got_s.index("\U0001F389")

    # -- 2. reverse(): divergence on clusters, agreement off them
    cases = {
        # text: (spark_expected = code-point reverse,
        #        duck_expected  = grapheme reverse)
        "xe\u0301y": ("y\u0301ex", "ye\u0301x"),        # combining acute
        "\u1100\u1161\u11A8z": ("z\u11A8\u1161\u1100",  # conjoining jamo
                                "z\u1100\u1161\u11A8"),
        "\U0001F468\u200D\U0001F469k": (                # ZWJ family
            "k\U0001F469\u200D\U0001F468",
            "k\U0001F468\u200D\U0001F469"),
        # same on both engines — the boundary is cluster-only
        "abc": ("cba", "cba"),
        "a\U0001F389b": ("b\U0001F389a", "b\U0001F389a"),
        "森林x": ("x林森", "x林森"),
    }
    got = {r["t"]: r["rev"] for r in spark.createDataFrame(
        [(t,) for t in cases], "t string").select(
        "t", F.reverse("t").alias("rev")).collect()}
    for t, (want_s, want_d) in cases.items():
        assert got[t] == want_s, (t, got[t].encode("unicode_escape"))
        d = con.execute("SELECT reverse(?)", [t]).fetchone()[0]
        assert d == want_d, (t, d.encode("unicode_escape"))
