"""Shared DuckDB-oracle SQL fragments.

Leaf module (imports only from ``functions``): ``queries_llm`` and
``queries_corpus`` both need these at module level, and hosting them in
either file makes direct imports of the other order-dependent
(``queries.py`` late-imports every query module, so importing
``queries_llm`` first used to re-enter it partially initialized via
``queries_corpus``). One tokenization expression shared by BOTH sides of
the differential: the Spark plans use ``functions.text.tokens``, the
oracles use ``DUCK_TOKS`` — they must stay semantically identical.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from imp_etl_spark.functions.text import LANG_MARKERS

#: DuckDB equivalent of functions/text.tokens: lowercase whitespace split
#: with empties dropped.
# COALESCE: NULL text tokenizes to an empty list on both engines (null
# text ≡ no content — SEMANTICS.md; functions/text.tokens mirrors this)
DUCK_TOKS = ("COALESCE(list_filter(string_split_regex(lower(text), "
             "'\\s+'), x -> x <> ''), [])")


def lang_sql() -> str:
    """Oracle for the marker-word language-ID heuristic
    (functions/text.lang_id): per-language marker hit counts, argmax
    with the same tie order, 'und' when nothing matches."""
    score_cols = []
    for lang in sorted(LANG_MARKERS):
        words = "[" + ",".join(f"'{w}'" for w in LANG_MARKERS[lang]) + "]"
        score_cols.append(
            f"len(list_filter(t, x -> list_contains({words}, x))) AS c_{lang}")
    langs = sorted(LANG_MARKERS)
    gre = "greatest(" + ",".join(f"c_{la}" for la in langs) + ")"
    case = " ".join(f"WHEN c_{la} = {gre} THEN '{la}'" for la in langs)
    return f"""
WITH toks AS (SELECT doc_id, lang, {DUCK_TOKS} AS t FROM documents),
sc AS (SELECT doc_id, lang, {', '.join(score_cols)} FROM toks)
SELECT doc_id, lang AS lang_label,
       CASE WHEN {gre} = 0 THEN 'und' {case} END AS lang_pred
FROM sc
"""


def dec_sum(col, alias, scale=2):
    """SUM over exact decimals, surfaced as double — the shared
    oracle-determinism rule (queries.py module doc): both engines sum
    DECIMAL(18,scale) exactly, then one IEEE conversion."""
    return F.sum(col.cast(f"decimal(18,{scale})")).cast("double").alias(alias)
