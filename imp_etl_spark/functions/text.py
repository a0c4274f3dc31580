"""Text-analysis Column functions (north-star ops, SURVEY.md §7.8).

All JVM-side built-ins — no Python UDFs — so they stay inside whole-stage
codegen and scale linearly with input bytes. Each has a deliberately
portable formulation so the DuckDB oracle can express the same semantics
(lambda/list functions exist on both engines).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Small marker-word lists for the n-gram/stopword language heuristic.
# (Public-knowledge stopwords; deliberately tiny — the heuristic is the
# operator shape, not a production model.)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "a"],
    "es": ["el", "la", "de", "que", "y", "los", "una"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein"],
    "fr": ["le", "la", "les", "des", "est", "une", "dans"],
}

EN_STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "on", "for", "with",
    "is", "are", "was", "be", "this", "that", "it", "as", "at", "by",
]


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization, lowercased, empty tokens dropped.

    NULL text tokenizes to an EMPTY list (null text ≡ no content,
    SEMANTICS.md): without the coalesce, a null array reaches every
    downstream fold with engine-dependent results — Spark's aggregate()
    returns NULL where DuckDB's list_reduce over a prepended seed
    returns the seed."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(
        F.filter(F.split(F.lower(c), r"\s+"), lambda t: t != ""),
        F.array().cast("array<string>"))


def bpe_ish_tokens(col: Column | str) -> Column:
    """Sub-word-ish tokenization: split on word/number/punct boundaries
    with a BPE-flavoured regex (letters runs, digit runs, single
    non-space punctuation)."""
    c = F.col(col) if isinstance(col, str) else col
    # NULL text tokenizes to an empty list — same contract as tokens()
    return F.coalesce(
        F.filter(
            F.regexp_extract_all(
                F.lower(c), F.lit(r"([a-z]+|[0-9]+|[^a-z0-9\s])"), 1),
            lambda t: t != "",
        ),
        F.array().cast("array<string>"))


def token_count(col: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(tokens(col))


def stopword_ratio(col: Column | str, stopwords: list[str] | None = None) -> Column:
    """Fraction of tokens that are (English) stopwords."""
    sw = F.array(*[F.lit(w) for w in (stopwords or EN_STOPWORDS)])
    toks = tokens(col)
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return F.when(F.size(toks) > 0, hits / F.size(toks)).otherwise(F.lit(0.0))


def punct_ratio(col: Column | str) -> Column:
    """Fraction of characters that are punctuation-ish."""
    c = F.col(col) if isinstance(col, str) else col
    total = F.length(c)
    punct = F.length(F.regexp_replace(c, r"[^.,;:!?'\"()\[\]{}-]", ""))
    return F.when(total > 0, punct / total).otherwise(F.lit(0.0))


def mean_token_len(col: Column | str) -> Column:
    toks = tokens(col)
    return F.when(
        F.size(toks) > 0,
        F.aggregate(toks, F.lit(0).cast("double"),
                    lambda acc, t: acc + F.length(t)) / F.size(toks),
    ).otherwise(F.lit(0.0))


def quality_score(col: Column | str) -> Column:
    """Composite heuristic quality score in [0, 1].

    0.4 * length-band + 0.3 * stopword presence + 0.3 * (1 - punct
    excess). Not a model — a deterministic, oracle-checkable shape for the
    'quality scoring' pipeline stage.

    Quantized to 6dp with PURE IEEE ops — ``floor(x*1e6 + 0.5)/1e6`` —
    not ``round(x, 6)``: both engines compute the raw double
    bit-identically (same IEEE ops on the same integer counts, same
    order), but their round() implementations diverge on exact decimal
    ties (Spark half-ups the shortest decimal repr via BigDecimal;
    DuckDB scales the double, where a true tie like 0.5051625 sits just
    below .5 and floors). Found by fuzz seed 224 — the score's inputs
    are ratios of small integers, which land on exact 7-digit ties at a
    rate ordinary money values never do. floor(x*1e6+0.5) is the same
    ROUNDING RULE stated in the double domain, so both engines get the
    identical bit pattern on every input, ties included."""
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c).cast("double")
    len_band = F.least(n / F.lit(500.0), F.lit(1.0))
    sw = F.least(stopword_ratio(c) * 4, F.lit(1.0))
    punct_pen = F.greatest(F.lit(1.0) - punct_ratio(c) * 5, F.lit(0.0))
    raw = 0.4 * len_band + 0.3 * sw + 0.3 * punct_pen
    return F.floor(raw * F.lit(1000000.0) + F.lit(0.5)) / F.lit(1000000.0)


def lang_scores(col: Column | str) -> dict[str, Column]:
    """Marker-word hit counts per language (the lang-ID signal)."""
    toks = tokens(col)
    out = {}
    for lang, words in LANG_MARKERS.items():
        arr = F.array(*[F.lit(w) for w in words])
        out[lang] = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
    return out


def lang_id(col: Column | str) -> Column:
    """Pick the language with the highest marker count (ties: language
    name ascending; zero hits everywhere -> 'und')."""
    scores = lang_scores(col)
    pairs = F.array(*[
        F.struct(scores[lang].alias("score"), F.lit(lang).alias("lang"))
        for lang in sorted(scores)
    ])
    # take the max score, then the alphabetically-first language among the
    # entries holding that score (deterministic tie-break)
    max_score = F.array_max(F.transform(pairs, lambda p: p["score"]))
    winner = F.array_min(F.transform(
        F.filter(pairs, lambda p: p["score"] == max_score),
        lambda p: p["lang"],
    ))
    return F.when(max_score > 0, winner).otherwise(F.lit("und"))


def fingerprint64(col: Column | str) -> Column:
    """Deterministic 64-bit document fingerprint.

    Rolling polynomial hash over whitespace tokens: acc*31 + token_hash,
    in long arithmetic (wraps on overflow, deterministically). Token hash
    is the first 8 hex chars of md5 — portable, so the DuckDB oracle can
    reproduce it bit-for-bit.
    """
    toks = tokens(col)
    return F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: acc * F.lit(31).cast("long")
        + F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long"),
    )


def chunk_array(col: Column | str, size: int, overlap: int) -> Column:
    """Split a document into fixed-``size`` character windows that
    overlap by ``overlap`` — the pre-tokenization chunking step of an
    LLM training pipeline. Returns ``array<string>``; pair with
    ``posexplode`` for (chunk_id, chunk) rows.

    Pure Column arithmetic (sequence + transform + substring): row-local
    and codegen'd, no UDF, no shuffle — each 100 TB scan task chunks its
    own rows in place. Chunk i covers [i*step, i*step+size) with
    step = size - overlap; every character lands in >=1 chunk and short
    docs yield exactly one chunk.
    """
    if not 0 <= overlap < size:
        raise ValueError(f"need 0 <= overlap < size, got {overlap}/{size}")
    c = F.col(col) if isinstance(col, str) else col
    step = size - overlap
    n = F.greatest(
        F.lit(1),
        F.ceil((F.length(c) - F.lit(overlap)) / F.lit(step)).cast("int"))
    return F.transform(
        F.sequence(F.lit(0), n - F.lit(1)),
        lambda i: F.substring(c, i * F.lit(step) + F.lit(1), size))


# --- PII scrubbing (training-pipeline stage: redact before training) ----

#: (pattern, replacement) pairs, applied in order. Email first so its
#: digits can't be half-eaten by the phone rule; the phone charset has no
#: dots so IPv4s survive for their own rule. Patterns stick to the regex
#: subset that Java (Spark) and RE2 (DuckDB) interpret identically, so
#: the op is oracle-checkable.
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\+?[0-9][0-9\- ]{7,}[0-9]", "<PHONE>"),
    (r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
]


def pii_redact(col: Column | str) -> Column:
    """Redact emails, phone-ish number runs, and IPv4 literals with
    typed placeholder tokens. Chained regexp_replace — codegen'd,
    linear in input bytes, no UDF."""
    c = F.col(col) if isinstance(col, str) else col
    for pat, repl in PII_PATTERNS:
        c = F.regexp_replace(c, pat, repl)
    return c


# --- Repetition signals (Gopher-style quality rules) --------------------

def dup_line_fraction(col: Column | str) -> Column:
    """Fraction of non-empty lines that are duplicates of an earlier
    line — the 'duplicate line fraction' filter from published LLM
    data-quality rules. Exact integer counts -> one IEEE division, so
    the value is bit-equal across engines."""
    c = F.col(col) if isinstance(col, str) else col
    lines = F.filter(F.split(c, "\n"), lambda ln: ln != "")
    n = F.size(lines)
    return F.when(
        n > 0, (n - F.size(F.array_distinct(lines))) / n
    ).otherwise(F.lit(0.0))


def bullet_line_fraction(col: Column | str) -> Column:
    """Fraction of non-empty lines starting with a bullet marker."""
    c = F.col(col) if isinstance(col, str) else col
    lines = F.filter(F.split(c, "\n"), lambda ln: ln != "")
    n = F.size(lines)
    bullets = F.size(F.filter(
        lines, lambda ln: ln.startswith("-") | ln.startswith("*")))
    return F.when(n > 0, bullets / n).otherwise(F.lit(0.0))
