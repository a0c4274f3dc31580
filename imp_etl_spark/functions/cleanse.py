"""Cleanse operators T1-T7 (SURVEY.md §2.5) as pure Column functions.

The reference implements these as row-at-a-time JavaScript in
``processVoucherData`` (``services/etlService.js:118-156``) and
``processTransactionData`` (``:259-297``). Here each rule is a Column
expression that stays inside whole-stage codegen — no Python UDFs.

Bug-compat quirks (SURVEY.md §2.9) are preserved behind ``compat=True``
(the default is *clean* semantics; the ETL pipeline plan passes
``compat=True`` for reference parity):

- Q1: ``parseFloat(x) || null`` nulls out zero *and* NaN, and parseFloat
  prefix-parses (``"12abc"`` -> 12.0).
- Q2: JS-falsy key check drops empty-string keys (and 0 for numerics) in
  addition to NULLs.
- Q3: the string ``"0"`` is truthy in JS, so ``ishold="0"`` coerces to 1.
- Q4: date normalization truncates to the *UTC* calendar day
  (``new Date(x).toISOString().split('T')[0]``), so a +08:00 datetime can
  shift one day backward. We pin the session timezone to UTC in
  ``session.get_spark`` so ``to_timestamp`` + ``date_format`` reproduce it.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

# JS parseFloat prefix grammar (sign, decimal, exponent), after leading
# whitespace. Infinity is omitted (never occurs in the reference's data).
_PARSEFLOAT_RE = r"^[+-]?(\d+\.?\d*([eE][+-]?\d+)?|\.\d+([eE][+-]?\d+)?)"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def upper_trim(col: Column | str) -> Column:
    """T1 — uppercase+trim, applied only to non-empty strings.

    JS guard: ``if (v && typeof v === 'string')`` (etlService.js:138-142)
    — NULL and ``''`` pass through untouched; whitespace-only strings are
    truthy and collapse to ``''``.
    """
    c = _c(col)
    return F.when(c.isNotNull() & (c != ""), F.trim(F.upper(c))).otherwise(c)


def enum_domain(col: Column | str, domain: Sequence[str]) -> Column:
    """T2 — normalize then validate against a closed domain.

    Mirrors the ``sex`` rule (etlService.js:120-127): falsy -> NULL;
    otherwise ``String(x).toUpperCase().trim()`` and NULL unless it lands
    in the domain.
    """
    c = _c(col).cast("string")
    s = F.trim(F.upper(c))
    return (
        F.when(c.isNull() | (c == ""), F.lit(None).cast("string"))
        .when(s.isin(*list(domain)), s)
        .otherwise(F.lit(None).cast("string"))
    )


def parse_float(col: Column | str, compat: bool = True) -> Column:
    """T3 — numeric coercion.

    compat=True replicates ``parseFloat(x) || null``
    (etlService.js:143-147, 261-265): prefix-parse (``"12abc"`` -> 12.0),
    and a result of 0 or NaN becomes NULL (quirk Q1 — ``"0.00"`` -> NULL).
    compat=False is the clean engine default: ``try_cast(double)``.
    """
    c = _c(col).cast("string")
    if not compat:
        return c.try_cast("double")
    stripped = F.regexp_replace(c, r"^\s+", "")
    prefix = F.regexp_extract(stripped, _PARSEFLOAT_RE, 0)
    parsed = F.when(prefix != "", prefix.cast("double"))
    return F.when(parsed.isNull() | (parsed == 0.0) | F.isnan(parsed),
                  F.lit(None).cast("double")).otherwise(parsed)


def zero_null(col: Column | str) -> Column:
    """T3/Q1 on an already-numeric column: ``x || null`` -> NULLIF(x, 0)."""
    c = _c(col)
    return F.nullif(c, F.lit(0).cast("double"))


def date_norm_utc(col: Column | str) -> Column:
    """T4 — normalize any date-ish value to a UTC ``yyyy-MM-dd`` string.

    Mirrors ``new Date(x).toISOString().split('T')[0]``
    (etlService.js:148-154, 276-282): parse (offset-aware; naive treated
    as UTC, matching a TZ=UTC node container), truncate to the UTC
    calendar day, else NULL. Requires session timezone UTC for string
    inputs carrying offsets (quirk Q4); timestamp-typed inputs are
    timezone-free.
    """
    c = _c(col)
    ts = F.coalesce(
        F.try_to_timestamp(c.cast("string")),
        F.try_to_timestamp(c.cast("string"),
                           F.lit("yyyy-MM-dd'T'HH:mm:ss[.SSS]XXX")),
        F.try_to_timestamp(c.cast("string"), F.lit("yyyy/MM/dd")),
    )
    return F.date_format(ts, "yyyy-MM-dd")


def char_flag(col: Column | str) -> Column:
    """T5 — ``'1'`` stays ``'1'``, anything else (incl. NULL) -> ``'0'``
    (etlService.js:267-269)."""
    c = _c(col)
    return F.when(c == "1", F.lit("1")).otherwise(F.lit("0"))


def truthy_int(col: Column | str, compat: bool = True,
               numeric: bool = False) -> Column:
    """T6 — JS truthiness -> 1/0 (etlService.js:270-274).

    JS falsiness depends on the runtime type the MySQL driver hands over:
    TINYINT columns arrive as numbers (``0`` is falsy -> 0), VARCHAR
    columns as strings (only ``''`` is falsy — the string ``"0"`` coerces
    to 1, quirk Q3). A Column expression can't branch on runtime type, so
    callers pass ``numeric=True`` for statically-numeric columns
    (``cleanse_transaction`` inspects the frame's dtypes; schemas.py
    declares ishold/isremove/isretransact as INT, matching the TINYINTs).

    compat=False is the clean-engine rule: any parseable zero ("0",
    "0.0", 0) -> 0 regardless of type.
    """
    c = _c(col)
    s = c.cast("string")
    if compat:
        if numeric:
            falsy = c.isNull() | (c == 0)          # JS number falsiness
        else:
            falsy = c.isNull() | (s == "")         # JS string falsiness (Q3)
    else:
        falsy = c.isNull() | (s == "") | (c.try_cast("double") == 0.0)
    return F.when(falsy, F.lit(0)).otherwise(F.lit(1))


def string_cast(col: Column | str) -> Column:
    """T7 — explicit string cast (etlService.js:121)."""
    return _c(col).cast("string")


def falsy_key(col: Column | str, numeric: bool = False) -> Column:
    """P4/P5/Q2 predicate — True when a key is 'missing' under JS falsiness
    (etlService.js:65-75, 206-216): NULL or ``''`` (strings), NULL or 0
    (numerics). Note the string ``"0"`` is a *valid* key.
    """
    c = _c(col)
    if numeric:
        return c.isNull() | (c == 0)
    return c.isNull() | (c.cast("string") == "")


def any_falsy_key(cols: Sequence[Column | str], numeric: bool = False) -> Column:
    """Disjunction of `falsy_key` over a composite key."""
    pred = falsy_key(cols[0], numeric)
    for c in cols[1:]:
        pred = pred | falsy_key(c, numeric)
    return pred


# Field lists from the reference, so the pipeline plan can apply rules to
# exactly the columns the reference touches (etlService.js:128-137 and
# :286-291; the transaction list de-duplicated — the original repeats four
# names, a no-op).
VOUCHER_UPPER_FIELDS = [
    "first_name", "middle_name", "last_name", "ext_name",
    "mother_maiden", "birth_place", "reg_desc", "prv_desc",
    "mun_desc", "brgy_desc", "seed_class", "rrp_fertilizer_kind",
    "voucher_status", "encode_agency", "encoded_by_fullname",
    "cancelled_by_fullname", "voucher_remarks", "batch_code",
    "if_4ps", "if_ip", "if_pwd", "voucher_season", "reg_desc_farm",
    "prv_desc_farm", "mun_desc_farm", "brgy_desc_farm", "cropname",
    "agri_input", "variety", "unit", "cluster_org_assc",
]
VOUCHER_NUMERIC_FIELDS = ["farm_area", "amount", "amount_val", "crop_area"]
VOUCHER_DATE_FIELDS = ["birthday", "scanned_date", "date_cancelled",
                       "date_restored"]

TXN_UPPER_FIELDS = [
    "unit_type", "return_status", "item_category", "item_sub_category",
    "item_category_remarks", "transac_by_fullname", "removed_by_name",
    "additional_info", "remarks",
]
TXN_NUMERIC_FIELDS = ["quantity", "amount", "total_amount", "cash_added",
                      "latitude", "longitude"]
TXN_DATE_FIELDS = ["transac_date", "payout_date", "date_hold",
                   "date_removed"]
TXN_BOOL_FIELDS = ["ishold", "isremove", "isretransact"]


def manila_iso(col: Column | str) -> Column:
    """T10 — Asia/Manila wall-clock ISO rendering with explicit +08:00
    offset (``utils/logger.js:22-42``; variant ``etlService.js:593-605``).
    Input is the engine's UTC-pinned NTZ event time; Manila has no DST,
    so the offset is the constant the reference hardcodes."""
    c = _c(col)
    return F.date_format(c + F.expr("INTERVAL 8 HOURS"),
                         "yyyy-MM-dd'T'HH:mm:ss.SSS'+08:00'")


def duration_hms(col: Column | str) -> Column:
    """T11 — milliseconds -> "Xh Ym Zs" (``index.js:39-44``).

    Truncating division throughout: identical to the floor formulation
    for the reference's non-negative runtimes, and for a negative input
    (clock skew) every component truncates toward zero consistently —
    the old mix of float floor and sign-of-dividend remainder
    double-counted the hour on negatives. ``(ms - ms % b)`` is an exact
    multiple of ``b`` (Spark's ``%`` carries the dividend sign), and
    the division runs in DECIMAL(38,0), never touching a double — so
    the hour component is exact over the FULL long domain, not just
    |ms| <= 2^53 (the old float path silently lost precision above
    that)."""
    ms = _c(col).cast("long")

    def tdiv(a: Column, b: int) -> Column:
        # long-only truncating divide: numerator is a multiple of b, so
        # the decimal quotient is an integer and the cast is lossless
        return ((a - a % b).cast("decimal(38,0)") / b).cast("long")

    # NULL in, NULL out — format_string would otherwise render the
    # literal text "nullh nullm nulls" for a missing duration
    return F.when(ms.isNull(), F.lit(None).cast("string")).otherwise(
        F.format_string(
            "%dh %dm %ds",
            tdiv(ms, 3_600_000),
            tdiv(ms % 3_600_000, 60_000),
            tdiv(ms % 60_000, 1_000),
        ))
