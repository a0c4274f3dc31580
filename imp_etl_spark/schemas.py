"""Explicit schemas for every table the engine touches.

The reference infers its in-flight schema from the first row of each batch
(``services/etlService.js:38,179`` — quirk Q7 in SURVEY.md §2.9) and keeps
its target schema in two ``CREATE TABLE IF NOT EXISTS`` DDLs
(``services/etlService.js:300-374`` for ``voucher``, ``:376-413`` for
``voucher_transaction``). We declare all of it up front as ``StructType``s:
schema-on-read inference never runs in a production path.

Type mapping rationale (SURVEY.md §1.2): VARCHAR/TEXT/ENUM -> StringType
(domain rules live in ``functions.cleanse``), DECIMAL(p,s) ->
DecimalType(p,s) at rest (the reference coerces to float in flight — quirk
Q1 — handled in cleanse, not here), TINYINT -> IntegerType, ZEROFILL is a
display attribute only, DATETIME/TIMESTAMP/DATE -> TimestampType/DateType.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DateType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
    TimestampType,
)


def _struct(*fields: tuple) -> StructType:
    return StructType([StructField(n, t, nullable=True) for n, t in fields])


S = StringType()
I = IntegerType()
L = LongType()
D = DoubleType()
TS = TimestampType()
# Fixture timestamps are naive parquet values; NTZ makes every downstream
# date/format function timezone-free, so results match the DuckDB oracle
# regardless of the driver session's timezone.
TN = TimestampNTZType()
DT = DateType()

# ---------------------------------------------------------------------------
# Reference tables (DDL parity: services/etlService.js:300-374, 376-413;
# work queue columns: models/EtlLogger.js:8)
# ---------------------------------------------------------------------------

#: Work queue / changelog. `table` is kept verbatim (reserved-word column —
#: the reference backticks it; Spark is fine with it quoted via col("`table`")).
ETL_LOGGER_VOUCHER = _struct(
    ("log_id", L),
    ("reference_no", S),
    ("table", S),
)

#: 70-column entity table (services/etlService.js:300-374). Composite PK
#: (voucher_id, reference_no); key order matters for the upsert sink.
VOUCHER = _struct(
    ("voucher_id", S),
    ("rsbsa_no", S),
    ("control_no", S),
    ("reference_no", S),
    ("program_id", S),
    ("fund_id", S),
    ("fund_desc", S),
    ("type", S),
    ("first_name", S),
    ("middle_name", S),
    ("last_name", S),
    ("ext_name", S),
    ("sex", S),                      # ENUM('MALE','FEMALE') -> domain rule T2
    ("birthday", S),                 # VARCHAR(12) holding a date -> T4
    ("birth_place", S),
    ("mother_maiden", S),
    ("contact_no", S),
    ("civil_status", I),             # TINYINT(1)
    ("geo_code", S),
    ("reg", I),                      # TINYINT(2) UNSIGNED ZEROFILL
    ("reg_desc", S),
    ("prv", I),
    ("prv_desc", S),
    ("mun", I),
    ("mun_desc", S),
    ("brgy", I),                     # SMALLINT(3) UNSIGNED ZEROFILL
    ("brgy_desc", S),
    ("farm_area", DecimalType(10, 4)),
    ("seed_class", S),
    ("sub_project", I),
    ("rrp_fertilizer_kind", S),
    ("amount", DecimalType(11, 2)),
    ("amount_val", DecimalType(11, 2)),
    ("voucher_status", S),
    ("encode_agency", S),
    ("encoded_by_id", S),
    ("cancelled_by_id", S),
    ("encoded_by_fullname", S),
    ("cancelled_by_fullname", S),
    ("is_scanned", S),               # ENUM('1','0')
    ("scanned_date", TS),
    ("date_cancelled", TS),
    ("last_scanned_by_id", S),
    ("date_created", TS),            # TIMESTAMP DEFAULT CURRENT_TIMESTAMP
    ("voucher_remarks", S),
    ("batch_code", S),
    ("if_4ps", S),
    ("if_ip", S),
    ("if_pwd", S),
    ("voucher_season", S),
    ("reg_farm", I),
    ("reg_desc_farm", S),
    ("prv_farm", I),
    ("prv_desc_farm", S),
    ("mun_farm", I),
    ("mun_desc_farm", S),
    ("brgy_farm", I),
    ("brgy_desc_farm", S),
    ("cropname", S),
    ("agri_input", S),
    ("variety", S),
    ("unit", S),
    ("cluster_org_assc", S),
    ("year_funded", S),
    ("restored_by_id", S),
    ("restored_by_fullname", S),
    ("date_restored", TS),
    ("month_planting", S),
    ("crop_area", DecimalType(10, 4)),
)

VOUCHER_KEY = ["voucher_id", "reference_no"]

#: 32-column line-item table (services/etlService.js:376-413). Composite PK
#: (voucher_details_id, reference_no).
VOUCHER_TRANSACTION = _struct(
    ("voucher_details_id", S),
    ("transaction_id", S),
    ("reference_no", S),
    ("supplier_id", S),
    ("sub_program_id", S),
    ("fund_id", S),
    ("quantity", DecimalType(11, 2)),
    ("amount", DecimalType(11, 2)),
    ("total_amount", DecimalType(11, 2)),
    ("cash_added", DecimalType(11, 2)),
    ("unit_type", S),
    ("additional_info", S),          # MEDIUMTEXT, JSON-ish payloads
    ("latitude", DecimalType(10, 8)),
    ("longitude", DecimalType(11, 8)),
    ("transac_date", TS),
    ("transac_by_id", S),
    ("transac_by_fullname", S),
    ("payout", S),                   # ENUM('1','0') -> rule T5
    ("payout_date", TS),
    ("date_hold", DT),
    ("remarks", S),
    ("batch_id", S),
    ("ishold", I),                   # TINYINT(1) -> rule T6
    ("return_status", S),
    ("isremove", I),
    ("date_removed", TS),
    ("removed_by_id", S),
    ("removed_by_name", S),
    ("item_category", S),
    ("item_sub_category", S),
    ("item_category_remarks", S),
    ("isretransact", I),
)

VOUCHER_TRANSACTION_KEY = ["voucher_details_id", "reference_no"]

# ---------------------------------------------------------------------------
# Test-fixture tables (/root/testdata/sf*/..., schemas per FIXTURES.md §A)
# ---------------------------------------------------------------------------

REGION = _struct(("r_regionkey", I), ("r_name", S))
NATION = _struct(("n_nationkey", I), ("n_name", S), ("n_regionkey", I))
CUSTOMER = _struct(
    ("c_custkey", L), ("c_name", S), ("c_nationkey", I),
    ("c_acctbal", D), ("c_mktsegment", S),
)
SUPPLIER = _struct(
    ("s_suppkey", L), ("s_name", S), ("s_nationkey", I), ("s_acctbal", D),
)
PART = _struct(
    ("p_partkey", L), ("p_name", S), ("p_brand", S), ("p_type", S),
    ("p_size", I), ("p_retailprice", D),
)
ORDERS = _struct(
    ("o_orderkey", L), ("o_custkey", L), ("o_orderstatus", S),
    ("o_totalprice", D), ("o_orderdate", TN), ("o_orderpriority", S),
)
LINEITEM = _struct(
    ("l_orderkey", L), ("l_partkey", L), ("l_suppkey", L),
    ("l_linenumber", I), ("l_quantity", D), ("l_extendedprice", D),
    ("l_discount", D), ("l_tax", D), ("l_returnflag", S),
    ("l_linestatus", S), ("l_shipdate", TN),
)
EVENTS = _struct(
    ("event_id", L), ("ts", TN), ("user_id", L), ("event_type", S),
    ("value", D), ("props", S),
)
DOCUMENTS = _struct(
    ("doc_id", L), ("text", S), ("lang", S), ("source", S), ("n_chars", L),
)
EMBEDDINGS = _struct(
    ("vec_id", L), ("embedding", ArrayType(FloatType())), ("label", I),
)

FIXTURE_TABLES = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}
