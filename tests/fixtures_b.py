"""Family-B reference-shaped fixtures (FIXTURES.md §B): tiny frames
seeded with every quirk trigger from SURVEY.md §2.9."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

QUEUE_ROWS = [
    # (log_id, reference_no, table)
    (1, "REF-1", "voucher"),
    (2, "REF-1", "voucher_transaction"),   # duplicate reference
    (3, "REF-2", "voucher"),
    (4, None, "voucher"),                  # NULL ref -> dropped (P2)
    (5, "", "voucher"),                    # empty ref -> dropped (Q2/P6)
    (6, "REF-3", None),                    # NULL table -> dropped (P2)
    (7, "REF-GONE", "voucher"),            # no entity rows -> J3 warning
    (8, "REF-2", "voucher"),
]

VOUCHER_ROWS = [
    # (voucher_id, reference_no, first_name, sex, birthday, farm_area, amount,
    #  voucher_status)
    ("V1", "REF-1", "  juan  ", "male", "1990-05-07", "1.5000", "100.00", " active "),
    ("V2", "REF-1", "Maria", " FEMALE ", "1988-01-15T01:00:00+08:00", "0.00", "0", "done"),
    ("V3", "REF-2", "Jose", "M", "not-a-date", "12abc", "250.75", None),
    (None, "REF-2", "NoKey", "FEMALE", "2000-02-29", "3.25", "10", "x"),   # falsy key (P4)
    ("", "REF-2", "EmptyKey", "unknown", None, "", "", ""),                # falsy key (Q2)
    ("V1", "REF-1", "Juan Updated", "MALE", "1990-05-07", "2.0", "150", "active"),  # dup PK: latest wins
    ("V9", "REF-NOQ", "NotQueued", "MALE", "1990-01-01", "1.0", "5", "y"),  # not in queue
]

TXN_ROWS = [
    # (voucher_details_id, reference_no, quantity, payout, ishold, transac_date)
    ("T1", "REF-1", "2.00", "1", "0", "2024-03-01T20:00:00+08:00"),  # ishold '0' -> 1 (Q3)
    ("T2", "REF-1", "0", "2", "", "2024-03-02"),                      # qty 0 -> NULL (Q1)
    ("T3", "REF-2", "5.5", None, None, None),
    (None, "REF-2", "1", "1", "1", "2024-01-01"),                     # falsy key
]


def make_frames(spark: SparkSession) -> tuple[DataFrame, DataFrame, DataFrame]:
    queue = spark.createDataFrame(
        QUEUE_ROWS, "log_id long, reference_no string, `table` string")
    voucher = spark.createDataFrame(
        VOUCHER_ROWS,
        "voucher_id string, reference_no string, first_name string, sex string,"
        " birthday string, farm_area string, amount string, voucher_status string")
    txn = spark.createDataFrame(
        TXN_ROWS,
        "voucher_details_id string, reference_no string, quantity string,"
        " payout string, ishold string, transac_date string")
    return queue, voucher, txn
