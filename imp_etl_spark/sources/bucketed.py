"""Bucketed-table layout: co-located fact-fact joins without a shuffle.

The reference pre-indexes both entity tables on ``reference_no``
(``services/etlService.js:372,411``) so its per-record lookups are
index probes. The Spark-scale analog is *bucketing*: persist both fact
tables hash-partitioned (and sorted) on the join key; a join on that key
then reads co-located buckets — no Exchange on either side, which at
100 TB removes the single largest cost of a fact-fact join (the
lineitem<->orders shuffle moves the whole table otherwise).

Bucketing goes through the session catalog (``saveAsTable``) because the
bucket metadata lives there; plain ``.parquet(path)`` writes cannot carry
it. Bucket count is a layout decision: pick ~(table size / 128 MB)
rounded to a power of two, identical on both sides of the intended join.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, buckets: int,
                   key: Sequence[str] | str, sort: bool = True,
                   mode: str = "overwrite") -> None:
    """Persist ``df`` bucketed (and bucket-sorted) on ``key``."""
    key = [key] if isinstance(key, str) else list(key)
    writer = df.write.mode(mode).bucketBy(buckets, *key)
    if sort:
        writer = writer.sortBy(*key)
    writer.format("parquet").saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def colocated_join(spark: SparkSession, left_table: str, right_table: str,
                   on: Sequence[str] | str, how: str = "inner") -> DataFrame:
    """Join two tables bucketed on the same key with the same bucket
    count: Catalyst recognizes the matching output partitioning and
    plans a sort-merge join with NO Exchange on either side."""
    on = [on] if isinstance(on, str) else list(on)
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)
