"""Window/ordering operators (SURVEY.md §2.6-2.7).

The reference's pagination (`ORDER BY log_id LIMIT ? OFFSET ?`,
models/EtlLogger.js:13) exists because Node must bound memory; Spark
partitions the scan instead, so ``paginate`` is provided for literal
batch-window parity (row_number over a total order) while production
paths just process the whole frame.

Scale notes: a global row_number needs a total order — a single-partition
sort at the extreme. ``paginate`` is therefore parity/testing surface; the
scalable incremental pattern is the ``log_id`` high-watermark in
``plans.runner``. Ranked-within-group windows (rank_in_group) shuffle once
on the partition key — the normal analytic shape.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F


def paginate(df: DataFrame, order_col: str, offset: int, limit: int) -> DataFrame:
    """S2/O2 — deterministic batch window over a total order."""
    w = Window.orderBy(F.col(order_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") > offset) & (F.col("__rn") <= offset + limit))
        .drop("__rn")
    )


def rank_in_group(df: DataFrame, partition: Sequence[str],
                  order: Sequence[Column], col_name: str = "rnk",
                  method: str = "rank") -> DataFrame:
    """Analytic ranking within groups (dense_rank/rank/row_number)."""
    fn = {"rank": F.rank, "dense_rank": F.dense_rank,
          "row_number": F.row_number}[method]
    w = Window.partitionBy(*partition).orderBy(*order)
    return df.withColumn(col_name, fn().over(w))


def running(df: DataFrame, partition: Sequence[str], order: Sequence[Column],
            agg: Column, col_name: str) -> DataFrame:
    """Running aggregate (cumulative) within a partition."""
    w = (Window.partitionBy(*partition).orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return df.withColumn(col_name, agg.over(w))


def lag_lead(w: WindowSpec, col: str, n: int = 1) -> tuple[Column, Column]:
    return F.lag(col, n).over(w), F.lead(col, n).over(w)
