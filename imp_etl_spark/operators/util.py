"""Shared physical-layout helpers for CPU-bound operators.

Spark sizes scan partitions by *bytes* (``spark.sql.files.maxPartitionBytes``),
which is right for I/O-bound plans but wrong for compute-bound ones: a
1 MB parquet file of 5k documents arrives as ONE partition, and every
downstream shingle/hash/cosine expression then runs on one core while 31
idle. ``spread_small_scan`` widens such inputs to the cluster's
parallelism — and is a structural no-op at scale, where any real table
already scans as hundreds of splits (the guard keeps the extra shuffle
out of big-data plans).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_small_scan(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition ``df`` up to ``min_partitions`` (default: the session's
    default parallelism) iff it currently has fewer partitions.

    Use before per-row CPU-heavy work (hashing, shingling, vector math).
    The partition count probe compiles the plan but runs no job.
    """
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
