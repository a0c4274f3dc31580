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


def spread_small_scan(df: DataFrame, min_partitions: int | None = None,
                      probe: DataFrame | None = None) -> DataFrame:
    """Repartition ``df`` up to ``min_partitions`` (default: the session's
    default parallelism) iff it currently has fewer partitions.

    Use before per-row CPU-heavy work (hashing, shingling, vector math).
    The partition count probe compiles the plan but runs no job — on a
    PLAIN SCAN. On a plan containing a broadcast join the ``.rdd``
    conversion eagerly builds the broadcast relation (a real job), so
    callers that have already joined ``df`` should pass the pre-join
    scan as ``probe``: its partition count decides, and the decision is
    identical because a broadcast join preserves the probe side's
    partitioning.
    """
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if (probe if probe is not None else df).rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
