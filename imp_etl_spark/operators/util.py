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


def fs_write_text(spark, path: str, content: str) -> None:
    """Write a small text file through the Hadoop FileSystem API so
    index sidecars (_params.json and friends) work on ANY scheme the
    cluster can reach (file://, hdfs://, s3a://...) — a driver-local
    ``open()`` silently restricts an artifact documented as shared to
    the driver's own disk. Driver-side only; never on the data path."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    out = fs.create(p, True)
    try:
        out.write(bytearray(content.encode("utf-8")))
    finally:
        out.close()


def fs_read_text(spark, path: str) -> str:
    """Read a small text file through the Hadoop FileSystem API (the
    counterpart of :func:`fs_write_text`)."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    stream = fs.open(p)
    try:
        data = jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
    finally:
        stream.close()
    return bytes(data).decode("utf-8")
