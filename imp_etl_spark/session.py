"""SparkSession construction with scale-conscious defaults.

The reference hand-tunes physical execution (pool sizes, concurrency=4,
batch pagination — see SURVEY.md §4). On Spark all of that is the
scheduler's job; what we tune instead is the small set of knobs that
matter at 100 TB: AQE (runtime re-planning, skew-join splitting,
partition coalescing), shuffle partition count, broadcast threshold, and
Arrow for the few Pandas-UDF paths.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults chosen for the local[32]/128GiB test harness; on a real
# cluster these are overridden by spark-submit conf. shuffle.partitions
# is intentionally modest locally — AQE coalesces further — while at
# cluster scale you'd set it ~2-3x total cores (or rely on AQE's
# initialPartitionNum).
_DEFAULT_CONF = {
    # ANSI mode is Spark 4's default, but the engine's semantics now
    # DEPEND on it (the DECIMAL(38,0) wide-accumulate path exists
    # because a naive long SUM must ABORT, not wrap, on partial
    # overflow — tests/test_quantize.py pins that contract), so pin it
    # explicitly rather than inherit a default an env override could
    # silently flip to wrap/null semantics.
    "spark.sql.ansi.enabled": "true",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.shuffle.partitions": "32",
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    # split small file sets down to at least this many scan partitions so
    # CPU-bound expression work uses every core even when the input is a
    # handful of sub-128MB files; at real scale the scan already exceeds
    # this and the setting is inert. minPartitionNum's split size is
    # floored at openCostInBytes, so drop that floor from 4MB to 1MB —
    # per-split open overhead on parquet is far below 1MB of scan work
    "spark.sql.files.minPartitionNum": "32",
    "spark.sql.files.openCostInBytes": str(1024 * 1024),
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    "spark.ui.enabled": "false",
}


def _env_extra_conf() -> dict[str, str]:
    """Conf overrides from ``SPARK_GRAFT_EXTRA_CONF`` (r13): a
    semicolon-separated ``key=value`` list, e.g.
    ``spark.io.compression.codec=zstd;spark.sql.join.preferSortMergeJoin=false``.
    This is the parameterisation hook the conf-sweep methodology (guide
    §9) and cluster deployments use — unset (the driver's bench, tests)
    it is exactly the historical default conf, so round-over-round
    comparability is untouched."""
    raw = os.environ.get("SPARK_GRAFT_EXTRA_CONF", "")
    out: dict[str, str] = {}
    for pair in raw.split(";"):
        if "=" in pair:
            k, v = pair.split("=", 1)
            if k.strip():
                out[k.strip()] = v.strip()
    return out


def get_spark(app_name: str = "imp_etl_spark", master: str | None = None,
              extra_conf: dict[str, str] | None = None) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine defaults."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = SparkSession.builder.appName(app_name).master(
        master or f"local[{cpus}]"
    )
    for k, v in {**_DEFAULT_CONF, **_env_extra_conf(),
                 **(extra_conf or {})}.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
