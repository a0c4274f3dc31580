"""Aggregation operators (SURVEY.md §2.4) + the analytics extension
surface (§7.8): grouped aggregation, grouping sets/rollup/cube, top-k,
and the reference's counter/observe accounting.

Scale notes: all grouped aggregations compile to partial (map-side) +
final aggregation, so the shuffle carries one row per (partition, group),
not per input row. Top-k uses sort-limit which Spark executes as a
per-partition top-k + single-reduce merge — never a full sort of the
input. ``observe`` metrics ride the existing job (no extra pass), exactly
replacing the reference's per-batch counter accumulation
(etlService.js:473-477).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Observation, Window
from pyspark.sql import functions as F


def filtered_count(df: DataFrame, predicate: Column) -> int:
    """A1 — COUNT(*) with predicate (models/EtlLogger.js:19-27)."""
    return df.filter(predicate).count()


def top_k(df: DataFrame, order: Sequence[Column], k: int) -> DataFrame:
    """O3/A7 — deterministic top-k (callers must make ``order`` total,
    e.g. by appending a unique key as tie-break)."""
    return df.orderBy(*order).limit(k)


def group_counts(df: DataFrame, keys: Sequence[str],
                 *aggs: Column) -> DataFrame:
    """A2 — per-key counters (processed/skipped shape)."""
    return df.groupBy(*keys).agg(*aggs)


def observe_counters(df: DataFrame, name: str = "etl") -> tuple[DataFrame, Observation]:
    """A3/A5 — attach processed/skipped counters to a plan without an
    extra pass. Mirrors the reference's run summary counters
    (etlService.js:512-519): read ``observation.get`` after the action.
    """
    obs = Observation(name)
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("processed"),
    )
    return observed, obs


def progress_pct(offset: Column | int, total: Column | int) -> Column:
    """A6 — clamped progress percentage (the reference logs an unclamped
    variant — quirk Q5; we clamp, as its own `Math.min` intends)."""
    o = F.lit(offset) if isinstance(offset, int) else offset
    t = F.lit(total) if isinstance(total, int) else total
    return F.least(F.round(o / t * 100), F.lit(100).cast("double"))


# x shift for the trend fit: 2024-01-01 UTC in epoch microseconds. Shifting
# x by a constant leaves slope/intercept(mean-y)/r2 unchanged but keeps the
# exact integer moments small enough for 128-bit accumulation in DuckDB.
TREND_EPOCH_US = 1_704_067_200_000_000


def per_group_trend(events, key: str = "user_id", x_col: str = "ts",
                    y_col: str = "value"):
    """Per-key least-squares trend (slope at µs->y-per-second scale,
    intercept = mean y, r2) via grouped-map ``applyInPandas`` — the batch
    Pandas-API shape for per-group model fitting. Arrow moves each group
    as one columnar batch; the shuffle is on ``key`` only, output is O(1)
    per group.

    Determinism (this op is oracle-checked, queries.py): all moments are
    EXACT integers — x as epoch-µs offsets from ``TREND_EPOCH_US``, y
    quantized to micro-units from the double's SHORTEST decimal repr
    with halves rounded away from zero (the rule DuckDB's
    double->DECIMAL cast applies, including on exact .5 ties like
    0.0078125 -> 7812.5; parity pinned in tests/test_quantize.py) —
    and only
    the final divisions run in IEEE double, one op per output. The same
    formula in DuckDB HUGEINT arithmetic is bit-equal. Exact summation is
    also numerically stronger than the float closed form (no
    cancellation); the integer loop costs more CPU per row than a numpy
    float fit — the price of a reproducible fit, still Arrow-batched and
    fully distributed.
    """
    from decimal import ROUND_HALF_UP, Decimal

    import pandas as pd

    def _fit(pdf: pd.DataFrame) -> pd.DataFrame:
        xs = [int(v) - TREND_EPOCH_US
              for v in pdf[x_col].astype("datetime64[us]").astype("int64")]
        ys = [int((Decimal(repr(float(v))).scaleb(6))
                  .to_integral_value(rounding=ROUND_HALF_UP))
              for v in pdf[y_col]]
        n = len(xs)
        sx = sum(xs); sy = sum(ys)
        sxy = sum(x * y for x, y in zip(xs, ys))
        sxx = sum(x * x for x in xs); syy = sum(y * y for y in ys)
        a = n * sxy - sx * sy
        b = n * sxx - sx * sx
        c = n * syy - sy * sy
        slope = 0.0 if (n < 2 or b == 0) else float(a) / float(b)
        intercept = 0.0 if n == 0 else float(sy) / float(n * 1_000_000)
        r2 = (0.0 if (n < 2 or b == 0 or c == 0)
              else (float(a) * float(a)) / (float(b) * float(c)))
        return pd.DataFrame({key: [pdf[key].iloc[0]], "n": [n],
                             "slope": [slope], "intercept": [intercept],
                             "r2": [r2]})

    return (events.select(key, x_col, y_col)
            .filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
            .groupBy(key)
            .applyInPandas(_fit, schema=f"{key} BIGINT, n BIGINT, "
                                        "slope DOUBLE, intercept DOUBLE, "
                                        "r2 DOUBLE"))


def group_moment_stats(events: DataFrame, key: str = "event_type",
                       x_col: str = "ts", y_col: str = "value") -> DataFrame:
    """Per-group second-moment statistics — n, mean, sample stddev,
    covariance(x, y) and Pearson correlation — computed ENTIRELY from
    exact integer moment sums, JVM-side (whole-stage codegen, no Python).

    Unlike ``per_group_trend`` (grouped-map Pandas with bigint Python
    sums), this shows the same exact-arithmetic determinism is available
    to the built-in aggregation path: x is the epoch-MILLIsecond offset
    from TREND_EPOCH_US and y the micro-quantized value (the shared
    double->DECIMAL(18,6) rule, tests/test_quantize.py), both carried as
    DECIMAL(38,0); SUM/products stay exact integers, and each output is
    one short IEEE chain over exact operands — bit-equal to the DuckDB
    HUGEINT oracle. Map-side partial aggregation applies, so the shuffle
    carries 7 integers per (partition, group).

    Envelope: with |x| <= 2.6e9 ms (a month of data) and |y| <= 5.6e8,
    n*sxx tops out near 1e33 per group — DECIMAL(38,0) holds to ~1e5x
    this fixture per group. Milli (not micro) x resolution is what buys
    that headroom; the offsets are non-negative here so `div 1000` is
    floor division in both engines.
    """
    e = str(TREND_EPOCH_US)
    pts = (
        events.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
        .selectExpr(
            key,
            # ts is TIMESTAMP_NTZ (sources/parquet nanos handling); the
            # session tz is pinned UTC (session.py) so this cast is exact
            f"CAST((unix_micros(CAST({x_col} AS TIMESTAMP)) - {e}) div 1000 "
            "AS DECIMAL(38,0)) AS x",
            f"CAST(CAST({y_col} AS DECIMAL(18,6)) * 1000000 AS DECIMAL(38,0)) AS y",
            f"{y_col} AS yraw",
        )
    )
    s = pts.groupBy(key).agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.sum(F.expr("x*y")).alias("sxy"),
        F.sum(F.expr("x*x")).alias("sxx"),
        F.sum(F.expr("y*y")).alias("syy"),
        F.min("yraw").alias("min_value"),
        F.max("yraw").alias("max_value"),
    )
    m = s.selectExpr(
        key, "n", "sy", "min_value", "max_value",
        "n*sxy - sx*sy AS a", "n*sxx - sx*sx AS b", "n*syy - sy*sy AS c",
    )
    return m.selectExpr(
        key,
        "CAST(n AS BIGINT) AS n",
        "CAST(sy AS DOUBLE) / CAST(n * 1000000 AS DOUBLE) AS mean_value",
        "CASE WHEN n < 2 THEN 0.0 ELSE "
        "sqrt(CAST(c AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE)) / 1000000.0 "
        "END AS stddev_value",
        "CASE WHEN n < 2 THEN 0.0 ELSE "
        "CAST(a AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE) / 1000000000.0 "
        "END AS covar_sec_value",
        "CASE WHEN n < 2 OR b = 0 OR c = 0 THEN 0.0 ELSE "
        "CAST(a AS DOUBLE) / (sqrt(CAST(b AS DOUBLE)) * sqrt(CAST(c AS DOUBLE))) "
        "END AS corr_time_value",
        "min_value", "max_value",
    )


def fixed_width_histogram(df: DataFrame, col: str, lo: float, width: float,
                          nbins: int) -> DataFrame:
    """Fixed-width histogram: bucket index, bounds, count and share.

    One partial+final aggregation over at most ``nbins`` groups — the
    data-profiling primitive for 100 TB columns (the alternative,
    sort-based binning, is a full shuffle of the column). Values below
    ``lo`` clamp to bucket 0, values beyond the top bucket clamp to
    ``nbins - 1``; the share division is the only float op after exact
    integer counts. The single-row total join broadcasts.
    """
    b = F.floor((F.col(col) - F.lit(lo)) / F.lit(width))
    bucket = F.greatest(F.lit(0), F.least(b, F.lit(nbins - 1))).cast("int")
    counts = (
        df.filter(F.col(col).isNotNull())
        .select(bucket.alias("bucket"))
        .groupBy("bucket").agg(F.count(F.lit(1)).alias("cnt"))
    )
    w_all = Window.partitionBy()
    return (
        counts
        .withColumn("lo", (F.lit(lo) + F.col("bucket") * F.lit(width)))
        .withColumn("hi", (F.lit(lo) + (F.col("bucket") + 1) * F.lit(width)))
        .withColumn("share",
                    F.col("cnt") / F.sum("cnt").over(w_all))
        .select("bucket", "lo", "hi", "cnt", "share")
    )


def sharded_distinct_sketch(df: DataFrame, keys: Sequence[str],
                            value_col: str, shard: Column,
                            lg_k: int = 14,
                            sketch_col: str = "sketch") -> DataFrame:
    """Per-(keys, shard) HLL distinct-count sketches (Apache
    DataSketches via Spark's ``hll_sketch_agg``) — the MERGEABLE
    distinct-count shape a 100 TB pipeline needs: each shard (a
    partition, a day, an ingest batch) builds its sketch ONCE with one
    map-side-combining aggregation, and any rollup (all-time, rolling
    window, cross-corpus) is a tiny ``hll_union_agg`` over sketch rows
    — no re-scan of raw data, no COUNT(DISTINCT) shuffle of the full
    key x value domain. ``lg_k=14`` = 2^14 registers ~= 0.81% relative
    standard error, fixed 16 KiB per sketch.

    Returns one row per (keys, shard) with a binary sketch column —
    persist it as the incremental "sketch table"; estimate with
    :func:`union_distinct_estimate`. NULL values are ignored (same as
    COUNT(DISTINCT)); NULL keys/shards form real groups.
    """
    return (df.withColumn("__shard", shard)
            .groupBy(*keys, "__shard")
            .agg(F.hll_sketch_agg(F.col(value_col), F.lit(lg_k))
                 .alias(sketch_col)))


def union_distinct_estimate(sketches: DataFrame, keys: Sequence[str],
                            sketch_col: str = "sketch",
                            est_col: str = "n_est") -> DataFrame:
    """Merge per-shard HLL sketches and estimate the distinct count
    per key group. Exact-union semantics: HLL register merge is
    commutative and associative, so the estimate is independent of
    shard order, partitioning, and how history was sliced — the
    property that makes the sketch table incrementally maintainable.
    A group whose every shard sketch is NULL (no non-null values ever)
    estimates 0."""
    return (sketches.groupBy(*keys)
            .agg(F.coalesce(
                F.hll_sketch_estimate(
                    F.hll_union_agg(F.col(sketch_col),
                                    F.lit(True))),
                F.lit(0).cast("bigint")).alias(est_col)))


def overlap_estimate(sk_a: DataFrame, sk_b: DataFrame,
                     keys: Sequence[str],
                     sketch_col: str = "sketch",
                     est_col: str = "overlap_est") -> DataFrame:
    """Distinct-set OVERLAP estimate per key group from two HLL sketch
    frames via inclusion-exclusion: ``|A ∩ B| ~= est(A) + est(B) -
    est(A ∪ B)`` (the union sketch is a register merge — exact union
    semantics, no re-scan). This is the scale path for contamination /
    cross-corpus overlap screening: both sides stay 16 KiB-per-group
    sketch tables, the intersection needs no join of the raw domains.

    Error model, stated honestly: each estimate carries ~0.81% RSE at
    lg_k=14, and the DIFFERENCE compounds them — the absolute error
    scales with ``|A ∪ B|``, NOT with the overlap, so a small overlap
    of two large sets cannot be resolved below ~1-2% of the union
    (use an exact join when that precision matters; the estimate's
    own ``union_est`` column is returned so callers can bound it).

    Only keys present in BOTH frames are returned (an absent side has
    no sketch — semantically an empty set would estimate overlap 0,
    but emitting rows for half-absent keys makes every consumer
    handle the asymmetry; filter upstream if needed). NULL keys are
    real groups (null-safe join). Estimates are clamped at 0 (the
    difference can go slightly negative on disjoint sets).
    """
    keys = list(keys)
    a = union_distinct_estimate(sk_a, keys, sketch_col, "__ea") \
        .withColumnsRenamed({k: f"__ka_{k}" for k in keys})
    b = union_distinct_estimate(sk_b, keys, sketch_col, "__eb") \
        .withColumnsRenamed({k: f"__kb_{k}" for k in keys})
    u = union_distinct_estimate(
        sk_a.select(*keys, sketch_col)
        .unionByName(sk_b.select(*keys, sketch_col)),
        keys, sketch_col, "union_est")
    cond_a = None
    cond_b = None
    for k in keys:
        ca = F.col(k).eqNullSafe(F.col(f"__ka_{k}"))
        cb = F.col(k).eqNullSafe(F.col(f"__kb_{k}"))
        cond_a = ca if cond_a is None else (cond_a & ca)
        cond_b = cb if cond_b is None else (cond_b & cb)
    return (u.join(a, cond_a).join(b, cond_b)
            .select(*keys, "union_est",
                    F.greatest(
                        F.lit(0).cast("bigint"),
                        F.col("__ea") + F.col("__eb")
                        - F.col("union_est")).alias(est_col)))
