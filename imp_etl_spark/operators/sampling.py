"""Dataset splitting and sampling — the train/val/test machinery a
training-data pipeline runs in front of every model job.

The reference has no sampling surface (its closest analog is the
warning-sample `slice(0,5)`, ``services/etlService.js:499-510``); this
module is part of the SURVEY.md §7.8 north-star extension set.

Design rules for 100 TB:

- **Splits must be a pure function of a stable row identity.** A split
  computed by ``rand()`` changes on every retry/backfill and leaks rows
  across train/test between runs. ``xxhash64(id, salt)`` is reproducible
  across runs, machines, and Spark versions, and is computed row-local
  (narrow — no shuffle, no state).
- **Sampling is a filter, not a shuffle.** Every operator here is a
  one-pass predicate the scan can evaluate; nothing materializes a
  global ordering or count first.
- ``split_by_mod`` exists as the SQL-portable variant (modulus on the
  raw id) so the semantics stay DuckDB-checkable; production pipelines
  should prefer ``split_by_hash`` — sequential ids correlate with crawl
  order / time, and a modulus split would stripe that correlation into
  the folds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BUCKETS = 10_000


def _hash_bucket(id_col: str, salt: str, buckets: int,
                 hash_fn: str) -> Column:
    """Deterministic id -> bucket in [0, buckets).

    ``xxhash64`` is the fast production default; ``md5`` hashes the id's
    string form (first 15 hex chars -> i64) and is byte-identical in
    DuckDB (``('0x' || substr(md5(id::VARCHAR || salt), 1, 15))::BIGINT %
    buckets``), so md5-mode splits/samples are oracle-checkable.
    """
    if hash_fn == "xxhash64":
        return F.pmod(F.xxhash64(F.col(id_col), F.lit(salt)),
                      F.lit(buckets))
    if hash_fn == "md5":
        key = F.concat(F.col(id_col).cast("string"), F.lit(salt))
        return F.pmod(
            F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long"),
            F.lit(buckets))
    raise ValueError(f"unknown hash_fn {hash_fn!r}")


def _bucketize(splits: dict[str, float],
               buckets: int) -> list[tuple[str, int]]:
    """Cumulative bucket upper-bounds per split name."""
    total = sum(splits.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split weights must sum to 1, got {total}")
    bounds, acc = [], 0.0
    for name, w in splits.items():
        acc += w
        bounds.append((name, round(acc * buckets)))
    bounds[-1] = (bounds[-1][0], buckets)  # absorb rounding
    return bounds


def _assign(bucket: Column, splits: dict[str, float],
            buckets: int) -> Column:
    expr: Column | None = None
    for name, hi in _bucketize(splits, buckets):
        cond = bucket < F.lit(hi)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(
            cond, F.lit(name))
    return expr


def split_by_hash(df: DataFrame, id_col: str,
                  splits: dict[str, float], salt: str = "",
                  out_col: str = "split",
                  buckets: int = BUCKETS,
                  hash_fn: str = "xxhash64") -> DataFrame:
    """Assign each row to a named split by an id-hash bucket.

    Deterministic, stable under retries and appends (a new row's split
    never depends on what else is in the dataset), and uncorrelated with
    id order. ``salt`` derives independent re-splits from the same ids
    (e.g. per-experiment folds). ``hash_fn='md5'`` is the SQL-portable
    compat mode (identical assignment in the DuckDB oracle); xxhash64 is
    the cheaper production default — the split STRUCTURE is the same,
    only the hash primitive differs.
    """
    bucket = _hash_bucket(id_col, salt, buckets, hash_fn)
    return df.withColumn(out_col, _assign(bucket, splits, buckets))


def split_by_mod(df: DataFrame, id_col: str, splits: dict[str, float],
                 out_col: str = "split",
                 buckets: int = BUCKETS) -> DataFrame:
    """SQL-portable split: bucket = id % BUCKETS. Only sound when ids are
    dense and uncorrelated with content; kept as the oracle-checkable
    mirror of ``split_by_hash`` (same bucketing arithmetic)."""
    bucket = F.pmod(F.col(id_col).cast("long"), F.lit(buckets))
    return df.withColumn(out_col, _assign(bucket, splits, buckets))


def sample_by_hash(df: DataFrame, id_col: str, fraction: float,
                   salt: str = "", buckets: int = BUCKETS) -> DataFrame:
    """Deterministic ``fraction`` sample: keep rows whose id-hash bucket
    falls below the cutoff. Unlike ``df.sample()`` the result is
    identical across runs and partitionings, and composable — a 1%
    sample is a strict subset of the 10% sample with the same salt."""
    cut = round(fraction * buckets)
    bucket = _hash_bucket(id_col, salt, buckets, "xxhash64")
    return df.filter(bucket < F.lit(cut))


def stratified_sample(df: DataFrame, strata_col: str,
                      fractions: dict, seed: int = 7) -> DataFrame:
    """Per-stratum Bernoulli sampling (``sampleBy``): rebalance skewed
    strata (e.g. downsample the dominant language) in one narrow pass.
    Seeded for reproducibility at fixed partitioning; for run-stable
    sampling regardless of partitioning use ``sample_by_hash`` per
    stratum."""
    return df.sampleBy(strata_col, fractions=fractions, seed=seed)


def mixture_sample(df: DataFrame, strata_col: str, id_col: str,
                   fractions: dict[str, float], salt: str = "",
                   method: str = "hash",
                   buckets: int = BUCKETS,
                   default: float = 0.0) -> DataFrame:
    """Corpus mixing: keep each stratum (source/language/domain) at its
    own rate in ONE narrow pass — the deterministic version of the
    training-data "mixture weights" step. Unlike ``stratified_sample``
    (seeded Bernoulli) the kept set is a pure function of row identity:
    stable across retries, partitionings, and appends, and nested (a
    lower rate keeps a subset of a higher rate at the same salt).

    ``method='hash'`` buckets by ``xxhash64(id, salt)`` (production);
    ``method='md5'`` buckets by the portable md5 scheme (SQL-checkable,
    content-uncorrelated like 'hash', ~3x the hash cost);
    ``method='mod'`` buckets by ``id % buckets`` (SQL-portable mirror,
    sound only for dense content-uncorrelated ids).
    """
    bad = [k for k, v in fractions.items() if not 0 <= v <= 1]
    if bad:
        raise ValueError(f"fractions outside [0,1] for strata {bad}")
    if not 0 <= default <= 1:
        raise ValueError(f"default fraction outside [0,1]: {default}")
    if method in ("hash", "md5"):
        bucket = _hash_bucket(id_col, salt, buckets,
                              "xxhash64" if method == "hash" else "md5")
    elif method == "mod":
        bucket = F.pmod(F.col(id_col).cast("long"), F.lit(buckets))
    else:
        raise ValueError(f"unknown method {method!r}")
    cut: Column | None = None
    for name, frac in fractions.items():
        cond = F.col(strata_col) == F.lit(name)
        hi = F.lit(round(frac * buckets))
        cut = F.when(cond, hi) if cut is None else cut.when(cond, hi)
    # strata not named in `fractions` get `default` (0.0 = dropped; 1.0
    # = kept whole — the "downsample the named stratum, pass the rest"
    # shape a language-rebalance wants for langs unseen at config time);
    # an empty `fractions` dict applies `default` to every stratum (the
    # "keep everything until configured" call at default=1.0)
    default_hi = F.lit(round(default * buckets))
    cut_expr = cut.otherwise(default_hi) if cut is not None else default_hi
    return df.filter(bucket < cut_expr)


def pack_greedy(df: DataFrame, id_col: str, weight_col: str, budget: int,
                shards: int = 32, shard_col: str = "shard",
                bin_col: str = "bin") -> DataFrame:
    """Sequence packing: assign each row to a fixed-``budget`` bin (the
    batch-construction step that packs documents into fixed-token
    training sequences). A row opens a new bin when the running weight
    BEFORE it crosses a budget boundary, so bins fill greedily in id
    order and assignment is fully deterministic.

    Scale: a single global running sum would funnel all rows through one
    task, so rows are first sharded by ``id % shards`` (deterministic)
    and packed per shard — one shuffle on the shard key, a window per
    shard, no global sort. Bins are (shard, bin) pairs; at 1000
    executors raise ``shards`` to keep shards ~executor-sized.
    """
    from pyspark.sql import Window

    shard = (F.col(id_col) % shards).cast("long")
    w = (Window.partitionBy(shard_col).orderBy(F.col(id_col).asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    out = df.withColumn(shard_col, shard)
    cum = F.sum(F.col(weight_col)).over(w)
    return out.withColumn(
        bin_col,
        F.floor((cum - F.col(weight_col)) / float(budget)).cast("long"))


def weighted_sample(df: DataFrame, id_col: str, weight: Column,
                    salt: str = "", buckets: int = BUCKETS,
                    hash_fn: str = "xxhash64") -> DataFrame:
    """Per-row weighted Bernoulli sampling: keep a row with probability
    ``weight`` (a column in [0,1] — e.g. a quality score, or a
    length-proportional rate), decided by the row's OWN id hash. The
    training-data shape this serves: quality-weighted corpus pruning
    where better documents survive at higher rates, reproducibly.

    Same guarantees as ``sample_by_hash``: narrow one-pass filter, stable
    under retries/appends/partitioning, and monotone in the weight (a row
    kept at weight w survives at any w' > w with the same salt — the
    hash draw is fixed, only the threshold moves). The comparison is
    ``bucket < weight * buckets`` with no rounding, so the kept set is a
    pure function of (id, salt, weight) in both engines (md5 mode)."""
    bucket = _hash_bucket(id_col, salt, buckets, hash_fn)
    return df.filter(bucket < weight * F.lit(buckets))


def shard_balanced(df: DataFrame, weight_col: str, id_col: str,
                   num_shards: int, shard_col: str = "shard") -> DataFrame:
    """Length-balanced round-robin sharding: order rows by ``weight_col``
    descending (``id_col`` tiebreak) and deal them round-robin into
    ``num_shards`` shards — the classic longest-first assignment that
    keeps every shard's total weight within one max-row of the mean.
    The training-data shape this serves: splitting a corpus into
    worker files whose token totals (not row counts) are even, so no
    straggler shard.

    Scale: the total order comes from operators.window.global_index
    (range-partition + per-partition rank + offsets) — no
    single-partition window anywhere; the shard id is then pure
    arithmetic on the index. One range shuffle total.
    """
    from imp_etl_spark.operators.window import global_index

    # pack (weight desc, id asc) into one ascending long so the range
    # partitioner sees a single total-order column
    ordered = df.withColumn(
        "__ord",
        (-F.col(weight_col).cast("long")) * F.lit(1 << 32)
        + F.col(id_col).cast("long"),
    )
    idx = global_index(ordered, "__ord", unique_order=True)
    return (
        idx.withColumn(
            shard_col,
            ((F.col("__rn") - 1) % num_shards).cast("int"))
        .drop("__ord", "__rn")
    )


def cap_per_group(df: DataFrame, group_col: str, id_col: str,
                  cap: int, salt: str = "") -> DataFrame:
    """Per-group document cap: keep at most ``cap`` rows per group,
    selected deterministically by md5(id || salt) rank within the group
    (an unbiased, reproducible draw — NOT first-N in storage order,
    which would bias toward old/clustered rows). The training-data
    shape this serves: per-domain caps so no single source dominates
    the corpus.

    Scale: one shuffle on the group key; the per-group rank is a
    WindowGroupLimit candidate (map-side top-cap pre-filter before the
    exchange), so a hot domain forwards at most cap rows per map task —
    the same degenerate-key defense as the LSH bucket caps.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt))).asc(),
        F.col(id_col).asc(),
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= cap)
        .drop("__rk")
    )
