"""Join operators (SURVEY.md §2.3).

The reference's only join is an index-nested-loop executed as N point
lookups, 4 records at a time (``services/etlService.js:446-449`` driving
``:17-23`` and ``:158-164``). Set-based equivalents:

- J1  lookup_join      — equi inner join, broadcast when one side is small
- J1' semi_prune       — prune a big fact table to a key set (left semi)
- J2  exists_keys      — composite-key existence (left semi / left anti),
                         the intended semantics of the dead
                         ``validateVoucherUniqueness`` (etlService.js:25-34)
- J3  missing_matches  — work-queue references with no entity rows
                         (left anti), reproducing the skip/warning path
                         (etlService.js:452-471)

Scale notes: the deduplicated reference-key set is tiny relative to the
entity tables, so every prune broadcasts (no shuffle of the fact side).
A genuinely large probe side falls back to a shuffled hash join keyed on
the same column the sinks partition by, so the exchange is reused across
the voucher and transaction branches.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def semi_prune(fact: DataFrame, keys: DataFrame, on: Sequence[str] | str,
               broadcast_keys: bool = True) -> DataFrame:
    """Keep fact rows whose key appears in ``keys`` (left semi).

    ``keys`` is deduplicated first: semi joins don't multiply rows, but a
    deduped broadcast table is smaller and the build side cheaper.
    """
    on = [on] if isinstance(on, str) else list(on)
    k = keys.select(*on).dropDuplicates(on)
    if broadcast_keys:
        k = F.broadcast(k)
    return fact.join(k, on=on, how="left_semi")


def anti_missing(keys: DataFrame, fact: DataFrame, on: Sequence[str] | str) -> DataFrame:
    """J3 — keys with no matching fact rows (left anti): the reference's
    'No voucher data found' warning set (etlService.js:452-471)."""
    on = [on] if isinstance(on, str) else list(on)
    return keys.join(fact.select(*on).dropDuplicates(on), on=on, how="left_anti")


def exists_keys(batch: DataFrame, target: DataFrame, on: Sequence[str],
                anti: bool = False) -> DataFrame:
    """J2 — composite-key existence filter against the target table.

    ``anti=False`` -> rows whose key already exists (would UPDATE);
    ``anti=True`` -> new keys (would INSERT).
    """
    how = "left_anti" if anti else "left_semi"
    return batch.join(target.select(*on).dropDuplicates(list(on)), on=list(on), how=how)


def lookup_join(queue: DataFrame, entity: DataFrame, on: Sequence[str] | str,
                how: str = "inner", broadcast_queue: bool = True) -> DataFrame:
    """J1 — the work-queue -> entity lookup as one equi join.

    The queue side (deduped keys) broadcasts; Catalyst turns the N point
    lookups into a single broadcast hash join with the entity scan's
    pushed filters intact.
    """
    on = [on] if isinstance(on, str) else list(on)
    q = F.broadcast(queue) if broadcast_queue else queue
    return entity.join(q, on=on, how=how)


def fuzzy_join_blocked(left: DataFrame, right: DataFrame,
                       left_col: str, right_col: str,
                       block: "Callable[[Column], Column]" = None,
                       max_dist: int = 3,
                       dist_col: str = "edit_dist") -> DataFrame:
    """Blocked edit-distance fuzzy join: candidate pairs must share a
    blocking key (default: first character), then the exact Levenshtein
    predicate refines. Returns left columns + right columns + the
    distance.

    The reference resolves entities by exact key only (models/*.js);
    fuzzy matching is the dirty-data variant every ingest pipeline needs.

    Scale: blocking turns the all-pairs O(|L|x|R|) comparison into an
    equi join on the block key — a plain hash exchange Catalyst can
    plan, with Levenshtein evaluated only inside blocks (JVM builtin,
    codegen). Recall is bounded by the blocking fn: a first-char block
    misses pairs that differ at position 0; use longer/multiple blocks
    (or the n-gram posting-list path in operators/dedup.py) when recall
    matters more than cost. Degenerate blocks (everything starts with
    'a') re-create the quadratic blowup — cap or sub-block hot keys,
    same playbook as dedup.py's LSH bucket caps.
    """
    if block is None:
        def block(c):
            return F.substring(c, 1, 1)
    lb = left.select("*", block(F.col(left_col)).alias("__blk"))
    rb = right.select("*", block(F.col(right_col)).alias("__blk"))
    joined = lb.join(rb, on="__blk", how="inner").drop("__blk")
    d = F.levenshtein(F.col(left_col), F.col(right_col))
    return (
        joined.filter(d <= max_dist)
        .withColumn(dist_col, d.cast("int"))
    )


def sorted_neighborhood_pairs(df: DataFrame, col: str, window: int = 3,
                              max_dist: int = 3,
                              dist_col: str = "edit_dist") -> DataFrame:
    """Sorted-neighborhood fuzzy dedup: sort the DISTINCT values of
    ``col``, compare each value only with its next ``window - 1``
    neighbors in sort order, keep pairs within ``max_dist`` Levenshtein.
    The record-linkage alternative to key blocking
    (``fuzzy_join_blocked``): cost is O(n * window) comparisons
    regardless of key skew, but recall depends on near-dups sorting
    near each other — production runs do multiple passes with different
    sort keys (e.g. reversed strings) and union the pairs.

    Scale: the rank comes from operators.window.global_index (range
    partition, no single-task sort); neighbors are found by an EQUI
    join on (index + offset) after a bounded explode — a hash exchange,
    never an inequality join. Returns (name_a, name_b, dist).
    """
    from imp_etl_spark.operators.window import global_index

    # a NULL value is no linkage candidate: it has no edit distance to
    # anything, and its sort position is engine-dependent (Spark nulls
    # first, SQL nulls last) — which would shift every neighbor window
    ranked = global_index(
        df.select(F.col(col)).where(F.col(col).isNotNull()).distinct(),
        col, "__idx", unique_order=True)
    left = ranked.select(
        F.col(col).alias("name_a"), "__idx",
        F.explode(F.array(
            *[F.lit(o) for o in range(1, window)])).alias("__off"),
    ).withColumn("__nidx", F.col("__idx") + F.col("__off"))
    right = ranked.select(
        F.col(col).alias("name_b"), F.col("__idx").alias("__nidx"))
    d = F.levenshtein(F.col("name_a"), F.col("name_b"))
    return (
        left.join(right, on="__nidx", how="inner")
        .filter(d <= max_dist)
        .select("name_a", "name_b", d.cast("int").alias(dist_col))
    )
