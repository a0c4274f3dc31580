"""The reference's full ETL dataflow as one declarative DataFrame plan.

Reference lifecycle (SURVEY.md §3, ``services/etlService.js:416-520``):
work-queue scan -> per-record point lookups (voucher + transaction) ->
row-at-a-time cleanse -> falsy-key validity filter -> transactional bulk
upsert, with {processed, skipped, warnings} accounting.

Spark shape: instead of N point lookups at 4-way concurrency, each branch
is *one* broadcast-semi-joined scan; cleanse is Column expressions inside
whole-stage codegen; validity filtering splits into a kept frame and a
skipped side-output (the reference's warning lines); last-writer-wins
dedup prepares unique keys for the MERGE-style sink.

Scale notes: the deduped reference-key set is orders of magnitude smaller
than the entity tables -> broadcast (no shuffle of either fact table).
The only wide exchange in the whole plan is the per-PK dedup window,
partitioned by the same key the sink upserts on, so the exchange is
reused by the sink's own key-partitioned write. Counters ride
``observe()`` — zero extra passes over the data.
"""

from __future__ import annotations

import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from imp_etl_spark.functions import cleanse
from imp_etl_spark.operators.dedup import latest_per_key
from imp_etl_spark.operators.join import anti_missing, semi_prune
from imp_etl_spark.operators.util import spread_small_scan


def clean_queue(queue: DataFrame) -> DataFrame:
    """P2 + P6: drop work-queue rows with NULL reference_no/table
    (models/EtlLogger.js:10-12) and falsy reference_no
    (etlService.js:436-444)."""
    return queue.filter(
        F.col("reference_no").isNotNull()
        & F.col("`table`").isNotNull()
        & ~cleanse.falsy_key("reference_no")
    )


def reference_keys(queue: DataFrame) -> DataFrame:
    """The deduplicated key set driving both lookup branches (J1)."""
    return clean_queue(queue).select("reference_no").dropDuplicates(["reference_no"])


def cleanse_voucher(df: DataFrame, compat: bool = True) -> DataFrame:
    """processVoucherData (etlService.js:118-156) as Column expressions.

    Rules apply only to columns present in the frame — the reference
    guards each field with existence checks, so a narrow source simply
    gets fewer rules.
    """
    cols = set(df.columns)
    out = df
    if "sex" in cols:
        out = out.withColumn("sex", cleanse.enum_domain("sex", ["MALE", "FEMALE"]))
    for f_ in cleanse.VOUCHER_UPPER_FIELDS:
        if f_ in cols:
            out = out.withColumn(f_, cleanse.upper_trim(f_))
    for f_ in cleanse.VOUCHER_NUMERIC_FIELDS:
        if f_ in cols:
            out = out.withColumn(f_, cleanse.parse_float(f_, compat=compat))
    for f_ in cleanse.VOUCHER_DATE_FIELDS:
        if f_ in cols:
            out = out.withColumn(f_, cleanse.date_norm_utc(f_))
    return out


_NUMERIC_DTYPES = {"tinyint", "smallint", "int", "bigint", "float",
                   "double", "decimal"}


def _is_numeric_dtype(df: DataFrame, col: str) -> bool:
    # match the BASE type exactly — a prefix test would classify
    # 'interval day to second' as numeric via startswith('int')
    dt = dict(df.dtypes).get(col, "")
    return dt.split("(")[0] in _NUMERIC_DTYPES


def cleanse_transaction(df: DataFrame, compat: bool = True) -> DataFrame:
    """processTransactionData (etlService.js:259-297).

    The bool fields (ishold/isremove/isretransact) branch on the column's
    *static* dtype: numeric sources (the reference's MySQL TINYINTs,
    schemas.py declares them INT) use JS number falsiness (0 -> 0), string
    sources keep quirk Q3 ("0" -> 1) — matching what the JS
    ``record[field] ? 1 : 0`` sees from each driver type.
    """
    cols = set(df.columns)
    out = df
    for f_ in cleanse.TXN_NUMERIC_FIELDS:
        if f_ in cols:
            out = out.withColumn(f_, cleanse.parse_float(f_, compat=compat))
    if "payout" in cols:
        out = out.withColumn("payout", cleanse.char_flag("payout"))
    for f_ in cleanse.TXN_BOOL_FIELDS:
        if f_ in cols:
            out = out.withColumn(f_, cleanse.truthy_int(
                f_, compat=compat, numeric=_is_numeric_dtype(df, f_)))
    for f_ in cleanse.TXN_DATE_FIELDS:
        if f_ in cols:
            out = out.withColumn(f_, cleanse.date_norm_utc(f_))
    for f_ in cleanse.TXN_UPPER_FIELDS:
        if f_ in cols:
            out = out.withColumn(f_, cleanse.upper_trim(f_))
    return out


@dataclass
class BranchResult:
    """One entity branch (voucher or transaction): frames, not numbers —
    callers trigger actions; counts come from one .count() per frame or
    from observe() in the runner."""
    valid: DataFrame          # cleansed, key-valid, deduped (ready to MERGE)
    skipped: DataFrame        # falsy-key rejects (P4/P5 side-output)
    missing_refs: DataFrame   # queue refs with no rows in this entity (J3)
    cleansed: DataFrame | None = None  # persisted branch point (unpersist me)
    # observe() metrics (A2/A3): recorded for free during the first action
    # that executes the branch (normally the MERGE write) — zero extra
    # passes. obs_cleansed -> {"skipped": n}; obs_valid -> {"processed": n}.
    obs_cleansed: Observation | None = None
    obs_valid: Observation | None = None
    # Observation.get blocks until SOME action executes the observed plan,
    # so the free-counter path is only taken once the runner marks the
    # branch executed (after the MERGE). Before that, fall back to one
    # count() — which is itself an action on the observed plan, so it both
    # returns the number and fulfills the observation for later reads.
    executed: bool = False

    def processed_count(self) -> int:
        """Post-dedup valid rows: free from observe() once the merge has
        run, else one count() (which also fulfills the observation)."""
        if self.executed and self.obs_valid is not None:
            try:
                return int(self.obs_valid.get["processed"])
            except Exception:
                pass  # metrics node compiled away — see skipped_count
        n = self.valid.count()
        self.executed = True
        return n

    def skipped_count(self) -> int:
        if self.executed and self.obs_cleansed is not None:
            try:
                return int(self.obs_cleansed.get["skipped"] or 0)
            except Exception:
                # A provably/runtime-empty branch can have its inner
                # CollectMetrics node ELIMINATED by empty-relation
                # propagation (observed with the r13 lag-window dedup:
                # Window-over-empty folds to an empty relation and the
                # metrics row comes back arity-0, raising in toPyRow).
                # The exact fallback is one count() over the (empty)
                # side output — trivially cheap precisely in the case
                # that triggers this.
                pass
        return self.skipped.count()


@dataclass
class PipelineResult:
    voucher: BranchResult
    transaction: BranchResult
    keys: DataFrame
    extras: dict = field(default_factory=dict)


def _dedup_in_bucket_layout(df: DataFrame, pk: list[str], order_col: str,
                            n_buckets: int,
                            files_per_bucket: int = 1) -> DataFrame:
    """Last-writer-wins dedup fused INTO the sink's bucket layout (r13,
    VERDICT r12 item 3 — the dedup↔bucket-write double exchange).

    ``latest_per_key`` exchanges the full branch payload on hash(pk)
    and the bucketed sink then re-exchanges it on hash(bucket) — two
    wide shuffles of every row to answer one clustering question,
    because ``__bucket`` IS a pure function of pk. Instead: ONE
    exchange on the sink's own bucket expression, then a lag-based
    first-row-of-key filter inside a window PARTITIONED BY that same
    expression (same clustering — Catalyst inserts no second
    exchange). Sorting by (pk asc, order desc) makes the first row of
    each key block the max-``order_col`` row — the same winner
    ``latest_per_key``'s row_number pick selects (ties within a key
    share the order value and are arbitrary in both shapes). The sink
    (``merge_upsert(batch_pre_clustered=True)``) then writes the
    already-clustered rows without re-partitioning.

    ``files_per_bucket`` keeps the fused shape scale-adaptive: with
    one partition per bucket, a big batch sorts in only ``n_buckets``
    tasks (measured at 100x sf0.1: 45.7M rows through 16 tasks left
    half of local[32] idle). ``files_per_bucket > 1`` sub-splits each
    bucket by a second key hash — the EXACT expression the sink's
    wide-write path uses, so the pre-clustered promise still holds and
    each (bucket, sub) task lands one file, the documented wide-bucket
    layout. Per-key dedup stays valid because the sub key is a pure
    function of pk.
    """
    from pyspark.sql import Window

    from imp_etl_spark.plans.upsert import _bucket_expr

    bucket = _bucket_expr(pk, n_buckets)
    parts = [bucket]
    if files_per_bucket > 1:
        parts.append(F.pmod(
            F.xxhash64(*[F.col(k) for k in pk], F.lit("sub")),
            F.lit(files_per_bucket)))
    ks = F.struct(*[F.col(k) for k in pk])
    w = Window.partitionBy(*parts).orderBy(
        *[F.col(k).asc() for k in pk], F.col(order_col).desc())
    return (
        df.repartition(*parts)
        .withColumn("__first", ~F.lag(ks).over(w).eqNullSafe(ks))
        .filter(F.col("__first"))
        .drop("__first")
    )


def _branch(entity: DataFrame, keys: DataFrame, pk: list[str],
            cleanse_fn, order_col: str, compat: bool,
            persist: bool, sink_buckets: int | None,
            sink_files_per_bucket: int = 1) -> BranchResult:
    # cleanse is CPU-bound (regex/timestamp parsing); widen few-partition
    # local scans to all cores first (no-op on real multi-split tables).
    # probe=entity: the partition decision reads the raw scan, so the
    # semi join's broadcast isn't eagerly built just to count partitions
    pruned = spread_small_scan(semi_prune(entity, keys, "reference_no"),
                               probe=entity)
    cleansed = cleanse_fn(pruned, compat=compat)
    invalid = cleanse.any_falsy_key(pk)
    if persist:
        # skipped side-output, missing-ref warnings and the MERGE all
        # consume this node; persist turns the recomputation of
        # scan->semi-join->cleanse into one pass (MEMORY_AND_DISK:
        # spills rather than OOMs)
        cleansed = cleansed.persist(StorageLevel.MEMORY_AND_DISK)
    # counters ride the data (A2): recorded when the MERGE executes the
    # branch — no dedicated count jobs. The observation sits ON TOP of
    # the persisted node, on the merge-bound lineage ONLY: the
    # side-consumers (skipped sample, missing-ref warnings — possibly
    # partial actions like limit()) share the cache underneath without
    # ever executing the observed node, so they can run concurrently
    # with the merge and cannot fulfill the observation with partial
    # metrics. The filter(~invalid) is DOWNSTREAM of the observe, so
    # the metric still sees every cleansed row.
    tag = uuid.uuid4().hex[:8]
    obs_cleansed = Observation(f"cleansed_{tag}")
    observed = cleansed.observe(
        obs_cleansed, F.sum(invalid.cast("long")).alias("skipped"))
    skipped = cleansed.filter(invalid)
    obs_valid = Observation(f"valid_{tag}")
    # dedup fused into the sink's bucket layout when the sink's bucket
    # count is known (r13): one exchange instead of hash(pk) +
    # hash(bucket). The observe sits ON the post-dedup node either way,
    # so "processed" counts exactly the deduped rows the MERGE writes
    # (A2/A3 semantics unchanged).
    deduped = (
        _dedup_in_bucket_layout(observed.filter(~invalid), pk, order_col,
                                sink_buckets, sink_files_per_bucket)
        if sink_buckets else
        latest_per_key(observed.filter(~invalid), pk, [order_col],
                       desc=True))
    valid = deduped.observe(obs_valid,
                            F.count(F.lit(1)).alias("processed"))
    # J3 off the SAME branch point the merge materializes: a key present
    # in the entity always survives the semi prune, and cleanse never
    # rewrites reference_no, so keys ∖ cleansed.refs == keys ∖
    # entity.refs — the runner's warning sample then reads the persisted
    # blocks instead of re-running the entity scan (which for derived
    # entities is a whole join). Without the persisted branch point the
    # equivalence still holds but the cleansed lineage would RECOMPUTE
    # the CPU-bound cleanse just to list refs — anti-join the raw
    # entity there instead.
    missing = anti_missing(keys, cleansed if persist else entity,
                           "reference_no")
    return BranchResult(valid=valid, skipped=skipped, missing_refs=missing,
                        cleansed=cleansed if persist else None,
                        obs_cleansed=obs_cleansed, obs_valid=obs_valid)


def build_pipeline(queue: DataFrame, voucher: DataFrame,
                   transaction: DataFrame,
                   voucher_key: list[str] | None = None,
                   transaction_key: list[str] | None = None,
                   order_col: str = "reference_no",
                   compat: bool = True,
                   persist: bool = True,
                   sink_buckets: int | None = None,
                   sink_files_per_bucket: int = 1) -> PipelineResult:
    """Assemble the full dataflow. All lazy — nothing executes here
    (``persist`` only marks the branch points for caching).

    ``sink_buckets``: the bucket count of the MERGE sink the branches
    feed. When given, each branch's last-writer-wins dedup is fused
    into the sink's bucket layout (one exchange on the bucket
    expression instead of hash(pk) followed by the sink's
    hash(bucket); see ``_dedup_in_bucket_layout``) and the caller
    should pass ``batch_pre_clustered=True`` with the SAME
    ``n_buckets`` (and ``files_per_bucket``) to ``merge_upsert``.
    ``None`` keeps the plain hash(pk) dedup (callers that never hit
    the bucketed sink)."""
    keys = reference_keys(queue)
    vb = _branch(voucher, keys, voucher_key or ["voucher_id", "reference_no"],
                 cleanse_voucher, order_col, compat, persist, sink_buckets,
                 sink_files_per_bucket)
    tb = _branch(transaction, keys,
                 transaction_key or ["voucher_details_id", "reference_no"],
                 cleanse_transaction, order_col, compat, persist,
                 sink_buckets, sink_files_per_bucket)
    return PipelineResult(voucher=vb, transaction=tb, keys=keys)
