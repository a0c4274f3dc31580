"""ETL control plane: the Express API's lifecycle verbs as driver calls.

The reference wraps its pipeline in an HTTP control plane (SURVEY.md §3):
``POST /api/start-etl`` (cron-schedule, ``index.js:46-112``),
``POST /api/start-etl-force`` (run now, ``index.js:114-164``),
``POST /api/stop-etl`` (``index.js:166-206``), ``GET /api/etl-status``
(``index.js:329-342``), guarded by a single ``isEtlRunning`` flag
(``index.js:25``) that does NOT prevent cron-fire overlap with a long run
(ST6 — interleaved runs visible at ``logs/RSBSAetl.log:10-13``). Here the
same verbs drive Structured Streaming, whose scheduler serializes epochs
— the overlap bug is structurally impossible:

- ``run_once``     = start-etl-force (Trigger.AvailableNow, blocks)
- ``schedule``     = start-etl (processing-time trigger = the cron clock)
- ``stop``         = stop-etl (in-flight epoch finishes, like task.stop())
- ``status``       = etl-status (flag + schedule + durations, same keys)

HTTP itself stays out of engine scope (SURVEY §7.7) — any server can
wrap these four calls.
"""

from __future__ import annotations

import threading
import time
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from imp_etl_spark.plans.runner import run_etl
from imp_etl_spark.streaming.etl_stream import run_etl_stream


def _release_query_caches() -> int:
    """Between-run cache hygiene for a LONG-LIVED controller (VERDICT r6
    item 3): the dedup tier tracks its candidate/verified-pair persists
    in a module registry that holds STRONG references — Spark's
    CacheManager keeps cached plans until an explicit unpersist, so
    nothing is reclaimed implicitly. A driver that interleaves dedup
    queries with scheduled ETL epochs would grow that registry without
    bound; releasing here (after every run_once and every scheduled
    epoch) keeps it empty between runs. Cheap no-op (returns 0) when no
    dedup query ran since the last release. Also drops the lag-dispatch
    probe memo (round 9) so the next run re-probes fresh data — memo
    staleness is benign (plan choice only) but a scheduled driver sees
    new data every epoch, and the fresh probe is two map-side passes."""
    from imp_etl_spark.operators.window import release_probe_memo
    from imp_etl_spark.queries_llm import release_dedup_caches

    return release_dedup_caches() + release_probe_memo()


class EtlController:
    """Lifecycle wrapper over the batch runner and the streaming epochs.

    ``run_once``/``schedule`` make their is_running check-and-start
    ATOMIC under an internal lock: two concurrent callers (e.g. the
    HTTP server's force and schedule verbs racing) cannot both pass the
    guard and write the same sink paths — the reference's isEtlRunning
    overlap hole (ST6) closed at the controller itself, not just in the
    transport above it.
    """

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._guard = threading.Lock()
        self._query = None
        self._cron = None
        self._schedule: str | None = None
        self._started_at: float | None = None
        self._last_summary: dict[str, Any] | None = None
        self.epoch_summaries: list[dict[str, Any]] = []

    # -- start-etl-force ---------------------------------------------------
    def run_once(self, queue: DataFrame, voucher: DataFrame,
                 transaction: DataFrame, voucher_path: str, txn_path: str,
                 **kwargs) -> dict[str, Any]:
        """Synchronous single run; returns the reference-shaped summary
        (etlService.js:576-583). Refuses while a schedule is active —
        the isEtlRunning guard, minus its overlap hole."""
        with self._guard:
            if self.is_running:
                raise RuntimeError("ETL is already running; stop it first")
            self._started_at = time.time()
        try:
            self._last_summary = run_etl(
                self.spark, queue, voucher, transaction,
                voucher_path, txn_path, **kwargs)
            return self._last_summary
        finally:
            self._started_at = None
            _release_query_caches()

    # -- start-etl (scheduled) --------------------------------------------
    def schedule(self, queue_stream: DataFrame, voucher: DataFrame,
                 transaction: DataFrame, voucher_path: str, txn_path: str,
                 checkpoint_dir: str, every: str = "1 minute",
                 clock=None, tick: float = 1.0,
                 **kwargs) -> None:
        """Start the recurring schedule (start-etl, ST1). ``every`` is
        either a Spark interval string / ``* * * * *`` (mapped to a
        processing-time trigger — pure cadence, no phase) or ANY other
        valid node-cron pattern — incl. calendar shapes like
        ``0 9 * * 1-5`` the reference accepts via cron.validate /
        cron.schedule (index.js:30-37, 75-86). Cron shapes run on
        a driver-side wall-clock scheduler (plans/cron.py, Asia/Manila
        like the reference): each fire executes ONE AvailableNow epoch
        of the same streaming pipeline against the SAME checkpoint, so
        idempotence/watermark semantics match the interval path and
        fires serialize (a long epoch absorbs missed matches — the
        overlap the reference's isEtlRunning hole allowed, ST6).
        ``clock``/``tick`` inject a test clock into the cron thread."""
        from imp_etl_spark.plans.cron import CronScheduler, classify_schedule

        kind = classify_schedule(every)
        if kind is None:
            raise ValueError(f"invalid schedule pattern: {every!r}")
        with self._guard:
            if self.is_running:
                raise RuntimeError("ETL is already scheduled")
            # claim the slot BEFORE the (slow) stream start so a racing
            # run_once/schedule sees is_running immediately
            self._started_at = time.time()
        try:
            self.epoch_summaries.clear()
            if kind[0] == "interval":
                self._query = run_etl_stream(
                    self.spark, queue_stream, voucher, transaction,
                    voucher_path, txn_path, checkpoint_dir,
                    available_now=False, processing_time=kind[1],
                    epoch_summaries=self.epoch_summaries,
                    on_epoch_end=_release_query_caches, **kwargs)
            else:
                def _fire() -> None:
                    q = run_etl_stream(
                        self.spark, queue_stream, voucher, transaction,
                        voucher_path, txn_path, checkpoint_dir,
                        available_now=True,
                        epoch_summaries=self.epoch_summaries,
                        on_epoch_end=_release_query_caches, **kwargs)
                    # register the fire's query on the controller while
                    # the epoch runs (r11, ADVICE): stop() can then
                    # q.stop() an epoch that outlasts the scheduler
                    # thread's join instead of abandoning it handleless
                    with self._guard:
                        self._query = q
                    try:
                        q.awaitTermination()
                    finally:
                        with self._guard:
                            if self._query is q:
                                self._query = None

                self._cron = CronScheduler(
                    kind[1], _fire, now_fn=clock, tick=tick).start()
        except BaseException:
            self._started_at = None
            raise
        self._schedule = every

    # -- stop-etl ----------------------------------------------------------
    def stop(self) -> dict[str, Any]:
        """Stop the schedule; the in-flight epoch completes first (the
        reference's task.stop() likewise only halts FUTURE fires, ST5).

        Claim-aware: if no query exists but ``_started_at`` is set, a
        ``run_once``/``schedule`` start is IN FLIGHT (slot claimed under
        the guard, work not yet registered) — stop must not erase that
        claim, or a concurrent third caller could pass the guard and
        double-start (the ST6 hole through the back door). In that case
        this is a no-op on state; call again once the start completes.
        """
        with self._guard:
            q = self._query
            cr = self._cron
        if cr is not None:
            # wall-clock cron: halt FUTURE fires first (non-blocking),
            # then pick up an in-flight fire's registered query so the
            # q.stop() below ends its epoch instead of this thread
            # blocking the full join timeout behind it (r11, ADVICE —
            # an epoch outlasting the join used to keep running with
            # no handle left to stop it)
            cr.signal_stop()
            if q is None:
                with self._guard:
                    q = self._query
        if q is not None:
            # stop BEFORE releasing the handle: if q.stop() raises (a
            # dying stream's py4j error), _query stays set and a retry
            # stop() can still succeed — popping first would strand the
            # controller with is_running=True and no recovery path
            q.stop()
            q.awaitTermination(60)
        if cr is not None:
            # the scheduler thread exits promptly now that the epoch is
            # stopped; join it, then sweep for a fire that registered
            # its query BETWEEN the signal and the join (it ran — the
            # signal only stops future fires) and stop that one too
            cr.stop()
            with self._guard:
                q2 = self._query if self._query is not q else None
            if q2 is not None:
                q2.stop()
                q2.awaitTermination(60)
        out = self.status()  # uptime snapshot before the claim clears
        if q is not None or cr is not None:
            with self._guard:
                if self._query is q:
                    self._query = None
                if self._cron is cr:
                    self._cron = None
                self._schedule = None
                self._started_at = None
        return out

    # -- etl-status / health ----------------------------------------------
    @property
    def is_running(self) -> bool:
        if self._query is not None:
            return self._query.isActive
        if self._cron is not None:
            return self._cron.is_alive
        return self._started_at is not None

    def status(self) -> dict[str, Any]:
        """The GET /api/etl-status shape (index.js:329-342)."""
        return {
            "isRunning": self.is_running,
            "schedule": self._schedule,
            "uptimeSec": round(time.time() - self._started_at, 3)
            if self._started_at else None,
            "epochsCompleted": len(self.epoch_summaries),
            "lastSummary": self._last_summary,
        }
