"""Query-registry core: the dict and the ``@register`` decorator.

A LEAF module so every ``queries_*`` file can be imported directly
(first, in any order) without re-entering ``queries.py``'s full
late-import chain. ``queries.py`` owns the complete load (all query
modules + the driver-window reorder); this module owns only the shared
mutable state. Entry points that need the FULL registry must import
``imp_etl_spark.queries``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# Thread-safety contract for registered queries: a QueryFn must be
# safe to call concurrently with any other registry entry on a SHARED
# SparkSession and a SHARED sf_dir (tests/test_empty_inputs.py and
# tools/fuzz_differential.py sweep the registry from a thread pool).
# Concretely: build the plan from `read_table`/pure DataFrame ops (the
# shared temp-view re-registration in `load_tables` is idempotent for
# a fixed sf_dir, which is what makes the shared-sf_dir sweeps sound);
# any per-call mutable state (caches, temp paths, session confs) must
# be lock-serialized or keyed so concurrent callers can't observe each
# other — the dedup tier's shared-artifact memo is the lock-serialized
# precedent. A query that can't meet this must not join REGISTRY.
REGISTRY: dict[str, tuple[QueryFn, str | None]] = {}


def register(name: str, sql: str | None):
    def deco(fn: QueryFn):
        REGISTRY[name] = (fn, sql)
        return fn
    return deco
