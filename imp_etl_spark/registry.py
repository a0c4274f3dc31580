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

REGISTRY: dict[str, tuple[QueryFn, str | None]] = {}


def register(name: str, sql: str | None):
    def deco(fn: QueryFn):
        REGISTRY[name] = (fn, sql)
        return fn
    return deco
