"""Skew-mitigation operators: salted aggregation and salted joins.

Not in the reference (its per-record point lookups can't skew — SURVEY.md
§2.3/§4); essential at 100 TB, where one hot key (a boilerplate document,
a null-ish default, a celebrity user) turns a shuffle into a single
straggler task. AQE's skew-join splitting (enabled in session.py) covers
sort-merge joins after the fact; these operators handle the cases AQE
does not: aggregation skew (one reducer gets the hot group) and
deliberate pre-salting when the hot keys are known or must be handled
deterministically.

- ``salted_agg``: two-phase decomposable aggregation — groupBy(key, salt)
  partial, then groupBy(key) final. The hot group fans out over
  ``buckets`` reducers in phase 1; phase 2 moves only ``buckets`` rows
  per key. Works for any algebraic aggregate (sum/count/min/max — pass
  both phases explicitly).
- ``salted_join``: replicate the build side ``buckets``× (one copy per
  salt value), salt the probe side deterministically, join on
  (key, salt). Probe rows of a hot key spread across ``buckets`` tasks;
  build-side cost grows ``buckets``× — use when the build side is too
  big to broadcast but small enough to replicate a few times.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT = "__salt"


def _salt_probe(df: DataFrame, buckets: int) -> Column:
    """Deterministic per-row salt: hash of the whole row, mod buckets.
    (Deterministic so retries/replays land identically — rand() would
    break exactly-once sinks downstream.)"""
    return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]),
                  F.lit(buckets)).cast("int")


def salted_agg(df: DataFrame, keys: Sequence[str],
               partial: Sequence[Column], final: Sequence[Column],
               buckets: int = 16) -> DataFrame:
    """Two-phase aggregation immune to group skew.

    ``partial`` aggregates run per (keys, salt); ``final`` aggregates
    combine the per-salt partials per key and must reference the partial
    aliases (e.g. partial ``sum(x) AS s`` -> final ``sum(s) AS s``).
    """
    salted = df.withColumn(SALT, _salt_probe(df, buckets))
    part = salted.groupBy(*keys, SALT).agg(*partial)
    return part.groupBy(*keys).agg(*final)


def salted_join(probe: DataFrame, build: DataFrame,
                on: Sequence[str] | str, buckets: int = 8,
                how: str = "inner") -> DataFrame:
    """Equi join with the probe side salted and the build side
    replicated ``buckets``x, joining on (on..., salt)."""
    on = [on] if isinstance(on, str) else list(on)
    p = probe.withColumn(SALT, _salt_probe(probe, buckets))
    b = build.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1))).alias(SALT)
    ).withColumn(SALT, F.col(SALT).cast("int"))
    return p.join(b, on=on + [SALT], how=how).drop(SALT)
