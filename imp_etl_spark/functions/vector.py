"""Vector math over ``array<float>`` embedding columns — pure built-ins.

``zip_with`` + ``aggregate`` keep the arithmetic JVM-side (SURVEY.md
§2.9: expressible without UDFs, so default to builtins). The fold is
sequential over the array, so the result is deterministic and matches a
same-order fold in the DuckDB oracle bit-for-bit (both engines widen
float->double exactly and add in array order).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Dot product of two float arrays, accumulated in double."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0).cast("double"),
        lambda acc, v: acc + v,
    )


def norm2(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity: dot / (||a|| * ||b||)."""
    return dot(a, b) / (norm2(a) * norm2(b))
