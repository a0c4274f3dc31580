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
    """Cosine similarity: dot / (||a|| * ||b||).

    try_divide: a zero-norm vector (an all-zero embedding — encoder
    padding rows, dead inputs) has undefined cosine. NULL matches the
    SQL oracle's x/0 and ranks last under desc ordering in BOTH engines
    (Spark desc = nulls last, DuckDB default_null_order = nulls last),
    where ANSI division would abort the whole top-k job."""
    return F.try_divide(dot(a, b), norm2(a) * norm2(b))


def cosine_arrow_udf(query_vec: list[float]):
    """Arrow-batched (pandas_udf) cosine against a FIXED query vector —
    the escape hatch for vector ops the builtins can't express (learned
    scorers, library kernels). For plain cosine the builtin above wins:
    it stays inside whole-stage codegen with zero Python transfer, while
    this path ships Arrow batches to a Python worker and back. Kept as
    the documented pattern (vectorized numpy over whole batches — never
    a row-at-a-time Python UDF) and pinned equal to the builtin in
    tests/test_similarity.py.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    q = np.asarray(query_vec, dtype=np.float64)
    qn = np.sqrt((q * q).sum())

    def _cos(col):
        m = np.stack(col.to_numpy())  # (batch, dim) — one matmul per batch
        num = m.astype(np.float64) @ q
        den = np.sqrt((m.astype(np.float64) ** 2).sum(axis=1)) * qn
        return pd.Series(num / den)

    # real annotation objects: this module's `from __future__ import
    # annotations` would stringify inline hints, which pandas_udf's
    # signature inference rejects
    _cos.__annotations__ = {"col": pd.Series, "return": pd.Series}
    return pandas_udf("double")(_cos)
