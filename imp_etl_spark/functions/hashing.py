"""Portable hashing primitives for dedup/similarity operators.

MinHash uses keyed md5 hex digests with *lexicographic* min as the
permutation hash: md5 is available and identical in Spark, DuckDB,
Python — so the DuckDB oracle can verify LSH output exactly — and taking
the min of a uniformly-distributed digest is the only property MinHash
needs. SimHash uses xxhash64 (JVM-side, fast) and is therefore
Spark-only (rows-only correctness check).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def shingles(tokens_col: Column, k: int) -> Column:
    """Token k-shingles: space-joined sliding windows of k tokens.

    Documents shorter than k tokens produce a single shingle of the whole
    document (so short docs still participate in dedup).
    """
    n = F.size(tokens_col)
    windows = F.transform(
        F.sequence(F.lit(1), n - F.lit(k - 1)),
        lambda i: F.concat_ws(" ", F.slice(tokens_col, i, k)),
    )
    whole = F.array(F.concat_ws(" ", tokens_col))
    return F.when(n >= k, windows).when(n > 0, whole).otherwise(
        F.array().cast("array<string>")
    )


def minhash_hex(shingles_col: Column, num_hashes: int) -> Column:
    """MinHash signature: array of ``num_hashes`` lexicographic-min md5
    digests of salted shingles (salt = permutation index)."""
    return F.array(*[
        F.array_min(
            F.transform(
                shingles_col,
                lambda s, i=i: F.md5(F.concat(F.lit(f"{i}:"), s)),
            )
        )
        for i in range(num_hashes)
    ])


def simhash(tokens_col: Column, bits: int = 32) -> Column:
    """SimHash over tokens: per-bit ±1 votes from xxhash64(token), sign
    of the vote sum becomes the bit. Returns a long (low ``bits`` bits).

    Near-duplicates then compare by hamming distance — see
    ``operators.dedup``. xxhash64 keeps this JVM-side and fast; it is not
    portable to the SQL oracle (rows-only check).
    """
    result = F.lit(0).cast("long")
    for j in range(bits):
        vote = F.aggregate(
            tokens_col,
            F.lit(0).cast("long"),
            lambda acc, t, j=j: acc + F.when(
                F.shiftright(F.xxhash64(t), j).bitwiseAND(F.lit(1)) == 1,
                F.lit(1),
            ).otherwise(F.lit(-1)),
        )
        result = result + F.when(vote > 0, F.lit(2 ** j).cast("long")).otherwise(F.lit(0).cast("long"))
    return result


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two longs (bit_count of xor)."""
    return F.bit_count(a.bitwiseXOR(b))
