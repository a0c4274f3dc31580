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
    def _salted(i: int):
        def fn(s):
            return F.md5(F.concat(F.lit(f"{i}:"), s))
        return fn

    return F.array(*[
        F.array_min(F.transform(shingles_col, _salted(i)))
        for i in range(num_hashes)
    ])


#: MinHash permutation parameters: h_i = (A[i]*h + B[i]) mod MERSENNE31.
#: Fixed constants (odd multipliers) so every engine — Spark, DuckDB,
#: plain Python — derives identical signatures from one md5 per shingle.
MERSENNE31 = 2147483647
MINHASH_A = [769, 1031, 2053, 4099, 8209, 16411, 32771, 65537,
             131101, 262147, 524309, 1048583]
MINHASH_B = [12289, 24593, 49157, 98317, 196613, 393241, 786433,
             1572869, 3145739, 6291469, 12582917, 25165843]


def shingle_hash(s: Column) -> Column:
    """Base hash: first 15 md5 hex chars (60 bits) -> int mod 2^31-1.
    Computed ONCE per shingle; permutations are cheap arithmetic."""
    return F.pmod(
        F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long"),
        F.lit(MERSENNE31).cast("long"),
    )


def minhash_int(hashes_col: Column, num_hashes: int) -> Column:
    """MinHash signature from pre-hashed shingles: array of
    min((A[i]*h + B[i]) mod p). A[i] < 2^21 and h < 2^31 keep every
    product inside exact i64 — identical in any engine."""

    def _perm(i: int):
        a, b = MINHASH_A[i], MINHASH_B[i]

        def fn(h):
            return F.pmod(h * F.lit(a).cast("long") + F.lit(b),
                          F.lit(MERSENNE31).cast("long"))
        return fn

    return F.array(*[
        F.array_min(F.transform(hashes_col, _perm(i)))
        for i in range(num_hashes)
    ])


def simhash(tokens_col: Column, bits: int = 32) -> Column:
    """SimHash over tokens: per-bit ±1 votes from xxhash64(token), sign
    of the vote sum becomes the bit. Returns a long (low ``bits`` bits).

    Near-duplicates then compare by hamming distance — see
    ``operators.dedup``. xxhash64 keeps this JVM-side and fast; it is not
    portable to the SQL oracle (rows-only check).
    """
    def _vote_fn(j: int):
        def merge(acc, t):
            return acc + F.when(
                F.shiftright(F.xxhash64(t), j).bitwiseAND(F.lit(1)) == 1,
                F.lit(1),
            ).otherwise(F.lit(-1))
        return merge

    result = F.lit(0).cast("long")
    for j in range(bits):
        vote = F.aggregate(tokens_col, F.lit(0).cast("long"), _vote_fn(j))
        result = result + F.when(vote > 0, F.lit(2 ** j).cast("long")).otherwise(F.lit(0).cast("long"))
    return result


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two longs (bit_count of xor)."""
    return F.bit_count(a.bitwiseXOR(b))
