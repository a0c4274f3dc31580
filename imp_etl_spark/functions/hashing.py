"""Portable hashing primitives for dedup/similarity operators.

MinHash uses keyed md5 hex digests with *lexicographic* min as the
permutation hash: md5 is available and identical in Spark, DuckDB,
Python — so the DuckDB oracle can verify LSH output exactly — and taking
the min of a uniformly-distributed digest is the only property MinHash
needs. SimHash defaults to xxhash64 (JVM-side, fast) with an md5 compat
mode (``hash_fn='md5'``) that makes it oracle-checkable the same way.
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
    product inside exact i64 — identical in any engine.

    Shape matters here: a per-permutation ``array_min(transform(...))``
    would mention ``hashes_col`` once PER PERMUTATION, and after
    projection collapse Catalyst inlines the base-hash expression (the
    md5+conv pass) into every mention — 12x the hashing work (measured
    3.1 s -> 0.5 s on the sf0.1 signature build). One ``aggregate``
    pass instead folds a running-min array over the shingles, reading
    each base hash exactly once as a lambda variable. Identical output:
    min over shingles of perm_i(h), permutation by permutation; the
    initial accumulator is p (every pmod value is < p).

    Self-defending on degenerate input (ADVICE r6): an EMPTY hashes
    array yields NULL — not the [p]*num_hashes seed, which would be a
    valid-looking signature shared by every contentless doc and would
    band-collide them all — so correctness no longer rests on callers'
    zero-shingle filters. And num_hashes beyond the permutation table
    raises loudly instead of NULL-padding the signature tail into a
    shared constant (least() skips NULLs)."""
    if num_hashes > len(MINHASH_A):
        raise ValueError(
            f"num_hashes={num_hashes} exceeds the {len(MINHASH_A)}-entry "
            "permutation table (MINHASH_A/MINHASH_B); extend the tables "
            "rather than let the signature tail degrade to a constant")
    p = F.lit(MERSENNE31).cast("long")
    a_arr = F.array(*[F.lit(a).cast("long")
                      for a in MINHASH_A[:num_hashes]])
    b_arr = F.array(*[F.lit(b).cast("long")
                      for b in MINHASH_B[:num_hashes]])
    init = F.array(*[p] * num_hashes)
    return F.when(
        F.size(hashes_col) > 0,
        F.aggregate(
            hashes_col, init,
            lambda acc, h: F.zip_with(
                acc,
                F.zip_with(a_arr, b_arr,
                           lambda a, b: F.pmod(h * a + b, p)),
                lambda m, v: F.least(m, v)),
        ))


def token_hash(t: Column, bits: int, hash_fn: str = "xxhash64") -> Column:
    """Per-token hash supplying ``bits`` usable low bits.

    ``xxhash64`` is the fast JVM-side default; ``md5`` takes the first
    ceil(bits/4) hex chars of md5 — slower, but byte-identical in Spark,
    DuckDB and Python, so md5-mode SimHash is verifiable by the SQL
    oracle (same portability trick as ``minhash_hex``).
    """
    if hash_fn == "xxhash64":
        return F.xxhash64(t)
    if hash_fn == "md5":
        hex_chars = (bits + 3) // 4
        if hex_chars > 15:
            raise ValueError("md5 token_hash supports at most 60 bits")
        return F.conv(F.substring(F.md5(t), 1, hex_chars), 16, 10).cast("long")
    raise ValueError(f"unknown hash_fn {hash_fn!r}")


def simhash(tokens_col: Column, bits: int = 32,
            hash_fn: str = "xxhash64") -> Column:
    """SimHash over tokens: per-bit ±1 votes from ``token_hash(token)``,
    sign of the vote sum becomes the bit. Returns a long (low ``bits``
    bits). Near-duplicates then compare by hamming distance — see
    ``operators.dedup``.

    Each token is hashed ONCE (a ``transform`` pass), then a single
    ``aggregate`` folds the per-bit votes as an array accumulator — the
    hash is read ``bits`` times as a lambda variable, never recomputed.
    ``hash_fn='md5'`` makes the whole computation reproducible in the
    DuckDB oracle (ties at vote==0 resolve to bit 0 identically: integer
    votes, no float anywhere).
    """
    powers = F.array(*[F.lit(1 << j).cast("long") for j in range(bits)])
    hs = F.transform(tokens_col, lambda t: token_hash(t, bits, hash_fn))
    votes = F.aggregate(
        hs,
        F.array_repeat(F.lit(0).cast("long"), bits),
        lambda acc, h: F.zip_with(
            acc, powers,
            lambda a, p: a + F.when(h.bitwiseAND(p) != 0,
                                    F.lit(1)).otherwise(F.lit(-1)),
        ),
    )
    bitvals = F.zip_with(
        votes, powers,
        lambda v, p: F.when(v > 0, p).otherwise(F.lit(0).cast("long")),
    )
    return F.aggregate(bitvals, F.lit(0).cast("long"),
                       lambda acc, x: acc + x)


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two longs (bit_count of xor)."""
    return F.bit_count(a.bitwiseXOR(b))
