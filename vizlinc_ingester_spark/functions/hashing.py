"""Deterministic cross-engine hashing (dedup / LSH primitives).

Spark's ``xxhash64`` and DuckDB's ``hash`` disagree, so every hash this
engine uses for MinHash/SimHash/fingerprinting is built from ``md5``
(bit-identical hex in both engines): take the first 15 hex chars
(60 bits, always fits a signed 64-bit int) and parse as an integer.

MinHash permutations are universal hashes ``(a*x + b) mod P`` with
P = 4294967291 (largest 32-bit prime) and LCG-derived constants, so
``a*(x mod P) + b < 2^62`` never overflows a BIGINT in either engine.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

P = 4294967291  # largest prime < 2^32
_HEX_CHARS = 15


def _lcg_constants(k: int, seed: int = 0x5EED) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for k MinHash permutations."""
    state = seed
    out = []
    for _ in range(k):
        state = (6364136223846793005 * state + 1442695040888963407) % (1 << 63)
        a = (state >> 16) % ((1 << 30) - 1) + 1
        state = (6364136223846793005 * state + 1442695040888963407) % (1 << 63)
        b = (state >> 16) % P
        out.append((a, b))
    return out


MINHASH_PERMS = _lcg_constants(16)


def stable_hash64(c: Column) -> Column:
    """60-bit integer hash of a string, identical in Spark and DuckDB."""
    return F.conv(F.substring(F.md5(c), 1, _HEX_CHARS), 16, 10).cast("long")


def minhash_term(c: Column, perm: int) -> Column:
    """One permuted hash value; MIN-aggregate it per group for MinHash."""
    a, b = MINHASH_PERMS[perm]
    return (F.lit(a) * (stable_hash64(c) % F.lit(P)) + F.lit(b)) % F.lit(P)


def simhash16(tokens_hash_col: Column) -> Column:
    """16-bit SimHash from an array<long> of token hashes.

    bit j of the result is 1 iff sum over tokens of (2*bit_j(h) - 1) > 0.
    """
    total = F.size(tokens_hash_col).cast("long")

    def bit_counter(j: int):
        # two-arg lambda only: extra params would be misparsed by Spark
        return lambda acc, x: acc + F.shiftright(x, j).bitwiseAND(F.lit(1))

    out = F.lit(0).cast("long")
    for j in range(16):
        ones = F.aggregate(tokens_hash_col, F.lit(0).cast("long"), bit_counter(j))
        bit = F.when(ones * 2 > total, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        out = out + F.shiftleft(bit, j)
    return out


def hamming16(a: Column, b: Column) -> Column:
    x = a.bitwiseXOR(b)
    out = F.lit(0)
    for j in range(16):
        out = out + F.shiftright(x, j).bitwiseAND(F.lit(1))
    return out


# ---------------------------------------------------------------------------
# DuckDB oracle side
# ---------------------------------------------------------------------------

def sql_stable_hash64(expr: str) -> str:
    return f"CAST(('0x' || substr(md5({expr}), 1, {_HEX_CHARS})) AS BIGINT)"


def sql_minhash_term(expr: str, perm: int) -> str:
    a, b = MINHASH_PERMS[perm]
    return f"(({a} * ({sql_stable_hash64(expr)} % {P}) + {b}) % {P})"


def sql_hamming16(a: str, b: str) -> str:
    terms = " + ".join(f"((xor({a}, {b}) >> {j}) & 1)" for j in range(16))
    return f"({terms})"


def sql_simhash16(hashes_expr: str) -> str:
    """DuckDB mirror of ``simhash16`` over a BIGINT[] expression."""
    total = f"len({hashes_expr})"
    bits = " + ".join(
        f"(CASE WHEN 2 * len(list_filter({hashes_expr}, h -> ((h >> {j}) & 1) = 1))"
        f" > {total} THEN (CAST(1 AS BIGINT) << {j}) ELSE 0 END)"
        for j in range(16)
    )
    return f"({bits})"
