"""Portable hashing: identical values from Spark expressions and
DuckDB SQL.

Spark's ``xxhash64``/``hash`` have no DuckDB twin, so every
cross-engine-checked operator hashes through **md5** (both engines
produce identical hex) and converts hex → int arithmetically:

    Spark :  CAST(conv(substring(md5(x), 1, 15), 16, 10) AS BIGINT)
    DuckDB:  ('0x' || substring(md5(x), 1, 15))::BIGINT

15 hex digits = 60 bits < 2**63, so the bigint never overflows and the
two engines agree bit-for-bit.

MinHash permutations are the classic universal family
h_i(x) = (a_i * x + b_i) mod p with p = 2**31 - 1 (Mersenne prime) and
(a_i, b_i) from a fixed seeded stream — x is first reduced mod p so
a*x stays under 2**62 (no bigint overflow on either engine).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MERSENNE_P = (1 << 31) - 1

# Fixed (a, b) parameters for k=16 minhash permutations, generated once
# from a seeded LCG (seed 42) and frozen here so Spark and SQL sides
# can never drift. a in [1, p-1], b in [0, p-1].
_LCG_M = (1 << 61) - 1


def _perm_params(k: int, seed: int = 42) -> list[tuple[int, int]]:
    state = seed
    out = []
    for _ in range(k):
        state = (6364136223846793005 * state + 1442695040888963407) % _LCG_M
        a = state % (MERSENNE_P - 1) + 1
        state = (6364136223846793005 * state + 1442695040888963407) % _LCG_M
        b = state % MERSENNE_P
        out.append((a, b))
    return out


MINHASH_K = 16
MINHASH_PARAMS = _perm_params(MINHASH_K)


def md5_int(col: Column) -> Column:
    """60-bit integer from md5 — Spark side of the portable hash."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def md5_int_sql(expr: str) -> str:
    """DuckDB SQL producing the identical integer."""
    return f"(('0x' || substring(md5({expr}), 1, 15))::BIGINT)"


def minhash_value(token_int: Column, i: int) -> Column:
    """h_i applied to a pre-hashed token integer (Spark side)."""
    a, b = MINHASH_PARAMS[i]
    x = token_int % F.lit(MERSENNE_P)
    return (F.lit(a) * x + F.lit(b)) % F.lit(MERSENNE_P)


def minhash_value_sql(token_int_expr: str, i: int) -> str:
    """h_i in DuckDB SQL (identical arithmetic)."""
    a, b = MINHASH_PARAMS[i]
    return f"(({a} * ({token_int_expr} % {MERSENNE_P}) + {b}) % {MERSENNE_P})"


def det_id(*cols: Column | str) -> Column:
    """Deterministic row id: sha2 over '#'-joined parts (SURVEY P6)."""
    return F.sha2(F.concat_ws("#", *cols), 256)


def det_id_sql(*exprs: str) -> str:
    joined = ", '#', ".join(exprs)
    return f"sha256(concat({joined}))"
