"""Deterministic, oracle-portable hashing primitives.

Design constraint: every hash here must be computable *identically* in
Spark SQL and in DuckDB SQL (the correctness oracle), using only
portable expressions. So we avoid engine-specific hash builtins
(``xxhash64``/``hash`` differ across engines) and build on ``md5``,
which both engines implement identically, plus 64-bit modular
arithmetic kept below 2^62 so neither engine overflows.

Primitives:

- ``hex_prefix_hash(s)``: first 8 hex chars of md5(s) as a BIGINT in
  [0, 2^32).  Spark: ``conv(substring(md5(s),1,8),16,10)``;
  DuckDB: ``('0x'||substring(md5(s),1,8))::BIGINT``.
- ``minhash_value(h, k)``: the k-th universal hash
  ``(a_k * (h mod P) + b_k) mod P`` with P = 2^31-1 (Mersenne).
  ``a_k``/``b_k`` are derived from k by fixed multipliers (Knuth), so
  Spark and the SQL oracle agree with no shared state.

At 100 TB these are single-pass narrow column expressions inside
whole-stage codegen — no shuffle, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MERSENNE_P = (1 << 31) - 1  # 2147483647
_A_MULT = 2654435761  # Knuth multiplicative constant
_B_MULT = 40503


def hash_coeffs(k: int) -> tuple[int, int]:
    """Deterministic universal-hash coefficients for seed k (a != 0)."""
    a = (k * _A_MULT + 1) % MERSENNE_P
    if a == 0:
        a = 1
    b = (k * _B_MULT + 7) % MERSENNE_P
    return a, b


def hex_prefix_hash(s: Column) -> Column:
    """md5-derived 32-bit integer hash of a string column (JVM-side)."""
    return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("bigint")


def hex_prefix_hash_sql_spark(expr: str) -> str:
    """Spark-SQL text form of :func:`hex_prefix_hash`."""
    return f"CAST(conv(substring(md5({expr}),1,8),16,10) AS BIGINT)"


def hex_prefix_hash_sql_duckdb(expr: str) -> str:
    """DuckDB text form — must agree value-for-value with Spark's."""
    return f"(('0x'||substring(md5({expr}),1,8))::BIGINT)"


def minhash_value(h: Column, k: int) -> Column:
    """(a_k * (h mod P) + b_k) mod P — stays below 2^62, overflow-free."""
    a, b = hash_coeffs(k)
    return (F.lit(a) * (h % MERSENNE_P) + F.lit(b)) % MERSENNE_P


def minhash_value_sql(h_expr: str, k: int) -> str:
    """Engine-neutral SQL text form of :func:`minhash_value`."""
    a, b = hash_coeffs(k)
    return f"(({a} * (({h_expr}) % {MERSENNE_P}) + {b}) % {MERSENNE_P})"


def simhash_bit(h: Column, bit: int) -> Column:
    """Bit ``bit`` (0-based) of a non-negative hash as ±1 weight.

    Uses only modulo (no division) — float-division semantics differ
    between Spark (truncating int cast) and DuckDB (rounding cast).
    """
    return F.when((h % (1 << (bit + 1))) >= (1 << bit), F.lit(1)).otherwise(F.lit(-1))


def simhash_bit_sql(h_expr: str, bit: int) -> str:
    """Engine-neutral SQL: bit of hash as +1/-1 (modulo-only, portable)."""
    return f"(CASE WHEN (({h_expr}) % {1 << (bit + 1)}) >= {1 << bit} THEN 1 ELSE -1 END)"
