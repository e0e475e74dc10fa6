"""Portable deterministic hashing (Spark <-> DuckDB identical).

Spark's xxhash64/hash are JVM-specific; to let every dedup operator be
verified against a DuckDB SQL oracle we standardize on md5 (identical
bytes in both engines) reduced to a 60-bit integer:

  Spark : conv(substr(md5(x), 1, 15), 16, 10)  cast long
  DuckDB: ('0x' || substr(md5(x), 1, 15))::BIGINT

MinHash permutations are universal-hash style (a*h + b) mod P with
P = 1e9+7 and per-permutation constants derived from the permutation
index -- plain 64-bit-safe integer arithmetic in both engines
(h mod P < 2^30, a < 2^31, so a*h' + b < 2^62).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

P_MOD = 1_000_000_007
A_MUL = 1_000_003
B_MUL = 998_244_353


def hash60(col: Column) -> Column:
    """60-bit integer hash of a string column, md5-based, portable."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def hash60_sql(expr: str) -> str:
    """DuckDB SQL text computing the same value as :func:`hash60`."""
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


def minhash_perm(h_mod_p: Column, j: int) -> Column:
    """j-th permutation value of a pre-reduced hash (h % P_MOD)."""
    a = (j * A_MUL + 1) % P_MOD
    b = (j * B_MUL + 7) % P_MOD
    return (F.lit(a) * h_mod_p + F.lit(b)) % F.lit(P_MOD)


def minhash_perm_sql(h_expr: str, j: int) -> str:
    a = (j * A_MUL + 1) % P_MOD
    b = (j * B_MUL + 7) % P_MOD
    return f"(({a} * {h_expr} + {b}) % {P_MOD})"
