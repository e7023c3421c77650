"""Engine-portable deterministic hashing.

Everything in the dedup/similarity/fingerprint stack needs hash values that
are IDENTICAL in Spark and in the DuckDB oracle. Neither engine's native
hash() matches the other, but both implement md5 over UTF-8 strings with
identical hex output — so every hash here derives from md5 substrings
converted to int64 (≤15 hex chars = 60 bits, always positive, no signed
overflow).

Each helper has a Spark Column form and a DuckDB SQL-string form generated
from the same parameters; oracle SQL is built from these so the two sides
cannot drift.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MOD = 1_000_000_007


def md5_int(col: Column, hex_chars: int = 8, salt: str | None = None) -> Column:
    """Non-negative int64 from the first ``hex_chars`` of md5(salt || col)."""
    s = F.concat(F.lit(salt), col) if salt is not None else col
    return F.conv(F.substring(F.md5(s), 1, hex_chars), 16, 10).cast("long")


def md5_int_sql(expr: str, hex_chars: int = 8, salt: str | None = None) -> str:
    s = f"concat('{salt}', {expr})" if salt is not None else expr
    return f"(('0x' || substr(md5({s}), 1, {hex_chars}))::BIGINT)"


def md5_int_spark_sql(expr: str, hex_chars: int = 8, salt: str | None = None) -> str:
    """Spark-SQL-string form of md5_int, for F.expr()-built hot paths.

    Building wide expression trees Column-by-Column costs one py4j round
    trip per operator call (~2s of driver time for a 60-aggregate plan);
    a single generated SQL string parsed JVM-side is ~100x cheaper.
    """
    s = f"concat('{salt}', {expr})" if salt is not None else expr
    return f"CAST(conv(substring(md5({s}), 1, {hex_chars}), 16, 10) AS BIGINT)"


def fold_hash(int_array: Column) -> Column:
    """Order-sensitive polynomial fold: acc = (acc*31 + x) mod p.

    Left-associative by definition in both engines (F.aggregate /
    list_reduce), so results are bit-identical.
    """
    return F.aggregate(
        int_array, F.lit(0).cast("long"), lambda acc, x: (acc * 31 + x) % MOD
    )


def fold_hash_sql(int_list_expr: str) -> str:
    return (
        f"list_reduce(list_prepend(0::BIGINT, {int_list_expr}), "
        f"(a, b) -> (a * 31 + b) % {MOD})"
    )
