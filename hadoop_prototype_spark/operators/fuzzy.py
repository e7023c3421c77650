"""Fuzzy (edit-distance-1) self-join via deletion-neighborhood indexing —
record-linkage / vocabulary-noise detection at corpus scale.

The naive formulation — ``a JOIN b ON levenshtein(a.s, b.s) = 1`` — is a
cross product with a per-pair O(len²) distance; unrunnable beyond toy
sizes. The SymSpell construction makes it an EQUI-join: every string
indexes under itself plus each of its single-deletion variants, and any
two strings within edit distance 1 (substitution, insertion, or deletion)
are guaranteed to share an index key:

- substitution a↔b at position i: both produce the same string by
  deleting position i;
- insertion/deletion: the shorter string IS a deletion variant of the
  longer;
- the shared-key join yields candidates only; an exact levenshtein()==1
  check (cheap, candidate-count times) removes same-key false positives
  (e.g. two strings whose different deletions collide).

Scale shape: the index is |s|+1 rows per string (strings are short keys,
not documents), the join runs on a 48-bit md5 of the variant (never the
variant text), and the verify filter is codegen levenshtein on the
bounded candidate set. No cross product at any size — the same
inverted-index discipline as the n-gram/minhash dedup family.

No reference analogue; nearest idiom is the datajoin package's tagged
reduce-side join (SURVEY §2.4), which would still need the candidate-key
trick to avoid the cross product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_int_spark_sql, md5_int_sql

VARIANT_HEX = 12


def _variants(df: DataFrame, col: str) -> DataFrame:
    """(s, vh): the string itself plus each single-deletion variant,
    hashed. Distinct per (s, variant) — duplicate variants from repeated
    characters would double-count candidates."""
    v = df.select(F.col(col).alias("s")).distinct()
    exploded = v.selectExpr(
        "s",
        "explode(array_union(array(s), "
        "  transform(sequence(1, length(s)), "
        "    i -> concat(substring(s, 1, i - 1), substring(s, i + 1, length(s))))"
        ")) AS variant",
    )
    return exploded.selectExpr("s", f"{md5_int_spark_sql('variant', VARIANT_HEX)} AS vh")


def edit1_pairs(df: DataFrame, col: str) -> DataFrame:
    """Distinct string pairs (a < b) at levenshtein distance exactly 1."""
    idx = _variants(df, col)
    a = idx.select(F.col("s").alias("a"), "vh")
    b = idx.select(F.col("s").alias("b"), "vh")
    return (
        a.join(b, "vh")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
        .filter(F.levenshtein("a", "b") == 1)
    )


def edit1_pairs_oracle_sql(table: str = "customer", col: str = "c_name") -> str:
    vh = md5_int_sql("variant", VARIANT_HEX)
    return f"""
    WITH strs AS (SELECT DISTINCT {col} AS s FROM {table}),
    variants AS (
        SELECT s, unnest(list_distinct(
            list_prepend(s, list_transform(range(1, length(s) + 1),
                i -> substr(s, 1, i - 1) || substr(s, i + 1)))
        )) AS variant
        FROM strs
    ),
    idx AS (SELECT s, {vh} AS vh FROM variants),
    cand AS (
        SELECT DISTINCT x.s AS a, y.s AS b
        FROM idx x JOIN idx y ON x.vh = y.vh AND x.s < y.s
    )
    SELECT a, b FROM cand WHERE levenshtein(a, b) = 1
    """
