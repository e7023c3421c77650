"""Set operations and total-order sort queries.

Reference analogues (SURVEY.md §2.6/§2.7):
- union            implicit multi-path input (MR lib/input/FileInputFormat
                   setInputPaths) / MultipleInputs.java:40 heterogeneous
                   union with per-source mappers (DelegatingMapper.java:37)
- intersect/except hand idioms in the reference (tag + reduce, datajoin
                   with filters) — native DataFrame ops here
- total-order sort EX/Sort.java:57 + TotalOrderPartitioner.java:50; the
                   contiguous output rank reproduces the "concatenation of
                   part files is sorted" contract as checkable values
                   (SortValidator.java:54 proves order; a global rank IS
                   that proof, row by row)

Scale notes: union/intersect/except shuffle once on the compared columns
(map-side partial distinct first); global_rank is the two-phase
range-partition + offset ranking — no single-partition window anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.sort import global_rank
from ..sources.tables import load_table
from .registry import register


@register(
    "set_union",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    tags=("setops",),
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct union: nations having customers or suppliers."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


@register(
    "set_intersect",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    """,
    tags=("setops",),
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intersect: customers with both fulfilled and open orders."""
    orders = load_table(spark, sf_dir, "orders")
    f = orders.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    o = orders.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    return f.intersect(o)


@register(
    "set_except",
    oracle="""
    SELECT p_partkey AS partkey FROM part
    EXCEPT
    SELECT l_partkey AS partkey FROM lineitem
    """,
    tags=("setops",),
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Except: parts that were never ordered."""
    p = load_table(spark, sf_dir, "part").select(F.col("p_partkey").alias("partkey"))
    l = load_table(spark, sf_dir, "lineitem").select(F.col("l_partkey").alias("partkey"))
    return p.subtract(l)  # EXCEPT (distinct) semantics


@register(
    "multi_input_union",
    oracle="""
    SELECT 'customer' AS src, c_custkey AS id, c_name AS name FROM customer
    UNION ALL
    SELECT 'supplier' AS src, s_suppkey AS id, s_name AS name FROM supplier
    """,
    tags=("setops", "sources"),
)
def multi_input_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MultipleInputs/DelegatingMapper: per-source transform, then a
    heterogeneous union by name."""
    c = load_table(spark, sf_dir, "customer").select(
        F.lit("customer").alias("src"),
        F.col("c_custkey").alias("id"),
        F.col("c_name").alias("name"),
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("src"),
        F.col("s_suppkey").alias("id"),
        F.col("s_name").alias("name"),
    )
    return c.unionByName(s)


@register(
    "sort_total_order",
    oracle="""
    SELECT row_number() OVER (ORDER BY o_orderdate, o_orderkey) AS sort_rank,
           o_orderkey, o_orderdate, o_totalprice
    FROM orders
    """,
    tags=("sort",),
)
def sort_total_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total-order sort (Sort example / TeraSort) with a contiguous global
    rank proving the order — computed with the two-phase range-partition +
    offset scheme, never a single-partition window."""
    orders = load_table(spark, sf_dir, "orders")
    ranked = global_rank(orders, "o_orderdate", "o_orderkey", rank_col="sort_rank")
    return ranked.select("sort_rank", "o_orderkey", "o_orderdate", "o_totalprice")
