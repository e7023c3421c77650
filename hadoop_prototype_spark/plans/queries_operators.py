"""Queries exercising the spec-compiler operators and the join framework.

Each query here drives one of the reference's declarative surfaces
(SURVEY.md §3.3): the FieldSelection spec, the ValueAggregator descriptor
list, the KeyFieldBasedComparator sort spec, and the CompositeInputFormat
join-expression language. The oracle SQL is GENERATED from the same parsed
spec, so the spec parser itself is under differential test.

Determinism note: every line/string built here uses only integer and string
columns — double→string formatting differs between engines and must never
enter a value that is compared (registry.py contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.aggregate import value_aggregator, value_aggregator_oracle_sql
from ..operators.fieldsel import field_selection, fieldsel_oracle_sql
from ..operators.joins import compose, override_join
from ..operators.sort import keyfield_oracle_order_by, keyfield_sort_columns
from ..sources.tables import load_table
from .registry import register

# --- FieldSelection -------------------------------------------------------

_FIELDSEL_SPEC = "2,1:4,0,3-5"
_FIELDSEL_COLS = ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_returnflag", "l_linestatus"]


@register(
    "fieldsel",
    oracle=fieldsel_oracle_sql(
        _FIELDSEL_SPEC,
        "concat_ws(e'\\t', " + ", ".join(_FIELDSEL_COLS) + ")",
        "FROM lineitem",
    ),
    tags=("projection",),
)
def fieldsel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FieldSelection spec '2,1:4,0,3-5' over tab-joined lineitem fields
    (MR lib/fieldsel/FieldSelectionMapper.java:34-61)."""
    li = load_table(spark, sf_dir, "lineitem")
    lines = li.select(F.concat_ws("\t", *_FIELDSEL_COLS).alias("line"))
    return field_selection(lines, _FIELDSEL_SPEC)


# --- ValueAggregator descriptors ------------------------------------------

_DESCRIPTORS = [
    "LongValueSum:l_linenumber",
    "DoubleValueSum:l_quantity",
    "LongValueMax:l_partkey",
    "LongValueMin:l_partkey",
    "StringValueMax:l_linestatus",
    "StringValueMin:l_linestatus",
    "UniqValueCount:l_suppkey",
    "ValueCount:l_orderkey",
]


@register(
    "aggregate_framework",
    oracle=value_aggregator_oracle_sql("lineitem", ["l_returnflag"], _DESCRIPTORS),
    tags=("aggregate",),
)
def aggregate_framework(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ValueAggregatorJob descriptor list → one groupBy().agg() plan
    (MR lib/aggregate/ValueAggregatorJob.java:85)."""
    li = load_table(spark, sf_dir, "lineitem")
    return value_aggregator(li, ["l_returnflag"], _DESCRIPTORS)


# --- KeyFieldBasedComparator ----------------------------------------------

_SORT_SPEC = "-k1,1r -k2,2n -k3,3n"
_SORT_COLS = ["o_orderpriority", "o_custkey", "o_orderkey"]


@register(
    "keyfield_sort",
    oracle=f"""
    WITH lines AS (
        SELECT concat_ws(e'\\t', {', '.join(_SORT_COLS)}) AS line FROM orders
    )
    SELECT line, row_number() OVER (ORDER BY {keyfield_oracle_order_by(_SORT_SPEC, 'line')}) AS rank
    FROM lines
    """,
    tags=("sort",),
)
def keyfield_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GNU-sort '-k' spec compiled to sort expressions
    (MR lib/partition/KeyFieldBasedComparator.java:37-53); rank materializes
    the total order so it is hash-checkable — via the two-phase global_rank
    (range partition + offsets), never a single-partition window.
    """
    from ..operators.sort import global_rank, keyfield_sort_keys

    orders = load_table(spark, sf_dir, "orders")
    lines = orders.select(F.concat_ws("\t", *_SORT_COLS).alias("line"))
    ranked = global_rank(lines, *keyfield_sort_keys(_SORT_SPEC), rank_col="rank")
    return ranked.select("line", "rank")


# --- override join ---------------------------------------------------------


@register(
    "join_override",
    oracle="""
    WITH base AS (SELECT p_partkey AS key, p_retailprice AS val FROM part),
         upd  AS (SELECT l_partkey AS key, max(l_extendedprice) AS val
                  FROM lineitem GROUP BY 1)
    SELECT coalesce(b.key, u.key) AS key,
           CASE WHEN u.key IS NOT NULL THEN u.val ELSE b.val END AS val
    FROM base b FULL OUTER JOIN upd u ON b.key = u.key
    """,
    tags=("join",),
)
def join_override(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Override join (OverrideRecordReader :34-39): rightmost source wins.

    Implemented as union + priority row_number (one shuffle) rather than a
    full-outer chain — the 100 TB-safe plan (SURVEY §7 risk #2).
    """
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    base = part.select(F.col("p_partkey").alias("key"), F.col("p_retailprice").alias("val"))
    upd = li.groupBy(F.col("l_partkey").alias("key")).agg(F.max("l_extendedprice").alias("val"))
    return override_join([base, upd], "key")


# --- compose() join expression --------------------------------------------

_COMPOSE_EXPR = "inner(tbl(cust_n),outer(tbl(supp_n),tbl(ord_n)))"


@register(
    "join_compose",
    oracle="""
    WITH cust_n AS (SELECT c_nationkey AS key, count(*) AS n_cust FROM customer GROUP BY 1),
         supp_n AS (SELECT s_nationkey AS key, count(*) AS n_supp FROM supplier GROUP BY 1),
         ord_n  AS (SELECT c_nationkey AS key, count(*) AS n_ord
                    FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1),
         nested AS (SELECT coalesce(s.key, o.key) AS key, s.n_supp AS n_supp_0, o.n_ord AS n_ord_1
                    FROM supp_n s FULL OUTER JOIN ord_n o ON s.key = o.key)
    SELECT c.key AS key, c.n_cust AS n_cust_0, n.n_supp_0 AS n_supp_0_1, n.n_ord_1 AS n_ord_1_1
    FROM cust_n c JOIN nested n ON c.key = n.key
    """,
    tags=("join",),
)
def join_compose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CompositeInputFormat join expression evaluated by the compose() parser
    (MR lib/join/CompositeInputFormat.java:70-75, Parser.java:75)."""
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    tables = {
        "cust_n": cust.groupBy(F.col("c_nationkey").alias("key")).agg(F.count("*").alias("n_cust")),
        "supp_n": supp.groupBy(F.col("s_nationkey").alias("key")).agg(F.count("*").alias("n_supp")),
        "ord_n": orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(F.col("c_nationkey").alias("key"))
        .agg(F.count("*").alias("n_ord")),
    }
    return compose(_COMPOSE_EXPR, tables, key="key")
