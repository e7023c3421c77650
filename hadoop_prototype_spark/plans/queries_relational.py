"""Relational canonical queries: aggregation, joins, top-K, rollup, windows.

Reference analogues (SURVEY.md §2.4/§2.5/§2.6):
- sum aggregates       MR lib/reduce/{Int,Long}SumReducer.java:30 + combiner
- reduce-side join     hadoop-tools/hadoop-datajoin/DataJoinReducerBase.java:47
- map-side hash join   DistributedCache broadcast (MR core/filecache/DistributedCache.java:134)
- semi/anti            native extras (reference expresses them only as
                       hand-written reducers; SURVEY §2.4 N/A table)
- top-K                sort-job + head idiom → orderBy().limit() (TakeOrderedAndProject)
- secondary sort       EX/SecondarySort.java:51 → Window.partitionBy().orderBy()
- uniq value count     MR lib/aggregate/UniqValueCount.java:35
- value histogram      MR lib/aggregate/ValueHistogram.java:38
- rollup               native extra (SURVEY §2.5: absent in reference)

Scale notes: dimension sides (nation/region/supplier) are broadcast so the
fact-table join is shuffle-free on the dim side; the orders⋈lineitem join
shuffles on orderkey once and AQE handles skew. Aggregates use exact
DECIMAL sums (map-side partial agg) cast to DOUBLE at the end — this is
both the determinism contract and the cheap path (no Python, all codegen).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import validate
from ..sources.tables import load_table
from .registry import register

Q1_CUTOFF = "1998-09-02"

_ORDERS_CHECKS: list[tuple] = [
    ("not_null", "o_orderkey"),
    ("unique", "o_orderkey"),
    ("non_negative", "o_totalprice"),
    ("accepted_values", "o_orderstatus", ("O", "F", "P")),
    ("value_range", "o_orderdate", "1992-01-01", "1998-12-31"),
]


_PROFILE_COLS = ["o_orderkey", "o_custkey", "o_totalprice"]


@register(
    "z_profile_orders",
    oracle=validate.profile_numeric_oracle_sql("orders", _PROFILE_COLS),
    tags=("validation",),
)
def z_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-scan numeric column profiler (the discovery half of the Deequ
    pairing): nulls / exact distincts / min / max / exact-fixed-point mean
    for four orders columns out of a single global aggregate."""
    return validate.profile_numeric(
        load_table(spark, sf_dir, "orders"), _PROFILE_COLS
    )


_DOC_STRING_COLS = ["lang", "source", "text"]


@register(
    "z_profile_documents",
    oracle=validate.profile_strings_oracle_sql("documents", _DOC_STRING_COLS),
    tags=("validation", "textstats"),
)
def z_profile_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-scan STRING column profiler (profile_numeric's sibling —
    together the discovery half of the Deequ pairing): nulls / empties /
    exact distincts / length min-max-mean / binary-order min-max values
    for three documents columns out of a single global aggregate. At
    100 TB the high-cardinality text column takes ``approx=True`` (HLL
    distinct, no column shuffle); the fixture query certifies exact."""
    return validate.profile_strings(
        load_table(spark, sf_dir, "documents"), _DOC_STRING_COLS
    )


@register(
    "z_validate_orders",
    oracle=validate.constraints_oracle_sql("orders", _ORDERS_CHECKS)
    + " UNION ALL "
    + validate.ref_orphans_oracle_sql("orders", "o_custkey", "customer", "c_custkey"),
    tags=("validation",),
)
def z_validate_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style publish gate over orders (operators/validate.py): five
    declarative constraints computed in ONE scan + one global aggregate
    (violation counts unpivoted map-side), plus an o_custkey→customer
    referential-integrity anti-join count. The report row set is the
    publish/quarantine decision a 100 TB ingest makes per batch."""
    return validate.validation_report(
        load_table(spark, sf_dir, "orders"),
        _ORDERS_CHECKS,
        refs=[("o_custkey", load_table(spark, sf_dir, "customer"), "c_custkey")],
    )


def _dec(c: str, typ: str = "decimal(12,2)") -> Column:
    return F.col(c).cast(typ)


def _disc_price() -> Column:
    return _dec("l_extendedprice") * (F.lit(1).cast("decimal(12,2)") - _dec("l_discount"))


@register(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))) * (1 + CAST(l_tax AS DECIMAL(12,2)))) AS DOUBLE) AS sum_charge,
           CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_price,
           CAST(sum(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '{Q1_CUTOFF}'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("aggregate",),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary: the canonical combiner+reducer aggregation."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= F.lit(Q1_CUTOFF).cast("timestamp"))
    charge = _disc_price() * (F.lit(1).cast("decimal(12,2)") + _dec("l_tax"))
    agg = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(_dec("l_quantity")).alias("_sq"),
        F.sum(_dec("l_extendedprice")).alias("_sp"),
        F.sum(_disc_price()).alias("_sdp"),
        F.sum(charge).alias("_sc"),
        F.sum(_dec("l_discount")).alias("_sd"),
        F.count("*").alias("count_order"),
    )
    n = F.col("count_order").cast("double")
    return agg.select(
        "l_returnflag",
        "l_linestatus",
        F.col("_sq").cast("double").alias("sum_qty"),
        F.col("_sp").cast("double").alias("sum_base_price"),
        F.col("_sdp").cast("double").alias("sum_disc_price"),
        F.col("_sc").cast("double").alias("sum_charge"),
        (F.col("_sq").cast("double") / n).alias("avg_qty"),
        (F.col("_sp").cast("double") / n).alias("avg_price"),
        (F.col("_sd").cast("double") / n).alias("avg_disc"),
        "count_order",
    )


@register(
    "join_inner_revenue",
    oracle="""
    SELECT r_name, n_name,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
           count(*) AS n_items
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
    tags=("join",),
)
def join_inner_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-ary inner equi-join (CompositeInputFormat inner / datajoin semantics).

    Scale shape: lineitem is partially aggregated to order grain BEFORE the
    join (exact decimal partial sums — the combiner run below the join), so
    the big shuffle moves ~1 row per order instead of ~4 rows per order;
    customer is mid-size (left to AQE); nation/region are broadcast — the
    DistributedCache map-side hash join pattern. Exact-decimal regrouping
    keeps the result hash-identical to the single-pass aggregation.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    region = F.broadcast(load_table(spark, sf_dir, "region"))
    li_by_order = li.groupBy("l_orderkey").agg(
        F.sum(_disc_price()).alias("_rev"), F.count("*").alias("_cnt")
    )
    return (
        li_by_order.join(orders, li_by_order.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.sum("_rev").cast("double").alias("revenue"),
            F.sum("_cnt").alias("n_items"),
        )
    )


@register(
    "join_outer_customer_orders",
    oracle="""
    SELECT c_custkey, c_name,
           count(o_orderkey) AS n_orders,
           CAST(coalesce(sum(CAST(o_totalprice AS DECIMAL(14,2))), 0) AS DOUBLE) AS total_spend
    FROM customer
    LEFT JOIN orders ON o_custkey = c_custkey
    GROUP BY c_custkey, c_name
    """,
    tags=("join",),
)
def join_outer_customer_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outer join (OuterJoinRecordReader semantics): every key from any side."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, orders.o_custkey == cust.c_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.sum(_dec("o_totalprice", "decimal(14,2)")), F.lit(0).cast("decimal(14,2)"))
            .cast("double")
            .alias("total_spend"),
        )
    )


@register(
    "z_join_semi",
    oracle="""
    SELECT c_custkey, c_mktsegment FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
    """,
    tags=("join",),
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (native extra; reference needs a hand-written reducer)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi").select(
        "c_custkey", "c_mktsegment"
    )


@register(
    "z_join_anti",
    oracle="""
    SELECT c_custkey, c_mktsegment FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
    """,
    tags=("join",),
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (native extra)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_mktsegment"
    )


@register(
    "topk_customers",
    oracle="""
    SELECT c_custkey,
           CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total_spend
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_custkey
    ORDER BY total_spend DESC, c_custkey
    LIMIT 10
    """,
    tags=("sort", "limit"),
)
def topk_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K pattern (reference idiom: sort job + head → TakeOrderedAndProject).

    Deterministic under ties: exact DECIMAL totals + unique-key tie-break.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey")
        .agg(F.sum(_dec("o_totalprice", "decimal(14,2)")).cast("double").alias("total_spend"))
        .orderBy(F.col("total_spend").desc(), F.col("c_custkey"))
        .limit(10)
    )


@register(
    "uniq_value_count",
    oracle="""
    SELECT o_orderpriority,
           count(DISTINCT o_custkey) AS uniq_customers,
           count(DISTINCT o_orderstatus) AS uniq_statuses
    FROM orders GROUP BY o_orderpriority
    """,
    tags=("aggregate",),
)
def uniq_value_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UniqValueCount (MR lib/aggregate/UniqValueCount.java:35), uncapped/exact."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("uniq_customers"),
        F.countDistinct("o_orderstatus").alias("uniq_statuses"),
    )


@register(
    "value_histogram",
    oracle="""
    WITH freq AS (
        SELECT o_orderpriority AS k, o_custkey AS v, count(*) AS c
        FROM orders GROUP BY 1, 2
    )
    SELECT k,
           count(*) AS n_distinct_values,
           min(c) AS min_freq,
           CAST(quantile_cont(c, 0.5) AS DOUBLE) AS median_freq,
           max(c) AS max_freq,
           CAST(sum(c) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_freq,
           sqrt((CAST(sum(c*c) AS DOUBLE)
                 - CAST(sum(c) AS DOUBLE) * CAST(sum(c) AS DOUBLE) / CAST(count(*) AS DOUBLE))
                / CAST(count(*) AS DOUBLE)) AS stddev_freq
    FROM freq GROUP BY k
    """,
    tags=("aggregate",),
)
def value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ValueHistogram (MR lib/aggregate/ValueHistogram.java:38,73-82).

    Per key: distinct values, then min/median/max/avg/stddev of the value
    frequencies — two chained aggregations, both map-side combinable;
    stddev from exact integer power sums (determinism contract).
    """
    orders = load_table(spark, sf_dir, "orders")
    freq = orders.groupBy(
        F.col("o_orderpriority").alias("k"), F.col("o_custkey").alias("v")
    ).agg(F.count("*").alias("c"))
    agg = freq.groupBy("k").agg(
        F.count("*").alias("n_distinct_values"),
        F.min("c").alias("min_freq"),
        F.expr("CAST(percentile(c, 0.5) AS DOUBLE)").alias("median_freq"),
        F.max("c").alias("max_freq"),
        F.sum("c").alias("_s1"),
        F.sum(F.col("c") * F.col("c")).alias("_s2"),
    )
    n = F.col("n_distinct_values").cast("double")
    return agg.select(
        "k",
        "n_distinct_values",
        "min_freq",
        "median_freq",
        "max_freq",
        (F.col("_s1").cast("double") / n).alias("avg_freq"),
        F.sqrt(
            (F.col("_s2").cast("double") - F.col("_s1").cast("double") * F.col("_s1").cast("double") / n) / n
        ).alias("stddev_freq"),
    )


@register(
    "secondary_sort",
    oracle="""
    SELECT user_id, event_id,
           row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
    FROM events
    """,
    tags=("sort",),
)
def secondary_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Secondary sort (EX/SecondarySort.java:51): partition by key, order values.

    FirstPartitioner + FirstGroupingComparator → Window.partitionBy(user)
    .orderBy(ts, id); the rank materializes the value order so it is
    hash-checkable.
    """
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select("user_id", "event_id", F.row_number().over(w).alias("rn"))


@register(
    "rollup_lineitem",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           count(*) AS n_rows,
           CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    tags=("aggregate", "extra"),
)
def rollup_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping-sets aggregate (native extra; absent in reference §2.5)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n_rows"),
        F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
    )


Q3_DATE = "1998-06-01"
Q3_SEGMENT = "BUILDING"


@register(
    "z_q3_shipping_priority",
    oracle=f"""
    SELECT l.l_orderkey,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(14,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(14,2)))) AS DOUBLE) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = '{Q3_SEGMENT}'
      AND o.o_orderdate < TIMESTAMP '{Q3_DATE}'
      AND l.l_shipdate > TIMESTAMP '{Q3_DATE}'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o.o_orderdate, l.l_orderkey
    LIMIT 10
    """,
    tags=("relational",),
)
def z_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape (shipping priority): selective dim filter joined down
    a 3-table chain, decimal-exact revenue, TakeOrdered top-10. Filters
    reach all three scans; the customer side broadcast-joins at small SF
    and shuffles at scale (stats decide)."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == Q3_SEGMENT
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit(Q3_DATE).cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit(Q3_DATE).cast("timestamp")
    )
    revenue = F.sum(
        F.col("l_extendedprice").cast("decimal(14,2)")
        * (F.lit(1) - F.col("l_discount").cast("decimal(14,2)"))
    ).cast("double")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(revenue.alias("revenue"))
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@register(
    "z_q6_forecast_revenue",
    oracle="""
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2))
                    * CAST(l_discount AS DECIMAL(14,2))) AS DOUBLE) AS revenue,
           count(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= DATE '1994-01-01' AND l_shipdate < DATE '1995-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    tags=("relational", "tpch"),
)
def z_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure filter + global aggregate — the query where
    predicate pushdown does ALL the work (every predicate reaches the
    parquet scan; no shuffle except the 1-row final agg)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1994-01-01")
            & (F.col("l_shipdate") < "1995-01-01")
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(14,2)")
                * F.col("l_discount").cast("decimal(14,2)")
            )
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "z_q10_returned_items",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(14,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(14,2)))) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("relational", "tpch"),
)
def z_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue per customer, top 20 —
    multi-join (nation broadcasts, fact sides shuffle on their keys) into
    TakeOrderedAndProject; the returnflag filter pushes to the lineitem
    scan."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    rev = (
        F.col("l_extendedprice").cast("decimal(14,2)")
        * (F.lit(1) - F.col("l_discount").cast("decimal(14,2)"))
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "z_q18_large_orders",
    oracle="""
    WITH big AS (
        SELECT l_orderkey,
               CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
        FROM lineitem GROUP BY l_orderkey
        HAVING sum(CAST(l_quantity AS DECIMAL(12,2))) > 150
    )
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate, b.total_qty
    FROM big b
    JOIN orders o ON b.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    """,
    tags=("relational", "tpch"),
)
def z_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-quantity orders): the HAVING pre-aggregation
    runs BEFORE the joins, so only qualifying orderkeys (a tiny set)
    reach the customer join — aggregate-then-join, the reference's
    combiner-then-reduce discipline applied across jobs."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(12,2)")).alias("_q"))
        .filter(F.col("_q") > 150)
        .select("l_orderkey", F.col("_q").cast("double").alias("total_qty"))
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select("c_custkey", "c_name", "o_orderkey", "o_orderdate", "total_qty")
    )
