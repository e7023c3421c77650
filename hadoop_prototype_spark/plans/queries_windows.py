"""Window-analytics queries (native extras over the reference's model).

SURVEY.md §2.5 records that the reference has NO windowed/ranking
aggregates — the nearest it gets is the secondary-sort sorted-values
iterator (MR core/Reducer.java:58-82, EX/SecondarySort.java:51), over which
users hand-write running state. Each query here is one of those hand-written
reducer idioms re-expressed as a declarative window plan:

- moving average    running mean over the sorted value iterator
- lag delta         comparing consecutive records in a sorted group
- running total     accumulator carried across the sorted group
- ntile summary     "split the sorted output into N files" idiom
- grouping sets     multi-job union of per-dimension aggregations
                    (JobControl DAG of GROUP BYs) in ONE plan

Scale shape: every window partitions by a bounded key (customer, user) —
state per partition is small and Spark's window exec spills if not; the
shuffle is a single hash exchange on the partition key, identical to the
reduce-side shuffle the reference would run for the same computation.
Determinism contract: exact DECIMAL sums cast to DOUBLE at the end;
integer microsecond deltas; unique tie-breaks in every ORDER BY.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import register


@register(
    "z_window_moving_avg",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(sum(CAST(o_totalprice AS DECIMAL(14,2)))
                    OVER (PARTITION BY o_custkey
                          ORDER BY o_orderdate, o_orderkey
                          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
           / CAST(count(*) OVER (PARTITION BY o_custkey
                                 ORDER BY o_orderdate, o_orderkey
                                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS moving_avg_price
    FROM orders
    """,
    tags=("window", "extra"),
)
def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-order moving average of order value per customer (the running-mean
    hand-reducer over the secondary-sort iterator, as a frame window).
    Exact decimal frame sum / frame count, divided as doubles."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey").rowsBetween(-2, 0)
    return orders.select(
        "o_orderkey",
        "o_custkey",
        (
            F.sum(F.col("o_totalprice").cast("decimal(14,2)")).over(w).cast("double")
            / F.count("*").over(w).cast("double")
        ).alias("moving_avg_price"),
    )


@register(
    "z_window_lag_delta",
    oracle="""
    SELECT user_id, event_id,
           epoch_us(ts) - lag(epoch_us(ts))
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS delta_us
    FROM events
    """,
    tags=("window", "extra"),
)
def window_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Microseconds since the user's previous event (lag over the sorted
    group — the consecutive-record comparison idiom; first event NULL)."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    return events.select(
        "user_id", "event_id", (us - F.lag(us).over(w)).alias("delta_us")
    )


@register(
    "z_window_running_total",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(sum(CAST(o_totalprice AS DECIMAL(14,2)))
                    OVER (PARTITION BY o_custkey
                          ORDER BY o_orderdate, o_orderkey
                          ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS spend_to_date
    FROM orders
    """,
    tags=("window", "extra"),
)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative spend per customer (the carried-accumulator reducer).
    Exact decimal prefix sums → double only at the end, so every prefix is
    hash-identical across engines."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(14,2)")).over(w).cast("double").alias("spend_to_date"),
    )


@register(
    "quartile_spend",
    oracle="""
    WITH spend AS (
        SELECT c_custkey,
               CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total_spend
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_custkey
    ), ranked AS (
        SELECT c_custkey, total_spend,
               row_number() OVER (ORDER BY total_spend DESC, c_custkey) AS rnk,
               count(*) OVER () AS total
        FROM spend
    ), tiled AS (
        SELECT c_custkey, total_spend,
               CAST((rnk * 4 - 1) // total + 1 AS INT) AS quartile
        FROM ranked
    )
    SELECT quartile,
           count(*) AS n_customers,
           min(total_spend) AS min_spend,
           max(total_spend) AS max_spend
    FROM tiled GROUP BY quartile
    """,
    tags=("window", "extra"),
)
def quartile_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer spend quartiles (the "split sorted output into N files"
    idiom — TotalOrderPartitioner with N=4).

    Semantics note: quartile = ceil(rank*4 / n) gives EQUAL-WIDTH rank
    bands, which is exactly the TotalOrderPartitioner/N-files split. It is
    deliberately NOT SQL ntile(): when n % 4 != 0, ntile() hands the extra
    rows to the FIRST tiles while equal-width bands hand them to the last
    (and a 1-row input lands in band 4, not 1). Impl and oracle share the
    same arithmetic.

    Scale shape: a bare ``ntile(4) OVER (ORDER BY ...)`` executes as ONE
    partition holding every customer — a scale-killer at 100 TB. Instead the
    quartile derives from ``global_rank`` (operators/sort.py — sampled range
    boundaries as plan literals, partition-local row_number + offsets, the
    TotalOrderPartitioner construction): quartile = ceil(rank*4 / n) via
    integer arithmetic. Equal-width rank bands, range-partitioned all the way.
    """
    from ..operators.sort import global_rank

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    spend = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(14,2)")).cast("double").alias("total_spend"))
        # four consumers read this narrow (custkey, spend) aggregate —
        # global_rank's boundary sampling, the bucketed rank, the bucket
        # offsets, and the quartile denominator count; materialize it once
        # (lazy localCheckpoint) instead of re-running the join+agg per leg
        .localCheckpoint(eager=False)
    )
    ranked = global_rank(spend, ("total_spend", True), "c_custkey", rank_col="rnk")
    total = spend.agg(F.count("*").alias("_total"))
    tiled = ranked.crossJoin(F.broadcast(total)).withColumn(
        "quartile", F.expr("CAST((rnk * 4 - 1) DIV _total + 1 AS INT)")
    )
    return tiled.groupBy("quartile").agg(
        F.count("*").alias("n_customers"),
        F.min("total_spend").alias("min_spend"),
        F.max("total_spend").alias("max_spend"),
    )


@register(
    "z_grouping_sets_orders",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    tags=("aggregate", "extra"),
)
def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (per-status, per-priority, grand total) in one
    plan — what the reference runs as a JobControl DAG of three separate
    GROUP BY jobs over three scans (SURVEY §2.9); one scan here."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupingSets(
        [["o_orderstatus"], ["o_orderpriority"], []],
        "o_orderstatus",
        "o_orderpriority",
    ).agg(
        F.count("*").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(14,2)")).cast("double").alias("total_price"),
    )
