"""TPC-H-style relational benchmark queries (z_ tail: free extras beyond
the reference's own examples — the reference's MR join/aggregate machinery
(datajoin, CompositeInputFormat, lib/aggregate) exists to run exactly this
class of query, so these pin the engine's relational breadth end-to-end).

Adapted to the driver's fixture schema where it diverges from standard
TPC-H (no o_shippriority → o_orderpriority; no partsupp/l_shipmode/
l_commitdate/l_receiptdate columns → Q2/Q4/Q9/Q11/Q12/Q20/Q21-style
queries are out of scope; every other spec query has an adapted form
here or in queries_relational.py (Q1)).

Determinism contract (plans/registry.py): money sums aggregate in exact
DECIMAL and cast to DOUBLE at the end; ratios divide the exact sums as
DOUBLE; rankings carry a total tie-break on a unique key.

Scale shapes follow join_inner_revenue's pattern: lineitem pre-aggregates
to the join grain BEFORE the big shuffle wherever the query allows, dims
(nation/region/part/supplier) broadcast, the orders⋈lineitem shuffle is
the single large exchange and AQE handles skew.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import register


def _dec(c: str) -> Column:
    return F.col(c).cast("decimal(12,2)")


def _disc_price() -> Column:
    return _dec("l_extendedprice") * (F.lit(1).cast("decimal(12,2)") - _dec("l_discount"))


_DISC_SQL = "CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))"

Q3_SEGMENT = "BUILDING"
Q3_DATE = "1998-06-01"


@register(
    "z_tpch_q3",
    oracle=f"""
    SELECT l_orderkey,
           CAST(sum({_DISC_SQL}) AS DOUBLE) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = '{Q3_SEGMENT}'
      AND o_orderdate < TIMESTAMP '{Q3_DATE}'
      AND l_shipdate  > TIMESTAMP '{Q3_DATE}'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC
    LIMIT 10
    """,
    tags=("tpch", "join", "topk"),
)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shipping-priority (o_orderpriority standing in for the
    fixture's missing o_shippriority): segment-filtered customers' unshipped
    orders ranked by revenue.

    Shape: lineitem's date filter pushes to the scan; the revenue partial-
    aggregates per order under the join; customer (segment-filtered, ~1/5)
    joins orders on custkey before the single orderkey shuffle. Top-10 is
    TakeOrderedAndProject — no global sort."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == Q3_SEGMENT)
        .select("c_custkey")
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit(Q3_DATE).cast("timestamp")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") > F.lit(Q3_DATE).cast("timestamp"))
        .groupBy("l_orderkey")
        .agg(F.sum(_disc_price()).alias("_rev"))
    )
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .select(
            "l_orderkey",
            F.col("_rev").cast("double").alias("revenue"),
            "o_orderdate",
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderdate").asc(), F.col("l_orderkey").asc())
        .limit(10)
    )


Q5_REGION = "ASIA"
Q5_START, Q5_END = "1996-01-01", "1997-01-01"


@register(
    "z_tpch_q5",
    oracle=f"""
    SELECT n_name,
           CAST(sum({_DISC_SQL}) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = '{Q5_REGION}'
      AND o_orderdate >= TIMESTAMP '{Q5_START}'
      AND o_orderdate <  TIMESTAMP '{Q5_END}'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name ASC
    """,
    tags=("tpch", "join"),
)
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 local-supplier volume: revenue where the customer and the
    line's supplier share a nation inside one region.

    Shape: supplier/nation/region broadcast (region-filtered nation list
    prunes suppliers AND customers before the fact joins); the
    c_nationkey = s_nationkey equality rides the lineitem join as a
    residual condition — no extra shuffle. One orderkey exchange, one
    custkey exchange, n_name aggregate is 25-row bounded."""
    nation_in_region = F.broadcast(
        load_table(spark, sf_dir, "nation")
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "region").filter(F.col("r_name") == Q5_REGION)
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    supp = F.broadcast(
        load_table(spark, sf_dir, "supplier")
        .join(nation_in_region, F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    cust = load_table(spark, sf_dir, "customer").join(
        F.broadcast(nation_in_region.select(F.col("n_nationkey").alias("_cn"))),
        F.col("c_nationkey") == F.col("_cn"),
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(Q5_START).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(Q5_END).cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .groupBy("n_name")
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name").asc())
    )


Q6_START, Q6_END = "1996-01-01", "1997-01-01"


@register(
    "z_tpch_q6",
    oracle=f"""
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
           count(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '{Q6_START}'
      AND l_shipdate <  TIMESTAMP '{Q6_END}'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
    """,
    tags=("tpch", "aggregate"),
)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 forecasting-revenue-change: a pure scan-filter-aggregate —
    every predicate pushes to the parquet scan (min/max row-group pruning
    at scale), zero joins, one scalar row out."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(Q6_START).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q6_END).cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.sum(_dec("l_extendedprice") * _dec("l_discount")).cast("double").alias("revenue"),
        F.count("*").alias("n_items"),
    )


Q10_START, Q10_END = "1996-10-01", "1997-01-01"


@register(
    "z_tpch_q10",
    oracle=f"""
    SELECT c_custkey, c_name,
           CAST(sum({_DISC_SQL}) AS DOUBLE) AS revenue,
           c_acctbal, n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '{Q10_START}'
      AND o_orderdate <  TIMESTAMP '{Q10_END}'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 20
    """,
    tags=("tpch", "join", "topk"),
)
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 returned-item reporting: top-20 customers by revenue lost
    to returns in a quarter.

    Shape: returnflag + date filters push down; lineitem pre-aggregates
    per order below the join; nation broadcasts; top-20 is
    TakeOrderedAndProject with the custkey tie-break."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .groupBy("l_orderkey")
        .agg(F.sum(_disc_price()).alias("_rev"))
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(Q10_START).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(Q10_END).cast("timestamp"))
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_custkey")
        .agg(F.sum("_rev").alias("_crev"))
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .select(
            "c_custkey",
            "c_name",
            F.col("_crev").cast("double").alias("revenue"),
            "c_acctbal",
            "n_name",
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


Q14_START, Q14_END = "1996-03-01", "1996-04-01"


@register(
    "z_tpch_q14",
    oracle=f"""
    SELECT 100.0 * CAST(sum(CASE WHEN p_type = 'PROMO' THEN {_DISC_SQL}
                                 ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
                 / CAST(sum({_DISC_SQL}) AS DOUBLE) AS promo_revenue_pct,
           CAST(sum({_DISC_SQL}) AS DOUBLE) AS total_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '{Q14_START}'
      AND l_shipdate <  TIMESTAMP '{Q14_END}'
    """,
    tags=("tpch", "join", "aggregate"),
)
def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 promotion effect: share of a month's revenue from PROMO
    parts (the fixture's p_type is a single word, so equality replaces the
    spec's LIKE 'PROMO%').

    Shape: part broadcasts (it is the only dim); the month filter pushes
    to the lineitem scan; both sums fold into ONE aggregate pass; exact
    decimal sums divide as DOUBLE at the very end."""
    part = F.broadcast(load_table(spark, sf_dir, "part").select("p_partkey", "p_type"))
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(Q14_START).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q14_END).cast("timestamp"))
    )
    promo = F.when(F.col("p_type") == "PROMO", _disc_price()).otherwise(
        F.lit(0).cast("decimal(12,2)")
    )
    agg = li.join(part, li.l_partkey == part.p_partkey).agg(
        F.sum(promo).alias("_pr"), F.sum(_disc_price()).alias("_tr")
    )
    return agg.select(
        (F.lit(100.0) * F.col("_pr").cast("double") / F.col("_tr").cast("double")).alias(
            "promo_revenue_pct"
        ),
        F.col("_tr").cast("double").alias("total_revenue"),
    )


Q7_NATION_A, Q7_NATION_B = "NATION_1", "NATION_2"
Q7_START, Q7_END = "1996-01-01", "1998-01-01"


@register(
    "z_tpch_q7",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           CAST(sum(volume) AS DOUBLE) AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               year(l_shipdate) AS l_year,
               {_DISC_SQL} AS volume
        FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = '{Q7_NATION_A}' AND n2.n_name = '{Q7_NATION_B}')
            OR (n1.n_name = '{Q7_NATION_B}' AND n2.n_name = '{Q7_NATION_A}'))
          AND l_shipdate >= TIMESTAMP '{Q7_START}'
          AND l_shipdate <  TIMESTAMP '{Q7_END}'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    tags=("tpch", "join"),
)
def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 volume shipping between two nations, by direction and
    ship year.

    Shape: supplier and both nation legs broadcast (nation-filtered
    supplier list is tiny); customer keeps only the two nations before its
    join; the orderkey exchange is the one large shuffle; the final
    aggregate is (2 x 2 x years)-bounded."""
    nation = load_table(spark, sf_dir, "nation")
    pair = [Q7_NATION_A, Q7_NATION_B]
    n1 = F.broadcast(
        nation.filter(F.col("n_name").isin(pair)).select(
            F.col("n_nationkey").alias("_sk"), F.col("n_name").alias("supp_nation")
        )
    )
    n2 = F.broadcast(
        nation.filter(F.col("n_name").isin(pair)).select(
            F.col("n_nationkey").alias("_ck"), F.col("n_name").alias("cust_nation")
        )
    )
    supp = F.broadcast(
        load_table(spark, sf_dir, "supplier").join(
            n1, F.col("s_nationkey") == F.col("_sk")
        ).select("s_suppkey", "supp_nation")
    )
    cust = load_table(spark, sf_dir, "customer").join(
        n2, F.col("c_nationkey") == F.col("_ck")
    ).select("c_custkey", "cust_nation")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(Q7_START).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q7_END).cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders")
    return (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .filter(
            ((F.col("supp_nation") == Q7_NATION_A) & (F.col("cust_nation") == Q7_NATION_B))
            | ((F.col("supp_nation") == Q7_NATION_B) & (F.col("cust_nation") == Q7_NATION_A))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "z_tpch_q13",
    oracle="""
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
        SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    tags=("tpch", "join", "aggregate"),
)
def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 customer order-count distribution (no comment-pattern
    filter: the fixture has no o_comment column).

    Shape: one custkey shuffle for the per-customer count (left join keeps
    zero-order customers), then a count-of-counts aggregate whose key
    cardinality is the max order count — trivially bounded. All-integer
    arithmetic, no determinism hazards."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


Q17_BRAND = "Brand#1"


@register(
    "z_tpch_q17",
    oracle=f"""
    WITH avg_qty AS (
        SELECT l_partkey AS a_partkey,
               0.2 * (CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
                      / CAST(count(*) AS DOUBLE)) AS threshold
        FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS avg_yearly,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN avg_qty ON a_partkey = l_partkey
    WHERE p_brand = '{Q17_BRAND}'
      AND l_quantity < threshold
    """,
    tags=("tpch", "join", "aggregate"),
)
def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 small-quantity-order revenue: lines whose quantity is
    under 20% of their part's average, for one brand.

    Shape: the correlated subquery becomes a per-part aggregate (partkey-
    bounded) joined back — both it and the brand-filtered part list
    broadcast; the lineitem side never shuffles. The 0.2*avg threshold is
    exact-decimal sum / count divided as DOUBLE (engine-identical), so the
    boundary comparison is bit-deterministic."""
    li = load_table(spark, sf_dir, "lineitem")
    part = F.broadcast(
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == Q17_BRAND)
        .select("p_partkey")
    )
    avg_qty = F.broadcast(
        li.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
            (
                F.lit(0.2)
                * (
                    F.sum(_dec("l_quantity")).cast("double")
                    / F.count(F.lit(1)).cast("double")
                )
            ).alias("threshold")
        )
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(avg_qty, li.l_partkey == F.col("a_partkey"))
        .filter(F.col("l_quantity") < F.col("threshold"))
        .agg(
            (F.sum(_dec("l_extendedprice")).cast("double") / F.lit(7.0)).alias(
                "avg_yearly"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


Q8_NATION = "NATION_3"
Q8_REGION = "AMERICA"
Q8_TYPE = "PROMO"
Q8_START, Q8_END = "1996-01-01", "1998-01-01"


@register(
    "z_tpch_q8",
    oracle=f"""
    SELECT o_year,
           CAST(sum(CASE WHEN nation = '{Q8_NATION}' THEN volume
                         ELSE CAST(0 AS DECIMAL(24,4)) END) AS DOUBLE)
             / CAST(sum(volume) AS DOUBLE) AS mkt_share,
           CAST(sum(volume) AS DOUBLE) AS total_volume
    FROM (
        SELECT year(o_orderdate) AS o_year,
               {_DISC_SQL} AS volume,
               n2.n_name AS nation
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region   ON n1.n_regionkey = r_regionkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = '{Q8_REGION}'
          AND o_orderdate >= TIMESTAMP '{Q8_START}'
          AND o_orderdate <  TIMESTAMP '{Q8_END}'
          AND p_type = '{Q8_TYPE}'
    ) all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
    tags=("tpch", "join", "aggregate"),
)
def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 national market share: one supplier nation's slice of the
    PROMO-part volume sold into one region's market, by order year.

    Shape: part (type-filtered), supplier+nation, and the region-filtered
    customer-nation list all broadcast; lineitem⋈orders is the one big
    exchange; the CASE-sum ratio folds into a single years-bounded
    aggregate with exact DECIMAL sums divided as DOUBLE at the end.

    Determinism note: the zero branch of the CASE is typed
    DECIMAL(24,4) = the product's type, so both engines sum one decimal
    type; a bare 0 would widen differently in DuckDB vs Spark.
    """
    part = F.broadcast(
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == Q8_TYPE)
        .select("p_partkey")
    )
    supp_nation = F.broadcast(
        load_table(spark, sf_dir, "supplier")
        .join(
            load_table(spark, sf_dir, "nation").select(
                F.col("n_nationkey").alias("_snk"), F.col("n_name").alias("nation")
            ),
            F.col("s_nationkey") == F.col("_snk"),
        )
        .select("s_suppkey", "nation")
    )
    cust_in_region = load_table(spark, sf_dir, "customer").join(
        F.broadcast(
            load_table(spark, sf_dir, "nation")
            .join(
                F.broadcast(
                    load_table(spark, sf_dir, "region").filter(
                        F.col("r_name") == Q8_REGION
                    )
                ),
                F.col("n_regionkey") == F.col("r_regionkey"),
            )
            .select(F.col("n_nationkey").alias("_cnk"))
        ),
        F.col("c_nationkey") == F.col("_cnk"),
    ).select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(Q8_START).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(Q8_END).cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    vol = _disc_price()
    nation_vol = F.when(F.col("nation") == Q8_NATION, vol).otherwise(
        F.lit(0).cast("decimal(24,4)")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp_nation, li.l_suppkey == supp_nation.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust_in_region, orders.o_custkey == cust_in_region.c_custkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                F.sum(nation_vol).cast("double") / F.sum(vol).cast("double")
            ).alias("mkt_share"),
            F.sum(vol).cast("double").alias("total_volume"),
        )
        .orderBy("o_year")
    )


Q15_START, Q15_END = "1996-01-01", "1996-04-01"


@register(
    "z_tpch_q15",
    oracle=f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               CAST(sum({_DISC_SQL}) AS DOUBLE) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '{Q15_START}'
          AND l_shipdate <  TIMESTAMP '{Q15_END}'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
    tags=("tpch", "join", "topk"),
)
def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 top supplier: the supplier(s) with the maximum quarterly
    revenue — the create-view + scalar-subquery shape, decorrelated into a
    revenue aggregate joined against its own broadcast 1-row max.

    Determinism: both engines derive total_revenue from the SAME exact
    DECIMAL sum cast to DOUBLE, so the equality against the max compares
    bit-identical values (comparing independently-rounded float sums for
    equality would be engine-noise; this is the registry contract's
    payoff). Shape: one suppkey aggregate with pushed date filters; the
    max is a broadcast scalar; supplier broadcasts."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(Q15_START).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q15_END).cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_disc_price()).cast("double").alias("total_revenue")
    )
    top = revenue.agg(F.max("total_revenue").alias("_mx"))
    supp = F.broadcast(load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name"))
    return (
        revenue.crossJoin(F.broadcast(top))
        .filter(F.col("total_revenue") == F.col("_mx"))
        .join(supp, F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "z_tpch_q22",
    oracle="""
    WITH avg_bal AS (
        SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(14,2))) AS DOUBLE)
               / CAST(count(*) AS DOUBLE) AS a
        FROM customer WHERE c_acctbal > 0.0
    ),
    eligible AS (
        SELECT c_custkey, c_nationkey, c_acctbal
        FROM customer CROSS JOIN avg_bal
        WHERE c_acctbal > a
          AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    )
    SELECT c_nationkey,
           CAST(count(*) AS BIGINT) AS numcust,
           CAST(sum(CAST(c_acctbal AS DECIMAL(14,2))) AS DOUBLE) AS totacctbal
    FROM eligible
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
    tags=("tpch", "join", "aggregate"),
)
def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 global-sales-opportunity (phone-prefix filter dropped —
    the fixture has no c_phone; nationkey stands in as the grouping):
    customers with above-average positive balances who never ordered.

    Shape: the average is a broadcast 1-row scalar; the no-orders test is
    a left-anti join on custkey (the decorrelated NOT EXISTS — never a
    per-row subquery); exact decimal balance sums cast to DOUBLE."""
    cust = load_table(spark, sf_dir, "customer")
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast("decimal(14,2)")).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("a")
        )
    )
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(14,2)")).cast("double").alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


Q16_SIZES = (10, 20, 30, 40)


@register(
    "z_tpch_q16",
    oracle=f"""
    SELECT p_brand, p_type, p_size,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_type <> 'PROMO'
      AND p_size IN {Q16_SIZES}
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    tags=("tpch", "join", "aggregate"),
)
def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 parts/supplier relationship (the fixture has no partsupp,
    so LINEITEM is the observed part↔supplier relation — which suppliers
    actually shipped the part; the complaint-supplier exclusion is dropped
    with it). Distinct supplier counts per excluded-brand part bucket.

    Shape: part (filtered) broadcasts; count(DISTINCT l_suppkey) expands
    to the two-phase distinct aggregate with map-side partials; the group
    key space is bounded by the part-attribute cross product."""
    part = F.broadcast(
        load_table(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#1")
            & (F.col("p_type") != "PROMO")
            & F.col("p_size").isin(list(Q16_SIZES))
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


Q18_QTY = 120


@register(
    "z_tpch_q18",
    oracle=f"""
    WITH big AS (
        SELECT l_orderkey AS b_orderkey,
               CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
        FROM lineitem
        GROUP BY l_orderkey
        HAVING sum(CAST(l_quantity AS DECIMAL(12,2))) > {Q18_QTY}
    )
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, total_qty
    FROM big
    JOIN orders   ON o_orderkey = b_orderkey
    JOIN customer ON c_custkey = o_custkey
    ORDER BY o_totalprice DESC, o_orderdate ASC, o_orderkey ASC
    LIMIT 100
    """,
    tags=("tpch", "join", "topk"),
)
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 large-volume customer: orders whose total line quantity
    exceeds a threshold, with their customers, ranked by order value.

    Shape: the HAVING filter runs on the orderkey aggregate BEFORE either
    join, so only the (rare) big orders reach the orders/customer side —
    at 100 TB that aggregate is the one lineitem shuffle, and the
    customer join's broadcast decision is LEFT TO STATS/AQE (session.py
    philosophy): at bench scale customer broadcasts on its own; at 100 TB
    customer is billions of rows and the small side is the filtered
    orders⋈big result, which AQE demotes/broadcasts at runtime — a hard
    F.broadcast(customer) hint would OOM there. Top-100 is
    TakeOrderedAndProject with a full tie-break (totalprice, orderdate,
    orderkey)."""
    big = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_orderkey").alias("b_orderkey"))
        .agg(F.sum(_dec("l_quantity")).alias("_tq"))
        .filter(F.col("_tq") > Q18_QTY)
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        orders.join(big, orders.o_orderkey == F.col("b_orderkey"))
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.col("_tq").cast("double").alias("total_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .limit(100)
    )


Q19_BANDS = (
    ("Brand#1", 1, 11, 1, 5),
    ("Brand#2", 10, 20, 1, 10),
    ("Brand#3", 20, 30, 1, 15),
)


def _q19_band_sql(brand: str, qlo: int, qhi: int, slo: int, shi: int) -> str:
    return (
        f"(p_brand = '{brand}' AND l_quantity >= {qlo} AND l_quantity <= {qhi}"
        f" AND p_size BETWEEN {slo} AND {shi})"
    )


@register(
    "z_tpch_q19",
    oracle=f"""
    SELECT CAST(sum({_DISC_SQL}) AS DOUBLE) AS revenue,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE {" OR ".join(_q19_band_sql(*b) for b in Q19_BANDS)}
    """,
    tags=("tpch", "join", "aggregate"),
)
def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 discounted revenue: an OR of three (brand, quantity band,
    size band) predicates across the part join (container/shipmode legs
    dropped — not in the fixture; p_size bands stand in for container
    classes).

    Shape: part broadcasts with a pushed-down disjunction of the three
    brand/size legs (any band may match, so the scan filter is the OR of
    the part-side conjuncts — Catalyst derives it via constraint
    propagation from the single OR filter); the residual quantity bands
    evaluate post-join inside codegen. One aggregate row out, exact
    decimal sum cast at the end."""
    part = F.broadcast(
        load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    )
    li = load_table(spark, sf_dir, "lineitem")
    band = None
    for brand, qlo, qhi, slo, shi in Q19_BANDS:
        leg = (
            (F.col("p_brand") == brand)
            & (F.col("l_quantity") >= qlo)
            & (F.col("l_quantity") <= qhi)
            & F.col("p_size").between(slo, shi)
        )
        band = leg if band is None else (band | leg)
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(band)
        .agg(
            F.sum(_disc_price()).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "z_sales_yoy_growth",
    oracle=f"""
    WITH yearly AS (
        SELECT year(o_orderdate) AS o_year,
               CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS revenue,
               CAST(count(*) AS BIGINT) AS n_orders
        FROM orders GROUP BY 1
    )
    SELECT o_year, revenue, n_orders,
           lag(revenue) OVER (ORDER BY o_year) AS prev_revenue,
           CASE WHEN lag(revenue) OVER (ORDER BY o_year) IS NOT NULL
                THEN revenue / lag(revenue) OVER (ORDER BY o_year) - 1.0 END AS yoy_growth
    FROM yearly ORDER BY o_year
    """,
    tags=("tpch", "window", "aggregate"),
)
def sales_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year revenue growth: yearly exact-decimal totals, then a
    lag window over the YEARS-bounded aggregate (the no-partition window
    runs over ≤ |years| rows — never corpus-sized; the corpus-side work
    is one map-side-combining aggregate). Growth divides the two exact
    totals as doubles."""
    from pyspark.sql.window import Window

    yearly = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(14,2)")).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )
    w = Window.orderBy("o_year")
    prev = F.lag("revenue").over(w)
    return (
        yearly.select(
            "o_year",
            "revenue",
            "n_orders",
            prev.alias("prev_revenue"),
            F.when(prev.isNotNull(), F.col("revenue") / prev - 1.0).alias("yoy_growth"),
        )
        .orderBy("o_year")
    )
