"""TPC-H Q2/Q4/Q9/Q11/Q12/Q20/Q21 over DETERMINISTICALLY GENERATED
extension data.

The driver fixture has no ``partsupp`` table and its ``lineitem`` lacks
shipmode/commitdate/receiptdate, which made these seven spec shapes
unreachable in rounds ≤6. Rather than shipping side files, the missing
data is derived as PURE PORTABLE EXPRESSIONS over the fixture tables
(seeded like TeraGen — sources/generators.py's philosophy applied to
relational columns):

- ``partsupp``: 4 supplier assignments per part via the dbgen-style
  stride formula ``(p_partkey + i·(S/4+1)) mod S``. The four suppliers
  are distinct iff no multiple d·(S/4+1) for d in 1..3 is ≡ 0 (mod S) —
  true for the fixture's S=1000 (step 251) and every realistic S, but
  NOT for a handful of tiny counts (S ∈ {4, 6, 9, 12}: e.g. S=4 gives
  step 2 and i=0/i=2 collide); gen_partsupp asserts the condition so a
  pathological fixture fails loudly instead of silently duplicating
  (ps_partkey, ps_suppkey) rows into Q2/Q9/Q11. availqty/supplycost come
  from the engine-portable md5 hash (functions/hashing.py). Supplier
  count S comes from the supplier table itself, so the same definition
  scales with the fixture.
- ``lineitem`` extension: l_shipmode / l_commitdate / l_receiptdate as
  md5-derived functions of (l_orderkey, l_linenumber) and l_shipdate.

Because both sides derive the identical rows from the identical views,
the DuckDB oracle rebuilds the generated tables in a CTE — the driver's
side-by-side gate applies to these queries exactly like any other (no
temp files, no ordering dependence between query and oracle).

Supply cost is carried as EXACT INTEGER CENTS (ps_supplycost_cents);
money aggregates multiply decimals/integers exactly and cast to DOUBLE
only at the end (plans/registry.py determinism contract).

Scale shapes: partsupp-sized joins shuffle on their keys; part/supplier/
nation/region dims broadcast; Q21's exists/not-exists are semi/anti
joins on orderkey; Q11's total is a 1-row scalar collected off a
localCheckpointed per-part aggregate (no second pass, no 1-row
crossJoin). Reference parity anchor: the examples' join drivers
(EX/Join.java:61) — these queries are the strongest relational evidence
the fixture allows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import md5_int_spark_sql, md5_int_sql
from ..sources.tables import load_table
from .registry import register

PS_REPLICAS = 4
AVAILQTY_MOD = 9999
COST_CENTS_MOD = 99900  # supplycost ∈ [1.00, 1000.00)

SHIPMODES = ("AIR", "FOB", "MAIL", "RAIL", "REG AIR", "SHIP", "TRUCK")

Q2_SIZE = 15
Q2_TYPE = "STANDARD"
Q2_REGION = "EUROPE"
Q4_DATE, Q4_DATE_END = "1996-07-01", "1996-10-01"
Q9_NAME_FRAG = "red"
Q11_NATION = "NATION_3"
Q11_FRACTION = 0.001
Q12_MODES = ("MAIL", "SHIP")
Q12_DATE, Q12_DATE_END = "1996-01-01", "1997-01-01"
Q20_NATION = "NATION_3"
Q20_DATE, Q20_DATE_END = "1996-01-01", "1997-01-01"
Q21_NATION = "NATION_3"


def _shipmode_case(h: str) -> str:
    whens = " ".join(
        f"WHEN {i} THEN '{m}'" for i, m in enumerate(SHIPMODES[:-1])
    )
    return f"CASE CAST({h} % 7 AS INT) {whens} ELSE '{SHIPMODES[-1]}' END"


# --- generated partsupp -------------------------------------------------------

def _ps_hash_exprs(dialect: str) -> tuple[str, str]:
    """(availqty, supplycost_cents) expressions over (ps_partkey, ps_suppkey)."""
    if dialect == "spark":
        key = "concat(CAST(ps_partkey AS STRING), '|', CAST(ps_suppkey AS STRING))"
        h = lambda salt: md5_int_spark_sql(key, salt=salt)  # noqa: E731
    else:
        key = "(ps_partkey::VARCHAR || '|' || ps_suppkey::VARCHAR)"
        h = lambda salt: md5_int_sql(key, salt=salt)  # noqa: E731
    return (
        f"1 + {h('psq|')} % {AVAILQTY_MOD}",
        f"100 + {h('psc|')} % {COST_CENTS_MOD}",
    )


def gen_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(ps_partkey, ps_suppkey, ps_availqty, ps_supplycost_cents)."""
    part = load_table(spark, sf_dir, "part").select("p_partkey")
    # 1-row scalar as a plan literal (the quality-filter idiom): supplier
    # count, so the stride scales with the fixture's S
    s = load_table(spark, sf_dir, "supplier").count()
    if s < PS_REPLICAS:
        raise ValueError(
            f"supplier table has {s} rows; need >= {PS_REPLICAS} for "
            f"{PS_REPLICAS} distinct assignments per part"
        )
    step = s // PS_REPLICAS + 1
    # the i-th and (i+d)-th assignments collide iff d*step ≡ 0 (mod s);
    # the oracle CTE hard-codes the same formula, so a pathological
    # supplier count must fail here rather than desync the two sides
    for d in range(1, PS_REPLICAS):
        if d * step % s == 0:
            raise ValueError(
                f"supplier count {s} makes stride {step} collide at replica "
                f"{d}: (ps_partkey, ps_suppkey) would not be distinct"
            )
    availqty, cents = _ps_hash_exprs("spark")
    return (
        part.selectExpr(
            "p_partkey AS ps_partkey",
            f"explode(array({','.join(str(i) for i in range(PS_REPLICAS))})) AS i",
        )
        .selectExpr(
            "ps_partkey",
            f"(ps_partkey + i * {step}) % {s} AS ps_suppkey",
        )
        .selectExpr(
            "ps_partkey",
            "ps_suppkey",
            f"{availqty} AS ps_availqty",
            f"{cents} AS ps_supplycost_cents",
        )
    )


def _partsupp_cte() -> str:
    availqty, cents = _ps_hash_exprs("duck")
    ivals = ", ".join(str(i) for i in range(PS_REPLICAS))
    return f"""
    gen_partsupp AS (
        SELECT ps_partkey, ps_suppkey,
               {availqty} AS ps_availqty,
               {cents} AS ps_supplycost_cents
        FROM (
            SELECT p_partkey AS ps_partkey,
                   (p_partkey + t.i * ((sc.s // {PS_REPLICAS}) + 1)) % sc.s AS ps_suppkey
            FROM part
            CROSS JOIN (SELECT count(*) AS s FROM supplier) sc
            CROSS JOIN (SELECT unnest([{ivals}]) AS i) t
        )
    )"""


# --- generated lineitem extension --------------------------------------------

def _li_ext_exprs(dialect: str) -> tuple[str, str, str]:
    """(l_shipmode, l_commitdate, l_receiptdate) expressions over lineitem."""
    if dialect == "spark":
        key = "concat(CAST(l_orderkey AS STRING), '|', CAST(l_linenumber AS STRING))"
        h = lambda salt: md5_int_spark_sql(key, salt=salt)  # noqa: E731
        dadd = lambda n: f"date_add(CAST(l_shipdate AS DATE), CAST({n} AS INT))"  # noqa: E731
        # array lookup, NOT the CASE chain the oracle states: a CASE
        # re-evaluates the md5 hash once per branch tried (and Catalyst
        # additionally inlines the whole expression into every consumer),
        # which measured ~2x on Q12's scan. element_at evaluates the hash
        # ONCE per reference; same value for every input (r15 opt §4).
        arr = ", ".join(f"'{m}'" for m in SHIPMODES)
        mode = (
            f"element_at(array({arr}), "
            f"CAST({h('lsm|')} % {len(SHIPMODES)} AS INT) + 1)"
        )
    else:
        key = "(l_orderkey::VARCHAR || '|' || l_linenumber::VARCHAR)"
        h = lambda salt: md5_int_sql(key, salt=salt)  # noqa: E731
        dadd = lambda n: f"(CAST(l_shipdate AS DATE) + CAST({n} AS INT))"  # noqa: E731
        mode = _shipmode_case(h("lsm|"))
    return (
        mode,
        dadd(f"({h('lcd|')} % 61) - 30"),  # commit ∈ [ship-30, ship+30]
        dadd(f"1 + {h('lrd|')} % 30"),  # receipt ∈ [ship+1, ship+30]
    )


def gen_lineitem_ext(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem plus l_shipmode / l_commitdate / l_receiptdate."""
    mode, commit, receipt = _li_ext_exprs("spark")
    return load_table(spark, sf_dir, "lineitem").selectExpr(
        "*",
        f"{mode} AS l_shipmode",
        f"{commit} AS l_commitdate",
        f"{receipt} AS l_receiptdate",
    )


def _lineitem_ext_cte() -> str:
    mode, commit, receipt = _li_ext_exprs("duck")
    return f"""
    lineitem_ext AS (
        SELECT *,
               {mode} AS l_shipmode,
               {commit} AS l_commitdate,
               {receipt} AS l_receiptdate
        FROM lineitem
    )"""


# --- Q2: minimum-cost supplier ------------------------------------------------

@register(
    "z_tpch_gen_q2",
    oracle=f"""
    WITH {_partsupp_cte()},
    region_supp AS (
        SELECT s_suppkey, s_name, s_acctbal, n_name
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = '{Q2_REGION}'
    ),
    cost AS (
        SELECT ps_partkey, ps_suppkey, ps_supplycost_cents,
               s_name, s_acctbal, n_name
        FROM gen_partsupp JOIN region_supp ON ps_suppkey = s_suppkey
    ),
    minc AS (
        SELECT ps_partkey, min(ps_supplycost_cents) AS min_cents
        FROM cost GROUP BY ps_partkey
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_type,
           CAST(ps_supplycost_cents AS DOUBLE) / 100.0 AS ps_supplycost,
           ps_suppkey
    FROM cost
    JOIN minc ON cost.ps_partkey = minc.ps_partkey
             AND cost.ps_supplycost_cents = minc.min_cents
    JOIN part ON p_partkey = cost.ps_partkey
    WHERE p_size = {Q2_SIZE} AND p_type = '{Q2_TYPE}'
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey, ps_suppkey
    LIMIT 100
    """,
    tags=("tpch", "gen", "join", "topk"),
)
def tpch_gen_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 minimum-cost supplier (fixture-adapted: p_type equality for the
    '%BRASS' suffix, p_type standing in for the missing p_mfgr output,
    ps_suppkey appended as a total tie-break).

    Shape: region-filtered supplier dim broadcasts into the partsupp-sized
    cost relation; the per-part min is a partial-aggregated groupBy joined
    back on (part, cost) — no correlated subquery, no window over a
    single partition. Top-100 is TakeOrdered."""
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == Q2_REGION)
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    cost = gen_partsupp(spark, sf_dir).join(
        F.broadcast(supp), F.col("ps_suppkey") == F.col("s_suppkey")
    )
    minc = cost.groupBy("ps_partkey").agg(
        F.min("ps_supplycost_cents").alias("min_cents")
    )
    part = (
        load_table(spark, sf_dir, "part")
        .filter((F.col("p_size") == Q2_SIZE) & (F.col("p_type") == Q2_TYPE))
        .select("p_partkey", "p_type")
    )
    return (
        cost.join(
            minc.withColumnRenamed("ps_partkey", "_mk"),
            (F.col("ps_partkey") == F.col("_mk"))
            & (F.col("ps_supplycost_cents") == F.col("min_cents")),
        )
        .join(F.broadcast(part), F.col("p_partkey") == F.col("ps_partkey"))
        .selectExpr(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_type",
            "CAST(ps_supplycost_cents AS DOUBLE) / 100.0 AS ps_supplycost",
            "ps_suppkey",
        )
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey", "ps_suppkey"
        )
        .limit(100)
    )


# --- Q4: order priority checking ----------------------------------------------

@register(
    "z_tpch_gen_q4",
    oracle=f"""
    WITH {_lineitem_ext_cte()}
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '{Q4_DATE}'
      AND o_orderdate <  TIMESTAMP '{Q4_DATE_END}'
      AND EXISTS (
          SELECT 1 FROM lineitem_ext
          WHERE l_orderkey = o_orderkey AND l_commitdate < l_receiptdate
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("tpch", "gen", "join"),
)
def tpch_gen_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 order-priority checking on the generated commit/receipt dates.

    Shape: the EXISTS is a left-semi join against lineitem pre-filtered
    map-side to late lines (commit < receipt); orders' quarter filter
    pushes to its scan before the one orderkey shuffle."""
    late = (
        gen_lineitem_ext(spark, sf_dir)
        .filter(F.col("l_commitdate") < F.col("l_receiptdate"))
        .select("l_orderkey")
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(Q4_DATE).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(Q4_DATE_END).cast("timestamp"))
    )
    return (
        orders.join(late, orders.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# --- Q9: product-type profit ----------------------------------------------------

_Q9_AMOUNT_SPARK = (
    "CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))"
    " - CAST(ps_supplycost_cents AS DECIMAL(14,2)) * CAST(0.01 AS DECIMAL(3,2))"
    "   * CAST(l_quantity AS DECIMAL(12,2))"
)
_Q9_AMOUNT_DUCK = _Q9_AMOUNT_SPARK  # identical decimal-exact arithmetic text


@register(
    "z_tpch_gen_q9",
    oracle=f"""
    WITH {_partsupp_cte()}
    SELECT n_name AS nation,
           CAST(year(o_orderdate) AS INT) AS o_year,
           CAST(sum({_Q9_AMOUNT_DUCK}) AS DOUBLE) AS sum_profit
    FROM lineitem
    JOIN gen_partsupp ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
    JOIN part ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders ON o_orderkey = l_orderkey
    JOIN nation ON n_nationkey = s_nationkey
    WHERE p_name LIKE '%{Q9_NAME_FRAG}%'
    GROUP BY n_name, o_year
    ORDER BY nation, o_year DESC
    """,
    tags=("tpch", "gen", "join"),
)
def tpch_gen_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 product-type profit: supply cost comes from the generated
    partsupp in exact integer cents, multiplied into the decimal amount
    (exact products, one final cast to DOUBLE).

    Shape: name-filtered part broadcasts and prunes lineitem FIRST; the
    partsupp join is keyed (l_partkey, l_suppkey); orders joins on the
    single large orderkey shuffle; supplier/nation broadcast."""
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like(f"%{Q9_NAME_FRAG}%"))
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").join(
        F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")
    )
    ps = gen_partsupp(spark, sf_dir)
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    return (
        li.join(
            ps,
            (F.col("ps_partkey") == F.col("l_partkey"))
            & (F.col("ps_suppkey") == F.col("l_suppkey")),
        )
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .selectExpr(
            "n_name AS nation",
            "CAST(year(o_orderdate) AS INT) AS o_year",
            f"{_Q9_AMOUNT_SPARK} AS _amount",
        )
        .groupBy("nation", "o_year")
        .agg(F.sum("_amount").cast("double").alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


# --- Q11: important stock -------------------------------------------------------

@register(
    "z_tpch_gen_q11",
    oracle=f"""
    WITH {_partsupp_cte()},
    natps AS (
        SELECT ps_partkey,
               CAST(sum(ps_supplycost_cents * ps_availqty) AS BIGINT) AS value_cents
        FROM gen_partsupp
        JOIN supplier ON ps_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = '{Q11_NATION}'
        GROUP BY ps_partkey
    )
    SELECT ps_partkey, CAST(value_cents AS DOUBLE) / 100.0 AS value
    FROM natps
    WHERE CAST(value_cents AS DOUBLE)
          > (SELECT CAST(sum(value_cents) AS DOUBLE) FROM natps) * {Q11_FRACTION!r}
    ORDER BY value DESC, ps_partkey
    """,
    tags=("tpch", "gen", "join"),
)
def tpch_gen_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 important stock: per-part supply value in the target nation vs
    a fraction of the national total, all in exact integer cents.

    Shape: nation-filtered supplier broadcasts into partsupp; the per-part
    sums are localCheckpointed so the grand total (a 1-row scalar baked as
    a literal) does not re-run the join — the DSIR scan-reuse idiom."""
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(load_table(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .filter(F.col("n_name") == Q11_NATION)
        .select("s_suppkey")
    )
    sums = (
        gen_partsupp(spark, sf_dir)
        .join(F.broadcast(supp), F.col("ps_suppkey") == F.col("s_suppkey"))
        .groupBy("ps_partkey")
        .agg(
            F.sum(F.col("ps_supplycost_cents") * F.col("ps_availqty")).alias(
                "value_cents"
            )
        )
        .localCheckpoint(eager=False)
    )
    total = sums.agg(F.sum("value_cents")).first()[0] or 0
    threshold = float(total) * Q11_FRACTION
    return (
        sums.filter(F.col("value_cents").cast("double") > F.lit(threshold))
        .selectExpr("ps_partkey", "CAST(value_cents AS DOUBLE) / 100.0 AS value")
        .orderBy(F.col("value").desc(), "ps_partkey")
    )


# --- Q12: shipping modes and order priority --------------------------------------

@register(
    "z_tpch_gen_q12",
    oracle=f"""
    WITH {_lineitem_ext_cte()}
    SELECT l_shipmode,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem_ext ON o_orderkey = l_orderkey
    WHERE l_shipmode IN {Q12_MODES!r}
      AND l_commitdate < l_receiptdate
      AND l_shipdate < CAST(l_commitdate AS TIMESTAMP)
      AND l_receiptdate >= DATE '{Q12_DATE}'
      AND l_receiptdate <  DATE '{Q12_DATE_END}'
    GROUP BY l_shipmode
    ORDER BY l_shipmode
    """,
    tags=("tpch", "gen", "join"),
)
def tpch_gen_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shipping-mode priority counts over the generated dates/modes.

    Shape: every lineitem predicate is map-side (the generated columns are
    pure expressions of scanned ones), so only qualifying lines reach the
    orderkey shuffle; the priority split is a conditional partial agg."""
    li = gen_lineitem_ext(spark, sf_dir).filter(
        F.col("l_shipmode").isin(*Q12_MODES)
        & (F.col("l_commitdate") < F.col("l_receiptdate"))
        & (F.col("l_shipdate") < F.col("l_commitdate").cast("timestamp"))
        & (F.col("l_receiptdate") >= F.lit(Q12_DATE).cast("date"))
        & (F.col("l_receiptdate") < F.lit(Q12_DATE_END).cast("date"))
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    return (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_shipmode")
        .agg(
            F.sum(
                F.when(
                    F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
                ).otherwise(0)
            ).alias("high_line_count"),
            F.sum(
                F.when(
                    ~F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
                ).otherwise(0)
            ).alias("low_line_count"),
        )
        .orderBy("l_shipmode")
    )


# --- Q20: potential part promotion ------------------------------------------------

@register(
    "z_tpch_gen_q20",
    oracle=f"""
    WITH {_partsupp_cte()},
    qty AS (
        SELECT l_partkey, l_suppkey, sum(l_quantity) AS half_base
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '{Q20_DATE}'
          AND l_shipdate <  TIMESTAMP '{Q20_DATE_END}'
        GROUP BY l_partkey, l_suppkey
    ),
    cand AS (
        SELECT DISTINCT ps_suppkey
        FROM gen_partsupp
        JOIN (SELECT p_partkey FROM part WHERE p_name LIKE '{Q9_NAME_FRAG}%') p
             ON ps_partkey = p_partkey
        JOIN qty ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
        WHERE CAST(ps_availqty AS DOUBLE) > 0.5 * half_base
    )
    SELECT s_name, s_suppkey
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN cand ON s_suppkey = ps_suppkey
    WHERE n_name = '{Q20_NATION}'
    ORDER BY s_name, s_suppkey
    """,
    tags=("tpch", "gen", "join"),
)
def tpch_gen_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 potential part promotion (fixture-adapted output: s_suppkey for
    the missing s_address). The correlated availqty > ½·shipped-quantity
    subquery decorrelates to a pre-aggregated (part, supplier) quantity
    joined inner — identical to the NULL-excluding correlated semantics.

    Shape: the name-filtered part list broadcasts and prunes partsupp
    map-side; lineitem pre-aggregates to the (part, supplier) grain before
    its only shuffle; the supplier gate is a semi join."""
    red = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like(f"{Q9_NAME_FRAG}%"))
        .select("p_partkey")
    )
    qty = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit(Q20_DATE).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(Q20_DATE_END).cast("timestamp"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("half_base"))
    )
    cand = (
        gen_partsupp(spark, sf_dir)
        .join(F.broadcast(red), F.col("ps_partkey") == F.col("p_partkey"))
        .join(
            qty,
            (F.col("l_partkey") == F.col("ps_partkey"))
            & (F.col("l_suppkey") == F.col("ps_suppkey")),
        )
        .filter(F.col("ps_availqty").cast("double") > 0.5 * F.col("half_base"))
        .select("ps_suppkey")
        .distinct()
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(load_table(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .filter(F.col("n_name") == Q20_NATION)
    )
    return (
        supp.join(cand, F.col("s_suppkey") == F.col("ps_suppkey"), "left_semi")
        .select("s_name", "s_suppkey")
        .orderBy("s_name", "s_suppkey")
    )


# --- Q21: suppliers who kept orders waiting -----------------------------------------

@register(
    "z_tpch_gen_q21",
    oracle=f"""
    WITH {_lineitem_ext_cte()}
    SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM supplier
    JOIN lineitem_ext l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE o_orderstatus = 'F'
      AND l1.l_receiptdate > l1.l_commitdate
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
          SELECT 1 FROM lineitem_ext l3
          WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_receiptdate > l3.l_commitdate
      )
      AND n_name = '{Q21_NATION}'
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
    tags=("tpch", "gen", "join", "topk"),
)
def tpch_gen_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 suppliers who kept orders waiting: the sole late supplier on a
    multi-supplier finished order.

    Shape: EXISTS → left-semi and NOT EXISTS → left-anti joins on
    orderkey with a suppkey-inequality residual; the late-line set
    (commit/receipt md5 derivation + filter) is computed ONCE and
    materialized (lazy localCheckpoint — 16 bytes/row of keys), then
    feeds BOTH the l1 and l3 legs: without it each leg re-scans
    lineitem and re-derives the generated dates (measured 3.0→2.15 s
    at sf0.1; at cluster scale the same frame would persist to disk).
    Nation-filtered supplier broadcasts; top-100 is TakeOrdered."""
    nation = (
        load_table(spark, sf_dir, "nation")
        .filter(F.col("n_name") == Q21_NATION)
        .select("n_nationkey")
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name")
    )
    late = (
        gen_lineitem_ext(spark, sf_dir)
        .filter(F.col("l_receiptdate") > F.col("l_commitdate"))
        .select("l_orderkey", "l_suppkey")
        .localCheckpoint(eager=False)
    )
    l1 = late.join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
    orders_f = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    l1 = l1.join(orders_f, F.col("o_orderkey") == F.col("l_orderkey"))
    l2 = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("_ok2"), F.col("l_suppkey").alias("_sk2")
    )
    l1 = l1.join(
        l2,
        (F.col("_ok2") == F.col("l_orderkey")) & (F.col("_sk2") != F.col("l_suppkey")),
        "left_semi",
    )
    l3 = late.select(F.col("l_orderkey").alias("_ok3"), F.col("l_suppkey").alias("_sk3"))
    l1 = l1.join(
        l3,
        (F.col("_ok3") == F.col("l_orderkey")) & (F.col("_sk3") != F.col("l_suppkey")),
        "left_anti",
    )
    return (
        l1.groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )
