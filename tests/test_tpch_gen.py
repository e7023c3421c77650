"""Generated TPC-H extension data: structural properties the seven
z_tpch_gen_* queries rely on (parity with DuckDB is covered by
test_correctness_parity; this pins the generator semantics themselves)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_prototype_spark.plans.queries_tpch_gen import (
    PS_REPLICAS,
    SHIPMODES,
    gen_lineitem_ext,
    gen_partsupp,
)
from hadoop_prototype_spark.sources.tables import load_table


def test_partsupp_has_distinct_suppliers_per_part(spark, sf_dir):
    ps = gen_partsupp(spark, sf_dir)
    n_parts = load_table(spark, sf_dir, "part").count()
    n_supp = load_table(spark, sf_dir, "supplier").count()
    assert ps.count() == n_parts * PS_REPLICAS
    # the stride formula must assign PS_REPLICAS DISTINCT suppliers per part
    per_part = ps.groupBy("ps_partkey").agg(
        F.countDistinct("ps_suppkey").alias("d")
    )
    assert per_part.filter(F.col("d") != PS_REPLICAS).count() == 0
    # supplier keys must be valid (0-based fixture keys)
    bad = ps.filter((F.col("ps_suppkey") < 0) | (F.col("ps_suppkey") >= n_supp))
    assert bad.count() == 0
    # value domains
    assert ps.filter(
        (F.col("ps_availqty") < 1) | (F.col("ps_availqty") > 9999)
    ).count() == 0
    assert ps.filter(
        (F.col("ps_supplycost_cents") < 100) | (F.col("ps_supplycost_cents") >= 100000)
    ).count() == 0


def test_partsupp_is_deterministic(spark, sf_dir):
    a = sorted(map(tuple, gen_partsupp(spark, sf_dir).collect()))
    b = sorted(map(tuple, gen_partsupp(spark, sf_dir).collect()))
    assert a == b and len(a) > 0


def test_lineitem_ext_date_bounds_and_modes(spark, sf_dir):
    ext = gen_lineitem_ext(spark, sf_dir)
    n = load_table(spark, sf_dir, "lineitem").count()
    assert ext.count() == n  # pure column extension, no row fan-out
    bad_mode = ext.filter(~F.col("l_shipmode").isin(*SHIPMODES))
    assert bad_mode.count() == 0
    ship = F.col("l_shipdate").cast("date")
    assert ext.filter(
        (F.col("l_commitdate") < F.date_add(ship, -30))
        | (F.col("l_commitdate") > F.date_add(ship, 30))
    ).count() == 0
    assert ext.filter(
        (F.col("l_receiptdate") < F.date_add(ship, 1))
        | (F.col("l_receiptdate") > F.date_add(ship, 30))
    ).count() == 0
