"""Every registered query with an oracle must match DuckDB exactly.

This mirrors the driver's sf0.01 gate locally (at sf0.001 for speed; set
SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 for the full check).
"""

from __future__ import annotations

import pytest

from hadoop_prototype_spark.plans.registry import REGISTRY

from .parity import compare_query

import hadoop_prototype_spark.plans  # noqa: F401  (populates REGISTRY)


def test_harness_is_numeric_type_strict(spark, sf_dir):
    """The parity harness must reproduce the driver's TYPED value hash: an
    oracle whose output column is a bare integer sum(...) (DuckDB HUGEINT,
    surfacing as non-int64 through Arrow) must MISMATCH Spark's BIGINT even
    though the values are numerically equal. Round-5 regression: a
    type-blind `6 == 6.0` comparison let exactly this drift through
    (CORRECTNESS_r05 dedup_window_fraction / docs_mixture_plan)."""
    import pyspark.sql.functions as F

    def one_bigint(sp, _sf):
        return sp.range(3).agg(F.sum("id").alias("s"))

    uncast = "SELECT sum(x) AS s FROM (VALUES (0), (1), (2)) t(x)"
    assert compare_query(spark, sf_dir, one_bigint, uncast), (
        "uncast HUGEINT oracle must fail the harness"
    )
    cast = "SELECT CAST(sum(x) AS BIGINT) AS s FROM (VALUES (0), (1), (2)) t(x)"
    assert not compare_query(spark, sf_dir, one_bigint, cast)


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, sf_dir, name):
    q = REGISTRY[name]
    if q.oracle is None:
        df = q.spark_fn(spark, sf_dir)
        assert df.count() >= 0  # rows-only check, like the driver's
        return
    errors = compare_query(spark, sf_dir, q.spark_fn, q.oracle)
    assert not errors, f"{name}:\n" + "\n".join(errors)
