"""Every registered query with an oracle must match DuckDB exactly.

This mirrors the driver's sf0.01 gate locally (at sf0.001 for speed; set
SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 for the full check).
"""

from __future__ import annotations

import pytest

from hadoop_prototype_spark.plans.registry import REGISTRY

from .parity import compare_query

import hadoop_prototype_spark.plans  # noqa: F401  (populates REGISTRY)


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, sf_dir, name):
    q = REGISTRY[name]
    if q.oracle is None:
        df = q.spark_fn(spark, sf_dir)
        assert df.count() >= 0  # rows-only check, like the driver's
        return
    errors = compare_query(spark, sf_dir, q.spark_fn, q.oracle)
    assert not errors, f"{name}:\n" + "\n".join(errors)
