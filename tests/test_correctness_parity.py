"""Every registered query with an oracle must match DuckDB exactly.

This mirrors the driver's sf0.01 gate locally (at sf0.001 for speed; set
SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 for the full check).

The ~190 comparisons run CONCURRENTLY through one session-scoped thread
pool (r15 verdict item 2: the sequential sweep had outgrown the driver's
verify budget — each comparison is mostly fixed per-job latency at
sf0.001, which Spark's scheduler overlaps perfectly well). Each
parametrized test then just asserts its own query's precomputed result,
so failure attribution, -x and -k semantics are unchanged. Workers
default to 8; override with SPARK_GRAFT_PARITY_WORKERS=1 to debug a
flaky interaction sequentially.
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor

import pytest

from hadoop_prototype_spark.plans.registry import REGISTRY

from .parity import compare_query

import hadoop_prototype_spark.plans  # noqa: F401  (populates REGISTRY)

_WORKERS = int(os.environ.get("SPARK_GRAFT_PARITY_WORKERS", "12"))


@pytest.fixture(scope="module")
def parity_results(spark, sf_dir, request):
    """name -> list of mismatch strings, computed once for all SELECTED
    queries by a thread pool over the shared SparkSession (concurrent
    Spark actions are the documented engine surface — bench.py's
    concurrent_4x lane). Exceptions are captured per query, not raised
    here, so one broken query fails ITS test instead of the fixture
    (which would mask the other 189 results). Only queries whose
    parametrized test was actually collected run, so ``-k one_query``
    stays a one-query run."""

    def one(name: str) -> list[str]:
        q = REGISTRY[name]
        try:
            if q.oracle is None:
                df = q.spark_fn(spark, sf_dir)
                return [] if df.count() >= 0 else ["negative count"]
            return compare_query(spark, sf_dir, q.spark_fn, q.oracle)
        except Exception as e:  # noqa: BLE001 — attributed to the query's test
            return [f"EXCEPTION while running {name}: {e!r}"]

    selected = {
        item.callspec.params["name"]
        for item in request.session.items
        if getattr(item, "callspec", None) is not None
        and "name" in item.callspec.params
        and item.function.__name__ == "test_query_matches_oracle"
    }
    names = sorted(selected if selected else REGISTRY)
    with ThreadPoolExecutor(max_workers=_WORKERS) as pool:
        return dict(zip(names, pool.map(one, names)))


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
def test_query_matches_oracle(parity_results, name):
    errors = parity_results[name]
    assert not errors, f"{name}:\n" + "\n".join(errors)
