"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship query smoke check on sf0.001.
queries()     — every implemented operator/query from SURVEY.md §2,
                (spark, sf_dir) -> DataFrame.
oracle_sql()  — DuckDB-equivalent ANSI SQL per query for the driver's
                hash-comparison correctness gate.

All three delegate to hadoop_prototype_spark.plans.registry, which the
query modules populate on import.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

import hadoop_prototype_spark.plans as _plans

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: multi-way broadcast/shuffle join + exact aggregation."""
    return _plans.registry.REGISTRY["join_inner_revenue"].spark_fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _plans.registry.queries()


def oracle_sql() -> dict[str, str]:
    return _plans.registry.oracle_sql()
