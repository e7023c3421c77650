#!/usr/bin/env python
"""Count Spark jobs per registered query: build + noop-sink execution.

Usage: python tools_r16/jobcount.py <query> [<query> ...]

Per query, prints the number of Spark jobs fired during (a) the
spark_fn build call and (b) the noop-sink write — the fixed per-job
overhead audit the r15 verdict asked for (scaling block: nearly every
query is bound by per-job cost at sf0.1, so one eliminated job is
~0.3 s).
"""

from __future__ import annotations

import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)


def main() -> None:
    names = sys.argv[1:]

    from hadoop_prototype_spark.plans.registry import REGISTRY
    import hadoop_prototype_spark.plans  # noqa: F401
    from hadoop_prototype_spark.session import get_spark

    spark = get_spark(
        app_name="hps-jobcount",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    sc = spark.sparkContext
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

    tracker = sc.statusTracker()

    def jobs_in(group: str, fn):
        sc.setJobGroup(group, group)
        try:
            fn()
        finally:
            sc.setJobGroup(None, None)
        return len(tracker.getJobIdsForGroup(group) or [])

    for name in names:
        q = REGISTRY.get(name)
        if q is None:
            print(f"SKIP {name}")
            continue
        holder = {}
        nb = jobs_in(f"{name}-build", lambda: holder.update(df=q.spark_fn(spark, sf_dir)))
        ne = jobs_in(
            f"{name}-exec",
            lambda: holder["df"].write.format("noop").mode("overwrite").save(),
        )
        print(f"{name}: build_jobs={nb} exec_jobs={ne} total={nb + ne}")


if __name__ == "__main__":
    main()
