#!/usr/bin/env python
"""Time registered queries in isolation: min/median of N noop-sink runs.

Usage: python tools_r15/timeq.py [-n 5] <query> [<query> ...]
"""

from __future__ import annotations

import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)


def main() -> None:
    args = sys.argv[1:]
    n = 5
    if args and args[0] == "-n":
        n = int(args[1])
        args = args[2:]

    from hadoop_prototype_spark.plans.registry import REGISTRY
    import hadoop_prototype_spark.plans  # noqa: F401
    from hadoop_prototype_spark.session import get_spark

    spark = get_spark(
        app_name="hps-timeq",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    for name in args:
        q = REGISTRY.get(name)
        if q is None:
            print(f"SKIP {name}")
            continue
        runs, builds = [], []
        for _ in range(n):
            t0 = time.perf_counter()
            df = q.spark_fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            builds.append(t1 - t0)
            runs.append(t2 - t1)
        tot = sorted(b + r for b, r in zip(builds, runs))
        print(
            f"{name}: total_min={tot[0]:.3f} total_med={tot[len(tot)//2]:.3f} "
            f"build_min={min(builds):.3f} exec_min={min(runs):.3f} "
            f"all={[round(b + r, 3) for b, r in zip(builds, runs)]}"
        )


if __name__ == "__main__":
    main()
