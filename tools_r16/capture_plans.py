#!/usr/bin/env python
"""Capture .explain('formatted') output for named queries into
plans/r16/<query>_<tag>.txt (optimization-round evidence files).

r16 extension (VERDICT r15 item 8): `DataFrame.localCheckpoint` is
intercepted during the build so the plan of every CHECKPOINT-FEEDING
frame is appended to the same file — a lazy localCheckpoint truncates
the captured downstream plan to a LogicalRDD scan, which previously
hid exactly the subtree an optimization eliminated (bm25/dedup r15
evidence gap).

Usage: python tools_r16/capture_plans.py <tag> <query> [<query> ...]
       python tools_r16/capture_plans.py <tag> --top N   (top-N from BENCH_DETAIL)
"""

from __future__ import annotations

import io
import json
import os
import sys
from contextlib import redirect_stdout

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    if names and names[0] == "--top":
        n = int(names[1])
        with open(os.path.join(REPO_ROOT, "BENCH_DETAIL.json")) as f:
            d = json.load(f)
        names = [
            k
            for k, _ in sorted(d["queries"].items(), key=lambda kv: -kv[1])[:n]
        ]

    from hadoop_prototype_spark.plans.registry import REGISTRY
    import hadoop_prototype_spark.plans  # noqa: F401
    from hadoop_prototype_spark.session import get_spark

    spark = get_spark(
        app_name="hps-explain",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(REPO_ROOT, "plans", "r16")
    os.makedirs(out_dir, exist_ok=True)

    # patch the CONCRETE class (Spark 4 splits pyspark.sql.DataFrame into
    # an abstract base + classic/connect subclasses; patching the base
    # intercepts nothing — the r16 fix that makes this tool actually work)
    DataFrame = type(spark.range(1))
    cp_plans: list[str] = []
    orig_lcp = DataFrame.localCheckpoint

    def traced_lcp(self, eager=True):
        buf = io.StringIO()
        with redirect_stdout(buf):
            self.explain("formatted")
        cp_plans.append(buf.getvalue())
        return orig_lcp(self, eager=eager)

    DataFrame.localCheckpoint = traced_lcp
    try:
        for name in names:
            q = REGISTRY.get(name)
            if q is None:
                print(f"SKIP {name}: not registered", file=sys.stderr)
                continue
            try:
                cp_plans.clear()
                df = q.spark_fn(spark, sf_dir)
                buf = io.StringIO()
                with redirect_stdout(buf):
                    df.explain("formatted")
                with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
                    f.write(buf.getvalue())
                    for i, p in enumerate(cp_plans, 1):
                        f.write(
                            f"\n\n=== checkpoint-feeding plan {i} of "
                            f"{len(cp_plans)} (frame materialized by "
                            f"localCheckpoint during build) ===\n"
                        )
                        f.write(p)
                print(f"wrote {name}_{tag}.txt ({len(cp_plans)} checkpoint plans)")
            except Exception as e:  # noqa: BLE001
                print(f"FAIL {name}: {e}", file=sys.stderr)
    finally:
        DataFrame.localCheckpoint = orig_lcp


if __name__ == "__main__":
    main()
