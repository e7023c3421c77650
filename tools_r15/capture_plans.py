#!/usr/bin/env python
"""Capture .explain('formatted') output for named queries into
plans/r15/<query>_<tag>.txt (optimization-round evidence files).

Usage: python tools_r15/capture_plans.py <tag> <query> [<query> ...]
       python tools_r15/capture_plans.py <tag> --top N   (top-N from BENCH_DETAIL)
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
    out_dir = os.path.join(REPO_ROOT, "plans", "r15")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        q = REGISTRY.get(name)
        if q is None:
            print(f"SKIP {name}: not registered", file=sys.stderr)
            continue
        try:
            df = q.spark_fn(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
                f.write(buf.getvalue())
            print(f"wrote {name}_{tag}.txt")
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {e}", file=sys.stderr)


if __name__ == "__main__":
    main()
