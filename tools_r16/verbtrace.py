#!/usr/bin/env python
"""Per-statement job-count + wall-time trace of the snapshot SQL verb
chain (the z_snapshot_sql_verbs workload) — the job-by-job trace the
r15 verdict asked for (item 3).

Usage: python tools_r16/verbtrace.py [-n 3]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)


def main() -> None:
    n = 3
    if len(sys.argv) > 2 and sys.argv[1] == "-n":
        n = int(sys.argv[2])

    from pyspark.sql import functions as F

    from hadoop_prototype_spark.session import get_spark
    from hadoop_prototype_spark.sources.snapshot_sql import snapshot_sql
    from hadoop_prototype_spark.sources.tables import load_table

    spark = get_spark(
        app_name="hps-verbtrace",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    base = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 3 == 1)
        .select(
            F.col("o_orderkey").alias("k"),
            F.col("o_totalprice").alias("price"),
            F.col("o_orderstatus").alias("status"),
        )
    )
    base.createOrReplaceTempView("vt_base")
    # warm up the scan + JIT
    base.write.format("noop").mode("overwrite").save()

    stmts = [
        ("create", "CREATE TABLE t KEY k AS SELECT * FROM vt_base"),
        (
            "merge",
            "MERGE INTO t USING (SELECT k, price + 7.0 AS price, status "
            "FROM vt_base WHERE k % 3 = 0) s ON t.k = s.k "
            "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *",
        ),
        ("update", "UPDATE t SET price = price * 2.0 WHERE k % 7 = 2"),
        ("delete", "DELETE FROM t WHERE k % 5 = 0"),
        ("rename", "ALTER TABLE t RENAME COLUMN price TO amount"),
        ("addcol", "ALTER TABLE t ADD COLUMN flag string"),
        ("optimize", "OPTIMIZE t"),
        ("vacuum", "VACUUM t RETAIN 8760 HOURS KEEP LAST 10"),
        (
            "read_union",
            "SELECT k, amount, flag, 'cur' AS side FROM t UNION ALL "
            "SELECT k, price AS amount, CAST(NULL AS STRING) AS flag, "
            "'v2' AS side FROM t VERSION AS OF 2",
        ),
    ]

    for it in range(n):
        root = tempfile.mkdtemp(prefix="hps_verbtrace_")
        path = os.path.join(root, "tbl")
        t = {"t": path}
        print(f"--- iteration {it} ---")
        total = 0.0
        for name, stmt in stmts:
            g = f"vt-{it}-{name}"
            sc.setJobGroup(g, g)
            t0 = time.perf_counter()
            out = snapshot_sql(spark, stmt, tables=t)
            if name == "read_union":
                out.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            sc.setJobGroup(None, None)
            nj = len(tracker.getJobIdsForGroup(g) or [])
            total += dt
            print(f"  {name:12s} jobs={nj:3d} sec={dt:6.3f}")
        print(f"  {'TOTAL':12s} sec={total:6.3f}")


if __name__ == "__main__":
    main()
