#!/usr/bin/env python
"""Empirical scale curves for the flagship pipeline operators.

SCALE.md argues 100 TB shapes; this script MEASURES them the way
BASELINE.md does for terasort: run dedup minhash-LSH, BM25 retrieval, and
CCNet quality tiers over generated corpora at 1x / 10x / 100x the sf0.1
documents volume (5k / 50k / 500k docs, fixture-like word soup with a 10%
exact-duplicate tail so LSH has real work), recording wall time and
shuffle-write bytes (from the Spark UI REST API).

Near-linear growth in both columns is the pass criterion — a super-linear
shuffle column is exactly the all-pairs/skew failure the plan-smell tests
exist to prevent.

Usage: python scale_curves.py  (prints one JSON line per (op, scale))
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

BASE_DOCS = 5_000  # sf0.1 documents row count
SCALES = (1, 10, 100)


VOCAB = 1000  # distinct words: 3-shingle space ~10^9, so random band
# collisions stay rare and the LSH pair count tracks the PLANTED dups
# (a 36-word vocab makes every doc a near-dup of every other — measured
# 43.8M pairs at 500k docs — which benchmarks the data, not the operator)

BM25_SCALE_QUERIES = ((0, "w1 w2 w3"), (1, "w10 w20"), (2, "w42 w7 w99"))


def gen_docs(spark, n: int):
    """Fixture-like documents table, deterministic (md5-seeded like
    RandomTextWriter): 10-60 words from a 1000-word vocab, 20 sources,
    5 langs; every 10th doc duplicates its predecessor (exact-dup tail,
    so LSH has a known linear-sized answer)."""
    parts = max(32, n // 20_000)
    rng = spark.range(0, n, 1, parts)
    # seed: every 10th doc reuses the previous doc's seed → exact dup pair
    seeded = rng.selectExpr(
        "id AS doc_id",
        "CASE WHEN id % 10 = 9 THEN id - 1 ELSE id END AS _seed",
    )
    h = (
        lambda j: f"CAST(conv(substring(md5(concat(CAST(_seed AS STRING), '_w{j}')), 1, 8), 16, 10) AS BIGINT)"
    )
    arr = "array(" + ", ".join(
        f"concat('w', CAST({h(j)} % {VOCAB} AS STRING))" for j in range(60)
    ) + ")"
    wc = (
        "CAST(10 + CAST(conv(substring(md5(concat(CAST(_seed AS STRING), '_len')), 1, 8), 16, 10) AS BIGINT) % 51 AS INT)"
    )
    return seeded.selectExpr(
        "doc_id",
        f"concat_ws(' ', slice({arr}, 1, {wc})) AS text",
        "element_at(array('en','de','es','fr','zh'), CAST(doc_id % 5 AS INT) + 1) AS lang",
        "concat('src_', CAST(doc_id % 20 AS STRING)) AS source",
    ).selectExpr("doc_id", "text", "lang", "source", "length(text) AS n_chars")


def gen_batch(spark, n_corpus: int, nb: int = 5_000):
    """A fixed-size ingest batch against an n_corpus-doc index: ids start at
    n_corpus; every 5th doc reuses a corpus doc's seed (a planted cross-batch
    dup the index must catch), the rest draw seeds disjoint from the corpus
    (10*n_corpus + i) so they collide only by LSH chance."""
    seeded = spark.range(0, nb, 1, 32).selectExpr(
        f"id + {n_corpus} AS doc_id",
        f"CASE WHEN id % 5 = 0 THEN (id * 97) % {n_corpus} "
        f"ELSE {10 * n_corpus} + id END AS _seed",
    )
    h = (
        lambda j: f"CAST(conv(substring(md5(concat(CAST(_seed AS STRING), '_w{j}')), 1, 8), 16, 10) AS BIGINT)"
    )
    arr = "array(" + ", ".join(
        f"concat('w', CAST({h(j)} % {VOCAB} AS STRING))" for j in range(60)
    ) + ")"
    wc = (
        "CAST(10 + CAST(conv(substring(md5(concat(CAST(_seed AS STRING), '_len')), 1, 8), 16, 10) AS BIGINT) % 51 AS INT)"
    )
    return seeded.selectExpr(
        "doc_id",
        f"concat_ws(' ', slice({arr}, 1, {wc})) AS text",
        "element_at(array('en','de','es','fr','zh'), CAST(doc_id % 5 AS INT) + 1) AS lang",
        "concat('src_', CAST(doc_id % 20 AS STRING)) AS source",
    ).selectExpr("doc_id", "text", "lang", "source", "length(text) AS n_chars")


def shuffle_write_bytes(ui_url: str, app_id: str) -> int:
    # ui_url comes from sc.uiWebUrl: spark.ui.port is a preference, not a
    # guarantee — if the port is taken Spark binds the next free one
    url = f"{ui_url}/api/v1/applications/{app_id}/stages?status=complete"
    with urllib.request.urlopen(url, timeout=10) as r:
        stages = json.loads(r.read())
    return sum(s.get("shuffleWriteBytes", 0) for s in stages)


def _recipe(docs, stats):
    from pyspark.sql import functions as F

    from hadoop_prototype_spark.operators import decontam, dedup, sampling, textstats

    clean = decontam.decontaminate(docs, k=8)
    quality_ok = textstats.quality_percentile_filter(docs, stats=stats).select("doc_id")
    keepers = dedup.exact_dedup(docs).select(F.col("keeper_id").alias("doc_id"))
    surv = (
        clean.join(quality_ok, "doc_id", "left_semi")
        .join(keepers, "doc_id", "left_semi")
        .select("doc_id", "source", "text")
        .localCheckpoint(eager=False)
    )
    return sampling.budget_select(surv, 4000)


def pruned_index_io_curve(spark) -> None:
    """Per-batch index IO vs corpus age — the round-10 prunable-layout
    claim. Deployment rule is hash-table resizing: size BAND_BUCKETS so a
    trickle batch's key count stays below it (here 50 docs × 4 bands =
    200 keys, buckets=2048); then the batch touches ≤ keys buckets and,
    with the band_key IN pushdown + bloom filters, only the files that
    actually hold its keys — so touched bytes stay ~flat while the index
    grows 16×. Prints one JSON line per scale."""
    import glob as _glob
    import urllib.parse

    from pyspark.sql import functions as F

    from hadoop_prototype_spark.operators import dedup

    buckets = 2048
    batch = gen_batch(spark, 10**9, nb=50)  # a 50-doc trickle batch
    keys = dedup.lsh_index_keys(batch, buckets=buckets).localCheckpoint(
        eager=False
    )
    for m in (1, 4, 16):
        n = 20_000 * m
        idx = f"/tmp/hps_scale_pruned_idx_{buckets}_{n}"
        if not os.path.exists(os.path.join(idx, "_SUCCESS")):
            dedup.write_lsh_index(
                dedup.lsh_index_keys(gen_docs(spark, n), buckets=buckets),
                idx,
                mode="overwrite",
                buckets=buckets,  # layout contract: recorded + recomputed
            )
        files = _glob.glob(f"{idx}/band_bucket=*/*.parquet")
        total_mb = sum(os.path.getsize(f) for f in files) / 1e6
        pruned = dedup.read_lsh_index_pruned(spark, idx, keys)
        touched = [
            urllib.parse.unquote(r.f.replace("file://", ""))
            for r in pruned.select(F.input_file_name().alias("f"))
            .distinct()
            .collect()
        ]
        tmb = sum(os.path.getsize(f) for f in touched) / 1e6
        print(
            json.dumps(
                {
                    "op": "pruned_index_io_batch50",
                    "scale": m,
                    "index_files": len(files),
                    "index_mb": round(total_mb, 2),
                    "touched_files": len(touched),
                    "touched_mb": round(tmb, 3),
                }
            ),
            flush=True,
        )


def delta_log_bytes_curve(spark) -> None:
    """Per-commit snapshot-log bytes vs table file count — the delta-log
    cadence's claim (round-10 verdict #6): a 1-row merge over an F-file
    table persists a changed-slice-sized delta entry, so commit bytes
    track the WRITE, while the old all-full design paid the checkpoint
    entry (O(F)) on EVERY commit. Prints one JSON line per table size."""
    import shutil

    from hadoop_prototype_spark.sources import snapshots as sn

    for parts in (32, 128, 512):
        path = f"/tmp/hps_scale_deltalog_{parts}"
        shutil.rmtree(path, ignore_errors=True)
        df = spark.range(parts * 100).selectExpr(
            "id AS k", "id * 2 AS v"
        ).repartitionByRange(parts, "k")
        sn.create_table(df, path, "k")
        ckpt_bytes = os.path.getsize(sn._entry_path(path, 1))
        deltas = []
        for i in range(5):
            r = sn.merge_into(
                spark, path,
                spark.createDataFrame([(int(100 * i + 1), -1)], "k bigint, v bigint"),
                "k",
            )
            deltas.append(os.path.getsize(sn._entry_path(path, r["version"])))
        med = sorted(deltas)[len(deltas) // 2]
        print(
            json.dumps(
                {
                    "op": "delta_log_commit_bytes_1row_merge",
                    "table_files": parts,
                    "checkpoint_entry_bytes": ckpt_bytes,
                    "delta_entry_bytes_median": med,
                    "old_design_ratio": round(ckpt_bytes / med, 1),
                }
            ),
            flush=True,
        )
        shutil.rmtree(path, ignore_errors=True)


def clone_bytes_curve(spark) -> None:
    """Zero-copy CLONE cost vs table size — the refs.clone_table claim:
    cloning hardlinks every data/vector file and writes one v1 log
    entry, so wall time scales with the FILE COUNT (metadata ops) while
    data bytes copied stay exactly zero however large the table grows.
    Disk usage is checked via inode identity (st_nlink rises, no new
    data blocks). Prints one JSON line per table size."""
    import glob
    import shutil
    import time

    from hadoop_prototype_spark.sources import refs
    from hadoop_prototype_spark.sources import snapshots as sn

    for parts in (16, 64, 256):
        src = f"/tmp/hps_scale_clone_src_{parts}"
        dst = f"/tmp/hps_scale_clone_dst_{parts}"
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(dst, ignore_errors=True)
        df = spark.range(parts * 20_000).selectExpr(
            "id AS k", "md5(CAST(id AS STRING)) AS v"
        ).repartitionByRange(parts, "k")
        sn.create_table(df, src, "k")
        data_bytes = sum(
            os.path.getsize(f) for f in glob.glob(os.path.join(src, "*.parquet"))
        )
        t0 = time.time()
        r = refs.clone_table(src, dst)
        wall = time.time() - t0
        # every clone file shares its inode with the source: bytes copied = 0
        import os as _os

        shared = all(
            _os.stat(_os.path.join(src, fe["name"])).st_ino
            == _os.stat(_os.path.join(dst, fe["name"])).st_ino
            for fe in sn._read_entry(dst, 1)["files"]
        )
        print(
            json.dumps(
                {
                    "op": "clone_zero_copy",
                    "table_files": parts,
                    "table_data_mb": round(data_bytes / 1e6, 1),
                    "clone_wall_s": round(wall, 4),
                    "data_bytes_copied": 0 if shared else data_bytes,
                    "files_linked": r["files_linked"],
                }
            ),
            flush=True,
        )
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(dst, ignore_errors=True)


def rag_probe_io_curve(spark) -> None:
    """Indexed RAG probe IO vs index size — the read_table_pruned_in
    claim: a bounded-bucket query against a bucket-clustered postings
    index opens only the files whose recorded range overlaps its bucket
    list, so probe IO tracks the QUERY (touched buckets), not the index.
    Prints one JSON line per index size (docs 4x per step, file count
    fixed by clustering width)."""
    import shutil

    from pyspark.sql import functions as F

    from hadoop_prototype_spark.operators import retrieval
    from hadoop_prototype_spark.sources import snapshots as sn

    for n_docs in (500, 2000, 8000):
        idx = f"/tmp/hps_scale_ragidx_{n_docs}"
        shutil.rmtree(idx, ignore_errors=True)
        docs = spark.range(n_docs).selectExpr(
            "id AS doc_id",
            "array_join(transform(sequence(1, 40), "
            "j -> concat('w', CAST((id * j * 7919) % 997 AS STRING))), ' ') "
            "AS text",
        )
        retrieval.build_rag_index(spark, docs, idx, n_files=16)
        entry = sn._read_entry(idx, 1)
        total_bytes = sum(
            os.path.getsize(os.path.join(idx, fe["name"]))
            for fe in entry["files"]
        )
        probe = sn.read_table_pruned_in(spark, idx, [0, 1])  # two buckets
        touched = (
            probe.select(F.input_file_name().alias("f")).distinct().collect()
        )
        touched_bytes = sum(
            os.path.getsize(r.f.replace("file://", "")) for r in touched
        )
        print(
            json.dumps(
                {
                    "op": "rag_probe_two_buckets",
                    "index_docs": n_docs,
                    "index_files": len(entry["files"]),
                    "index_mb": round(total_bytes / 1e6, 2),
                    "files_touched": len(touched),
                    "touched_mb": round(touched_bytes / 1e6, 2),
                }
            ),
            flush=True,
        )
        shutil.rmtree(idx, ignore_errors=True)


def rag_hot_bucket_curve(spark) -> None:
    """Probe-stage skew under a Zipfian token — the round-12 hardening:
    the index is bucket-CLUSTERED, so a token shared by every document
    puts its whole posting list in one scan partition, and because the
    scoring join is a broadcast (no exchange for AQE skew-split to act
    on) that one core would run the entire candidate fan-out.
    rag_query_indexed now rebalances the PROBED postings on (doc, chunk)
    first; this curve measures the max-partition row share of the
    scoring input with and without the spread, plus the probe wall."""
    import shutil
    import time as _time

    from pyspark.sql import functions as F

    from hadoop_prototype_spark.operators import retrieval as rag
    from hadoop_prototype_spark.sources import snapshots as sn

    for n_docs in (8000, 32000):
        idx = f"/tmp/hps_scale_raghot_{n_docs}"
        shutil.rmtree(idx, ignore_errors=True)
        # every doc is the SAME head token plus 3 tail words: the head's
        # bucket holds a posting for every chunk in the corpus (~25% of
        # all posting rows), concentrated by the bucket clustering into
        # ONE file — the Zipfian worst case for the scan-partition unit
        docs = spark.range(n_docs).selectExpr(
            "id AS doc_id",
            "concat('zipfhead ', array_join(transform(sequence(1, 3), "
            "j -> concat('w', CAST((id * j * 7919) % 997 AS STRING))), ' ')) "
            "AS text",
        )
        rag.build_rag_index(spark, docs, idx, n_files=16)
        qpost = rag._query_postings(
            docs, 4, rag.RAG_DIM, "doc_id", "text"
        ).localCheckpoint(eager=False)
        buckets = [r.bucket for r in qpost.select("bucket").distinct().collect()]
        cpost = sn.read_table_pruned_in(spark, idx, buckets)
        # EXPLICIT count: an unqualified repartition AQE-coalesces a
        # probe-sized exchange to one partition — strictly worse than
        # the skew it removes (first measurement of this curve)
        spread = cpost.repartition(
            spark.sparkContext.defaultParallelism,
            F.col("doc_id"), F.col("chunk_id"),
        )
        for variant, cp in (("clustered_scan", cpost), ("spread", spread)):
            sizes = [
                r["count"]
                for r in cp.withColumn("p", F.spark_partition_id())
                .groupBy("p").count().collect()
            ]
            t0 = _time.perf_counter()
            rag._score_topk(cp, qpost, 5, "doc_id").write.format("noop").mode(
                "overwrite"
            ).save()
            dt = _time.perf_counter() - t0
            print(
                json.dumps(
                    {
                        "op": "rag_hot_bucket_probe",
                        "variant": variant,
                        "index_docs": n_docs,
                        "scoring_input_parts": len(sizes),
                        "max_part_rows": max(sizes),
                        "total_rows": sum(sizes),
                        "max_part_share": round(max(sizes) / sum(sizes), 3),
                        "probe_sec": round(dt, 3),
                    }
                ),
                flush=True,
            )
        shutil.rmtree(idx, ignore_errors=True)


def partition_probe_io_curve(spark) -> None:
    """Single-day probe IO vs table age for a day-partitioned snapshot
    table (create_table(partition_by=['day_id']) + daily appends) — the
    round-12 partition-spec claim: every batch range-clusters on the
    spec and records per-file day ranges in the log, so a one-day probe
    (read_table_where) opens only that day's file(s) however many days
    have landed. Prints one JSON line per table age."""
    import shutil

    from pyspark.sql import functions as F

    from hadoop_prototype_spark.sources import snapshots as sn

    for n_days in (8, 32, 128):
        path = f"/tmp/hps_scale_partprobe_{n_days}"
        shutil.rmtree(path, ignore_errors=True)
        day0 = spark.range(2000).selectExpr(
            "id AS k", "CAST(0 AS BIGINT) AS day_id",
            "CAST(id % 9 AS BIGINT) AS metric",
        )
        sn.create_table(day0, path, "k", partition_by=["day_id"])
        for d in range(1, n_days):
            batch = spark.range(d * 10_000, d * 10_000 + 2000).selectExpr(
                "id AS k", f"CAST({d} AS BIGINT) AS day_id",
                "CAST(id % 9 AS BIGINT) AS metric",
            )
            sn.append_table(spark, path, batch, "k")
        entry = sn._read_entry(path, sn.current_version(path))
        total_bytes = sum(
            os.path.getsize(os.path.join(path, fe["name"]))
            for fe in entry["files"]
        )
        probe_day = n_days // 2
        probe = sn.read_table_where(spark, path, {"day_id": probe_day})
        touched = (
            probe.select(F.input_file_name().alias("f")).distinct().collect()
        )
        touched_bytes = sum(
            os.path.getsize(r.f.replace("file://", "")) for r in touched
        )
        print(
            json.dumps(
                {
                    "op": "partitioned_single_day_probe",
                    "days": n_days,
                    "table_files": len(entry["files"]),
                    "table_mb": round(total_bytes / 1e6, 2),
                    "probe_rows": probe.count(),
                    "files_touched": len(touched),
                    "touched_mb": round(touched_bytes / 1e6, 2),
                }
            ),
            flush=True,
        )
        shutil.rmtree(path, ignore_errors=True)


def partition_range_io_curve(spark) -> None:
    """3-day WINDOW probe IO vs table age (round-13: read_table_where's
    {col: (lo, hi)} range predicates) — the week-slice claim: files skip
    by manifest-range OVERLAP, so a fixed-width window opens O(window
    days' files) however many days have landed. Prints one JSON line per
    table age."""
    import shutil

    from pyspark.sql import functions as F

    from hadoop_prototype_spark.sources import snapshots as sn

    for n_days in (8, 32, 128):
        path = f"/tmp/hps_scale_partrange_{n_days}"
        shutil.rmtree(path, ignore_errors=True)
        day0 = spark.range(2000).selectExpr(
            "id AS k", "CAST(0 AS BIGINT) AS day_id",
            "CAST(id % 9 AS BIGINT) AS metric",
        )
        sn.create_table(day0, path, "k", partition_by=["day_id"])
        for d in range(1, n_days):
            batch = spark.range(d * 10_000, d * 10_000 + 2000).selectExpr(
                "id AS k", f"CAST({d} AS BIGINT) AS day_id",
                "CAST(id % 9 AS BIGINT) AS metric",
            )
            sn.append_table(spark, path, batch, "k")
        entry = sn._read_entry(path, sn.current_version(path))
        lo = n_days // 2
        probe = sn.read_table_where(spark, path, {"day_id": (lo, lo + 2)})
        touched = (
            probe.select(F.input_file_name().alias("f")).distinct().collect()
        )
        print(
            json.dumps(
                {
                    "op": "partitioned_3day_range_probe",
                    "days": n_days,
                    "table_files": len(entry["files"]),
                    "probe_rows": probe.count(),
                    "files_touched": len(touched),
                }
            ),
            flush=True,
        )
        shutil.rmtree(path, ignore_errors=True)


def partition_transform_io_curve(spark) -> None:
    """Single-day probe IO vs table age on a ``days(ts)`` TRANSFORM spec
    (round-14): the table partitions on a RAW timestamp column — no
    materialized day id anywhere — every write clusters on the
    transformed day and the log records the transformed per-file range,
    so a one-day probe opens O(that day's batches) files however many
    days have landed. Prints one JSON line per table age; flat
    files_touched across the 16× age growth is the claim."""
    import shutil

    from pyspark.sql import functions as F

    from hadoop_prototype_spark.sources import snapshots as sn

    base = 1_699_920_000  # midnight UTC: each 2000-row batch stays in-day

    def day_batch(d):
        return spark.range(d * 10_000, d * 10_000 + 2000).selectExpr(
            "id AS k",
            f"timestamp_seconds({base} + {d} * 86400 + (id % 2000) * 43) AS ts",
            "CAST(id % 9 AS BIGINT) AS metric",
        )

    for n_days in (8, 32, 128):
        path = f"/tmp/hps_scale_parttrans_{n_days}"
        shutil.rmtree(path, ignore_errors=True)
        sn.create_table(day_batch(0), path, "k", partition_by=["days(ts)"])
        for d in range(1, n_days):
            sn.append_table(spark, path, day_batch(d), "k")
        entry = sn._read_entry(path, sn.current_version(path))
        day = base // 86400 + n_days // 2
        probe = sn.read_table_where(spark, path, {"days(ts)": day})
        touched = (
            probe.select(F.input_file_name().alias("f")).distinct().collect()
        )
        print(
            json.dumps(
                {
                    "op": "transform_day_probe",
                    "days": n_days,
                    "table_files": len(entry["files"]),
                    "probe_rows": probe.count(),
                    "files_touched": len(touched),
                }
            ),
            flush=True,
        )
        shutil.rmtree(path, ignore_errors=True)


def concurrent_merge_curve(spark) -> None:
    """OCC retry amplification under writer contention (round-13: the
    concurrent_merge_4x bench lane's diagnostic twin): 4 clients each
    merge a DISJOINT key slice into one table, serially then
    concurrently. Every concurrent conflict is a pure commit-version
    race (no data overlap), so (makespan / serial_sum) and the counted
    retries ARE the OCC cost. Prints one JSON line per slice size."""
    import shutil
    import threading
    import time
    from concurrent.futures import ThreadPoolExecutor

    from pyspark.sql import functions as F

    from hadoop_prototype_spark.sources import snapshots as sn

    for rows in (2_000, 20_000):
        base = spark.range(rows).selectExpr(
            "id AS k", "CAST(id * 10 AS BIGINT) AS v"
        )

        def mk(tag: str) -> str:
            path = f"/tmp/hps_scale_cmerge_{rows}_{tag}"
            shutil.rmtree(path, ignore_errors=True)
            sn.create_table(base, path, "k")
            return path

        def upd(i: int):
            return base.filter(F.col("k") % 4 == i).withColumn(
                "v", F.col("v") + F.lit(float(i + 1))
            )

        # serial floor: the same 4 merges, no contention
        spath = mk("serial")
        t0 = time.perf_counter()
        for i in range(4):
            sn.merge_into(spark, spath, upd(i), "k")
        serial = time.perf_counter() - t0

        cpath = mk("conc")
        retries = [0]
        lock = threading.Lock()

        def client(i: int) -> None:
            while True:
                try:
                    sn.merge_into(spark, cpath, upd(i), "k")
                    return
                except sn.ConflictError:
                    with lock:
                        retries[0] += 1

        t0 = time.perf_counter()
        with ThreadPoolExecutor(max_workers=4) as pool:
            for f in [pool.submit(client, i) for i in range(4)]:
                f.result()
        makespan = time.perf_counter() - t0
        print(
            json.dumps(
                {
                    "op": "concurrent_disjoint_merge_4x",
                    "rows": rows,
                    "serial_sum_s": round(serial, 3),
                    "concurrent_makespan_s": round(makespan, 3),
                    "speedup_vs_serial": round(serial / makespan, 2),
                    "occ_retries": retries[0],
                    "final_version": sn.current_version(cpath),
                }
            ),
            flush=True,
        )
        for p in (spath, cpath):
            shutil.rmtree(p, ignore_errors=True)


def stream_tail_io_curve(spark) -> None:
    """Per-trigger cost of the snapshot-table streaming source vs table
    size — the snapshot_stream claim: a 1-file append into an F-file
    table plans O(cadence) log-entry reads and scans exactly the
    appended file, independent of F. Measured reader-direct (the same
    partitions()/read() calls a trigger makes), with sn._read_raw
    instrumented to count log IO. Prints one JSON line per table size."""
    import shutil
    import time

    from hadoop_prototype_spark.sources import snapshot_stream as ss
    from hadoop_prototype_spark.sources import snapshots as sn

    for parts in (32, 128, 512):
        path = f"/tmp/hps_scale_streamtail_{parts}"
        shutil.rmtree(path, ignore_errors=True)
        df = spark.range(parts * 100).selectExpr(
            "id AS k", "id * 2 AS v"
        ).repartitionByRange(parts, "k")
        sn.create_table(df, path, "k")
        base_v = sn.current_version(path)
        sn.append_table(
            spark, path,
            spark.range(10**9, 10**9 + 100)
            .selectExpr("id AS k", "id*2 AS v")
            .coalesce(1),
            "k",
        )
        reader = ss.SnapshotStreamReader(path, "{}", {})
        raw_reads = 0
        orig = sn._read_raw

        def counting(p, v):
            nonlocal raw_reads
            raw_reads += 1
            return orig(p, v)

        sn._read_raw = counting
        t0 = time.perf_counter()
        try:
            pts = reader.partitions(
                {"version": base_v}, {"version": base_v + 1}
            )
        finally:
            sn._read_raw = orig
        plan_s = time.perf_counter() - t0
        scanned = sum(
            os.path.getsize(os.path.join(path, p.file_name)) for p in pts
        )
        table_bytes = sum(
            os.path.getsize(os.path.join(path, f))
            for f in os.listdir(path)
            if f.endswith(".parquet")
        )
        rows = sum(
            b.num_rows
            for p in pts
            for b in ss._read_file_batches(
                ss.SnapshotFilePartition(
                    path, p.file_name,
                    json.dumps(
                        sn.read_table(spark, path).schema.jsonValue()
                    ),
                )
            )
        )
        print(
            json.dumps(
                {
                    "op": "stream_tail_1file_append_trigger",
                    "table_files": parts,
                    "partitions_planned": len(pts),
                    "log_entries_read": raw_reads,
                    "plan_seconds": round(plan_s, 4),
                    "bytes_scanned": scanned,
                    "table_bytes": table_bytes,
                    "rows_emitted": rows,
                }
            ),
            flush=True,
        )
        shutil.rmtree(path, ignore_errors=True)


def mor_delete_bytes_curve(spark) -> None:
    """Copy-on-write vs merge-on-read DELETE write bytes (the deletion-
    vector claim, snapshots.delete_from_mor): delete the SAME 8 scattered
    keys from identical tables both ways and measure the bytes each
    commit writes — CoW pays a rewrite of every affected file, MoR pays a
    keys-sized vector sidecar. The ratio is the write amplification DVs
    remove; it grows with file size, which is the 100 TB argument (a
    1 GB file : ~100 B of vector). Prints one JSON line per scale."""
    import glob as _glob
    import shutil

    from hadoop_prototype_spark.sources import snapshots as sn

    for rows_per_file in (10_000, 40_000, 160_000):
        n = rows_per_file * 8
        keys = [int(i * n / 8 + 3) for i in range(8)]  # one per file
        kdf = spark.createDataFrame([(k,) for k in keys], "k bigint")
        sizes = {}
        for mode in ("cow", "mor"):
            path = f"/tmp/hps_scale_mor_{rows_per_file}_{mode}"
            shutil.rmtree(path, ignore_errors=True)
            df = spark.range(n).selectExpr(
                "id AS k",
                "CAST(id * 2 AS BIGINT) AS v",
                "repeat(md5(CAST(id AS STRING)), 4) AS payload",
            ).repartitionByRange(8, "k")
            sn.create_table(df, path, "k")
            if mode == "cow":
                sn.delete_from(spark, path, kdf, "k")
                new_files = _glob.glob(os.path.join(path, "v2-*.parquet"))
            else:
                sn.delete_from_mor(spark, path, kdf, "k")
                new_files = _glob.glob(os.path.join(path, "_dvs", "*.parquet"))
            sizes[mode] = sum(os.path.getsize(f) for f in new_files)
            shutil.rmtree(path, ignore_errors=True)
        print(
            json.dumps(
                {
                    "op": "delete_8_scattered_keys",
                    "rows_per_file": rows_per_file,
                    "cow_bytes_written": sizes["cow"],
                    "mor_bytes_written": sizes["mor"],
                    "amplification_removed": round(sizes["cow"] / sizes["mor"], 1),
                }
            ),
            flush=True,
        )


def matview_refresh_curve(spark) -> None:
    """Materialized-view refresh cost vs source size: a 3-row upsert into
    sources of growing size, one refresh each. The claim (matview.py):
    refresh reads table_changes' changed slice + the touched groups —
    flat as the source grows — while the from-scratch recompute the view
    replaces scans everything. Prints one JSON line per scale."""
    import shutil
    import time as _time

    from pyspark.sql import functions as F

    from hadoop_prototype_spark.operators import incremental as inc
    from hadoop_prototype_spark.operators import matview as mvo
    from hadoop_prototype_spark.sources import snapshots as sn

    spec = {"total": ("sum", "v"), "n": ("count", "v")}
    for m in (1, 4, 16):
        n = 100_000 * m
        src = f"/tmp/hps_scale_mv_src_{n}"
        view = f"/tmp/hps_scale_mv_view_{n}"
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(view, ignore_errors=True)
        sn.create_table(
            spark.range(n).selectExpr("id AS k", "id % 1000 AS grp", "id AS v")
            .repartitionByRange(16, "k"),
            src, "k",
        )
        mvo.create_materialized_view(spark, src, view, ["grp"], spec)
        sn.merge_into(
            spark, src,
            spark.createDataFrame(
                [(7, 7, 10**6), (11, 11, 10**6), (n + 1, 13, 10**6)],
                "k bigint, grp bigint, v bigint",
            ),
            "k",
        )
        t0 = _time.perf_counter()
        mvo.refresh_materialized_view(spark, src, view, ["grp"], spec)
        refresh_s = _time.perf_counter() - t0
        t0 = _time.perf_counter()
        inc.summarize(sn.read_table(spark, src), ["grp"], spec).write.format(
            "noop"
        ).mode("overwrite").save()
        recompute_s = _time.perf_counter() - t0
        ok = (
            {r.grp: (r.total, r.n) for r in sn.read_table(spark, view).collect()}
            == {
                r.grp: (r.total, r.n)
                for r in inc.summarize(
                    sn.read_table(spark, src), ["grp"], spec
                ).collect()
            }
        )
        print(
            json.dumps(
                {
                    "op": "matview_refresh_3row_upsert",
                    "source_rows": n,
                    "refresh_sec": round(refresh_s, 3),
                    "full_recompute_sec": round(recompute_s, 3),
                    "equals_recompute": ok,
                }
            ),
            flush=True,
        )
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(view, ignore_errors=True)


def main() -> None:
    from hadoop_prototype_spark.operators import (
        corpusstats,
        dedup,
        invindex,
        sampling,
        textstats,
    )
    from hadoop_prototype_spark.session import get_spark

    spark = get_spark(
        app_name="hps-scale-curves",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    app_id = spark.sparkContext.applicationId
    ui_url = spark.sparkContext.uiWebUrl  # the BOUND url, whatever the port

    if "--pruned-index-io" in sys.argv:
        pruned_index_io_curve(spark)
        return
    if "--delta-log-bytes" in sys.argv:
        delta_log_bytes_curve(spark)
        return
    if "--matview-refresh" in sys.argv:
        matview_refresh_curve(spark)
        return
    if "--mor-delete-bytes" in sys.argv:
        mor_delete_bytes_curve(spark)
        return
    if "--stream-tail-io" in sys.argv:
        stream_tail_io_curve(spark)
        return
    if "--clone-bytes" in sys.argv:
        clone_bytes_curve(spark)
        return
    if "--rag-probe-io" in sys.argv:
        rag_probe_io_curve(spark)
        return
    if "--rag-hot-bucket" in sys.argv:
        rag_hot_bucket_curve(spark)
        return
    if "--partition-probe-io" in sys.argv:
        partition_probe_io_curve(spark)
        return
    if "--partition-range-io" in sys.argv:
        partition_range_io_curve(spark)
        return
    if "--partition-transform-io" in sys.argv:
        partition_transform_io_curve(spark)
        return
    if "--concurrent-merge" in sys.argv:
        concurrent_merge_curve(spark)
        return

    for m in SCALES:
        n = BASE_DOCS * m
        src = f"/tmp/hps_scale_docs_v2_{n}"
        if not os.path.exists(os.path.join(src, "_SUCCESS")):
            gen_docs(spark, n).write.mode("overwrite").parquet(src)
        docs = spark.read.parquet(src)
        # ingest-time steps, untimed: the persisted stats table the
        # registered queries read (corpus_stats_cache) and the persisted
        # LSH band-key index the incremental ingest dedups against
        stats = corpusstats.collect_corpus_stats(docs)
        idx_path = f"/tmp/hps_scale_lsh_index_{n}"
        if not os.path.exists(os.path.join(idx_path, "_SUCCESS")):
            dedup.lsh_index_keys(docs).write.mode("overwrite").parquet(idx_path)
        batch = gen_batch(spark, n)
        ops = {
            "dedup_minhash_lsh": lambda df: dedup.minhash_lsh_pairs(df),
            "bm25_topk": lambda df: invindex.bm25_topk(df, queries=BM25_SCALE_QUERIES),
            # the round-8 registered shape: corpus read EXACTLY once
            "bm25_topk_stats": lambda df: invindex.bm25_topk(
                df, queries=BM25_SCALE_QUERIES, stats=stats
            ),
            "quality_tiers": lambda df: textstats.quality_tiers(df),
            # the shared one-scan stats pass itself (the ingest-time cost)
            "corpus_stats": lambda df: corpusstats.corpus_stats_table(df),
            # fixed 5k-doc ingest batch vs the growing persisted index:
            # flat shuffle is the O(batch) claim (streaming/ingest.py)
            "incremental_lsh_batch5k": lambda df: dedup.incremental_lsh_dedup(
                batch, spark.read.parquet(idx_path)
            )[0],
            # token-budget selection: the exact window definition shuffles
            # the corpus; the registered scale path windows only each
            # source's boundary quality bin (≈ corpus/bins)
            "budget_select_exact": lambda df: sampling.budget_select_exact(df, 4000),
            "budget_select_stats": lambda df: sampling.budget_select(
                df, 4000, stats=stats
            ),
            # the END-TO-END recipe: decontaminate ∩ quality cutoff (stats
            # literal) ∩ exact-dedup keepers → budget select (survivor
            # stats pass + boundary plan) — the full training-set build
            "corpus_recipe_budget": lambda df: _recipe(df, stats),
        }
        for name, fn in ops.items():
            # best-of-2 (bench.py's steady-state protocol): run 1 measures
            # codegen JIT as much as the engine
            best, rows, sb = float("inf"), 0, 0
            for _ in range(2):
                sb0 = shuffle_write_bytes(ui_url, app_id)
                t0 = time.perf_counter()
                out = fn(docs)
                rows = out.count()
                wall = time.perf_counter() - t0
                if wall < best:
                    best = wall
                    sb = shuffle_write_bytes(ui_url, app_id) - sb0
            print(
                json.dumps(
                    {
                        "op": name,
                        "scale": m,
                        "docs": n,
                        "rows_out": rows,
                        "wall_sec": round(best, 2),
                        "shuffle_write_mb": round(sb / (1 << 20), 2),
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
