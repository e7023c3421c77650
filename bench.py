#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Output protocol (round-7 fix — BENCH_r06.json came back ``parsed: null``
because the single detailed JSON line outgrew the driver's stdout-tail
capture window):

1. the full per-query detail line is printed FIRST and also written to
   ``BENCH_DETAIL.json`` next to this script, so per-query history survives
   even when stdout is truncated;
2. a compact summary line — same schema, but ``queries`` limited to a small
   fixed flagship subset so the line stays well under any tail window — is
   printed LAST, immediately before exit.

Console progress bars are disabled for the bench session so carriage-return
spam cannot eat tail bytes.

Each query is materialized via a noop-sink write so the full plan executes.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

HEADLINE = [
    "q1_pricing_summary",
    "join_inner_revenue",
    "join_outer_customer_orders",
    "topk_customers",
    "ex_wordcount",
    "grep",
    "value_histogram",
    "secondary_sort",
    "aggregate_framework",
    "fieldsel",
    "join_override",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "ann_bruteforce",
    "ann_lsh",
    "embedding_near_dup",
    "sort_total_order",
    "set_except",
    "multi_input_union",
    "z_join_range_bands",
    "z_cube_status_priority",
    "pipe_wordcount",
    "pipe_grouped_wordcount",
    "pipe_combined_wordcount",
    "multimodal_features",
    "multimodal_frames",
    "grouped_reduce_order_gaps",
    "text_quality",
    "text_fingerprint",
    "events_tumbling",
    "events_sessions",
    "events_topk_users_per_window",
    "docs_clean_corpus",
    "z_window_moving_avg",
    "quartile_spend",
    "z_grouping_sets_orders",
    # round-5 training-data-pipeline additions
    "z_sample_stratified",
    "z_vocab_top50",
    "z_embedding_quantize",
    "z_events_interval_join",
    "decontaminate_report",
    "dedup_window_fraction",
    "z_sketch_hll_shingles",
    "z_sketch_quantiles",
    "z_text_tfidf_top_terms",
    "events_funnel",
    "z_events_asof_view",
    "text_quality_filter",
    "z_join_bloom_pruned",
    "docs_corpus_clean_full",
    # round-6 additions
    "z_tpch_q3",
    "z_tpch_q5",
    "z_tpch_q6",
    "z_tpch_q10",
    "z_tpch_q14",
    "z_tpch_q7",
    "z_tpch_q8",
    "z_tpch_q13",
    "z_tpch_q15",
    "z_tpch_q16",
    "z_tpch_q22",
    "z_tpch_q17",
    "z_tpch_q18",
    "z_tpch_q19",
    "z_dedup_boilerplate_spans",
    "z_sample_dsir_importance",
    "z_sample_dsir_selected",
    "z_text_chunks",
    "z_text_diversity",
    "z_decontaminate_by_source",
    "z_events_json_props",
    "z_text_quality_model",
    "z_text_tokenize_ids",
    "z_embedding_prototypes",
    "z_search_bm25",
    "z_text_quality_tiers",
    "z_sample_mixture_temperature",
    "z_events_winsorize",
    "z_sales_yoy_growth",
    # round-7 additions
    "z_corpus_stats",
    "z_tpch_gen_q2",
    "z_tpch_gen_q4",
    "z_tpch_gen_q9",
    "z_tpch_gen_q11",
    "z_tpch_gen_q12",
    "z_tpch_gen_q20",
    "z_tpch_gen_q21",
    # round-8 additions
    "z_dedup_lsh_incremental",
    "z_events_interval_join_outer",
    "z_embedding_pca",
    "z_training_order",
    "z_validate_orders",
    "z_profile_orders",
    "z_split_leakage_free",
    "z_text_strip_markup",
    # round-9 additions
    "z_budget_select",
    "z_corpus_recipe_budget",
    "z_profile_documents",
    "z_text_fim",
    "z_pack_padding_report",
    "z_embedding_cluster_sample",
    # round-10 additions
    "z_png_roundtrip_stats",
    "z_wav_roundtrip_stats",
    # round-11 additions
    "z_embedding_pca_power",
    "z_dedup_semantic",
    "z_graph_pagerank",
    "z_rag_retrieve",
    "z_rag_retrieve_indexed",
    # round-12 additions
    "z_snapshot_rename_evolution",
    "z_snapshot_merge_evolve",
    "z_snapshot_partition_probe",
    "z_snapshot_bloom_lookup",
    "z_snapshot_scd2",
    # round-13 additions
    "z_snapshot_sql_verbs",
    "z_snapshot_sql_sync",
    "z_snapshot_type_widen",
    "z_snapshot_partition_range",
    # round-14 additions
    "z_snapshot_sql_merge_cond",
    "z_snapshot_sql_merge_on",
    "z_snapshot_partition_transform",
]

TERASORT_ROWS = 2_000_000  # 100-byte records → ~200 MB proxy

# Small fixed subset echoed in the final compact line: the queries BASELINE.md
# tracks plus one representative per pipeline family. Keep this short — the
# whole point of the compact line is fitting the driver's stdout-tail window.
FLAGSHIP = [
    "q1_pricing_summary",
    "ex_wordcount",
    "grep",
    "dedup_minhash_lsh",
    "z_search_bm25",
    "docs_corpus_clean_full",
    "events_tumbling",
    "terasort_2m",
    "concurrent_4x",
    "concurrent_merge_4x",
    "streaming_tumbling",
    "mrbench_avg_small_job",
    "dfsio_write_880mb",
    "dfsio_read_880mb",
]


# the 4-client lane's query set: one relational aggregate, one shuffle-
# heavy dedup, one top-k retrieval, one indexed point-serving probe —
# the mix that exposes driver-side serialization (IN-list collects,
# iterative checkpoints) which single-query lanes never see
CONCURRENT_QUERIES = [
    "q1_pricing_summary",
    "dedup_minhash_lsh",
    "z_search_bm25",
    "z_rag_retrieve_indexed",
]


def bench_concurrent(spark, sf_dir: str) -> float:
    """Median-of-3 MAKESPAN of 4 clients running simultaneously (one
    thread per query, same session — Spark's scheduler interleaves their
    jobs). A serving engine that looks fine one-query-at-a-time can
    serialize on the driver under concurrency; this lane measures it."""
    from concurrent.futures import ThreadPoolExecutor

    from hadoop_prototype_spark.plans.registry import REGISTRY

    qs = [REGISTRY.get(n) for n in CONCURRENT_QUERIES]
    qs = [q for q in qs if q is not None]

    def run_one(q):
        q.spark_fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        with ThreadPoolExecutor(max_workers=len(qs)) as pool:
            for f in [pool.submit(run_one, q) for q in qs]:
                f.result()
        runs.append(time.perf_counter() - t0)
    runs.sort()
    return runs[1]


def _probe_once(spark) -> float:
    """One run of the fixed calibration pipeline (see bench_calibration)."""
    from pyspark.sql import functions as F

    t0 = time.perf_counter()
    (
        spark.range(50_000_000)
        .select((F.col("id") % 1024).alias("k"), "id")
        .groupBy("k")
        .agg(F.sum("id").alias("s"))
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    return time.perf_counter() - t0


def bench_calibration(spark) -> float:
    """Fixed-cost machine probe (round-12 verdict #1): median-of-5 of a
    constant pipeline — a 50M-row range scan + modular projection into a
    small 1024-key shuffle + sum — run at bench START and END. The probe's
    cost is code-independent (it touches none of the engine's modules), so
    the ratio of this round's probe to last round's separates environment
    drift from real regressions: r12 burned a full re-measurement session
    adjudicating a phantom +38% that was ±1.4x machine drift."""
    runs = sorted(_probe_once(spark) for _ in range(5))
    return round(runs[2], 3)


def bench_calibration_io(spark) -> float:
    """IO-state twin of bench_calibration (added after round 13's two
    back-to-back runs showed the CPU+shuffle probe agreeing within 5%
    while query medians moved ~1.2x on page-cache state): median-of-3 of
    a fixed ~80 MB parquet write + full scan-read in a fresh temp dir,
    so disk/page-cache drift gets its own recorded signal. Kept SEPARATE
    from the compute probe (new fields, not a redefinition) so r13's
    recorded calibration stays comparable."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    df = spark.range(2_500_000).select(
        "id", F.md5(F.col("id").cast("string")).alias("payload")
    )
    runs = []
    for _ in range(3):
        out = tempfile.mkdtemp(prefix="hps_calio_")
        t0 = time.perf_counter()
        df.write.mode("overwrite").parquet(out)
        spark.read.parquet(out).agg(F.sum(F.length("payload"))).collect()
        runs.append(time.perf_counter() - t0)
        shutil.rmtree(out, ignore_errors=True)
    runs.sort()
    return round(runs[1], 3)


def _windowed_ratios(
    timings: dict[str, float],
    probes: list[tuple[float, float]],
    prev_cal: float,
    prev_q: dict[str, float],
) -> list[tuple[float, str]]:
    """Per-window normalized ratios vs the prior round (round-14 verdict
    #3): each query divides by the ratio of the probe state AT ITS RUN
    POSITION (linear interpolation over the (position, sec) ``probes``
    sequence) to the prior round's average probe — so one mid-run
    contention episode inflates only its own window instead of leaving a
    block of spurious regressions (r14's driver run) or overcorrecting
    every query through the run-level average. Returns sorted
    (ratio, query) pairs over the shared query set."""

    def probe_at(pos: float) -> float:
        for (x0, y0), (x1, y1) in zip(probes, probes[1:]):
            if x0 <= pos <= x1:
                if x1 == x0:
                    return y0
                return y0 + (y1 - y0) * (pos - x0) / (x1 - x0)
        return probes[-1][1]

    order = {name: float(i + 1) for i, name in enumerate(timings)}
    return sorted(
        ((timings[k] / (probe_at(order[k]) / prev_cal)) / prev_q[k], k)
        for k in timings
        if prev_q.get(k)
    )


def _this_round() -> int:
    """The round this run feeds (max driver BENCH_r*.json + 1)."""
    import glob as _glob
    import re as _re

    rounds = [
        int(m.group(1))
        for p in _glob.glob(os.path.join(REPO_ROOT, "BENCH_r*.json"))
        if (m := _re.search(r"BENCH_r(\d+)\.json$", p))
    ]
    return (max(rounds) + 1) if rounds else 1


def _prev_detail() -> tuple[dict | None, int | None]:
    """The newest PRIOR-round BENCH_DETAIL_r*.json that carries
    calibration fields (full dict + round number), or (None, None) — the
    drift baseline and the per-query comparison base for the regression
    summary. Snapshots of the CURRENT round are excluded: an earlier
    bench invocation this round (possibly on a contaminated host) must
    never become its own baseline."""
    import glob as _glob
    import re as _re

    cur = _this_round()
    best: tuple[int, dict] | None = None
    for p in _glob.glob(os.path.join(REPO_ROOT, "BENCH_DETAIL_r*.json")):
        m = _re.search(r"BENCH_DETAIL_r(\d+)\.json$", p)
        if not m:
            continue
        r = int(m.group(1))
        if r >= cur:
            continue
        try:
            with open(p) as f:
                d = json.load(f)
        except (OSError, ValueError):
            continue
        if d.get("calibration_start") is None or d.get("calibration_end") is None:
            continue
        if best is None or r > best[0]:
            best = (r, d)
    return (best[1], best[0]) if best else (None, None)


def _prev_calibration() -> tuple[float | None, int | None]:
    """(calibration, round) of the drift baseline — see _prev_detail."""
    d, r = _prev_detail()
    if d is None:
        return None, None
    return (float(d["calibration_start"]) + float(d["calibration_end"])) / 2.0, r


def bench_concurrent_merge(spark, sf_dir: str) -> float:
    """Concurrent-WRITER throughput lane (round-12 verdict #7): median-of-3
    makespan of 4 threads each running a disjoint-key merge_into_retrying
    against ONE snapshot table. The reads lane (concurrent_4x) never
    exercises the optimistic-commit path; this measures OCC retry cost
    under contention — with disjoint keys every conflict is a pure
    version race (no real data conflict), so the makespan over the serial
    sum is exactly the retry amplification. Total retries are observable
    as (final_version - 1 - 4*rounds) == 0 when every attempt lands
    first try; the makespan carries the cost either way."""
    import shutil
    import tempfile
    from concurrent.futures import ThreadPoolExecutor

    from pyspark.sql import functions as F

    from hadoop_prototype_spark.sources import snapshots as sn
    from hadoop_prototype_spark.sources.tables import load_table

    base = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 11 == 3)
        .select(
            F.col("o_orderkey").alias("k"),
            F.col("o_totalprice").alias("price"),
        )
    )

    def one_run() -> float:
        root = tempfile.mkdtemp(prefix="hps_cmerge_")
        path = os.path.join(root, "tbl")
        sn.create_table(base, path, "k")

        def client(i: int) -> None:
            # each client updates its own k % 4 == i slice — disjoint keys,
            # so every ConflictError is a pure commit-version race
            upd = base.filter(F.col("k") % 4 == i).withColumn(
                "price", F.col("price") + F.lit(float(i + 1))
            )
            sn.merge_into_retrying(spark, path, upd, "k", max_retries=20)

        t0 = time.perf_counter()
        with ThreadPoolExecutor(max_workers=4) as pool:
            for f in [pool.submit(client, i) for i in range(4)]:
                f.result()
        dt = time.perf_counter() - t0
        shutil.rmtree(root, ignore_errors=True)
        return dt

    runs = sorted(one_run() for _ in range(3))
    return runs[1]


def bench_terasort(spark) -> float:
    """TeraGen → total-order sort → noop sink (EX/terasort semantics).

    Best-of-2, matching the query loop's steady-state protocol: single runs
    swung 1.44→2.49 s across rounds with zero code change (codegen JIT +
    shuffle-dir state), which made noise indistinguishable from regression.
    """
    from hadoop_prototype_spark.sources.generators import teragen

    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        # NOTE (r16): r15 localCheckpointed the generated records here so
        # the range partitioner's sampling pass would not re-run the
        # generator; the r15 driver run (0.85 -> 1.17 s) and the repo's own
        # committed snapshot (0.856 -> 1.108) both showed materializing
        # ~200 MB costs more than recomputing the cheap deterministic
        # spark.range generator twice — REVERTED per the r15 verdict
        # (item 1), restoring the r14 lane byte-for-byte.
        gen = teragen(spark, TERASORT_ROWS, num_partitions=32)
        gen.orderBy("key").write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return best


def bench_mrbench(spark, iterations: int = 5) -> float:
    """MRBench analogue (MRBench.java:41): average wall time of a tiny
    generate→group→count job over N iterations — measures the engine's
    fixed per-job overhead (scheduling + planning), not data throughput."""
    from pyspark.sql import functions as F

    total = 0.0
    for i in range(iterations):
        t0 = time.perf_counter()
        (
            spark.range(10_000)
            .select((F.col("id") % 100).alias("k"))
            .groupBy("k")
            .count()
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        total += time.perf_counter() - t0
    return total / iterations


def bench_dfsio(spark) -> tuple[float, float]:
    """TestDFSIO analogue (TestDFSIO.java:88): bulk write then scan-read of
    25M rows (~880 MB parquet on disk — incompressible md5 payloads) through
    the parquet path; returns (write_sec, read_sec). The read action is
    sum(length(payload)) so every payload byte is materialized but the
    aggregate itself is trivial — measuring IO, not compute."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    out = tempfile.mkdtemp(prefix="hps_dfsio_")
    df = spark.range(25_000_000).select(
        "id", F.md5(F.col("id").cast("string")).alias("payload")
    )
    # best-of-3: single runs are dominated by page-cache / disk state noise
    # (r2 measured a 2.6x swing with zero code change, and best-of-2 still
    # swung 2x when both iterations landed in one slow-disk window)
    write_s = read_s = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        df.write.mode("overwrite").parquet(out)
        write_s = min(write_s, time.perf_counter() - t0)
        t0 = time.perf_counter()
        spark.read.parquet(out).agg(F.sum(F.length("payload"))).collect()
        read_s = min(read_s, time.perf_counter() - t0)
    shutil.rmtree(out, ignore_errors=True)
    return write_s, read_s


def bench_streaming(spark, sf_dir: str) -> float:
    """availableNow micro-batch run of the tumbling-window aggregation over
    the events table through the streaming engine (state store + watermark),
    to a noop sink."""
    import tempfile

    from hadoop_prototype_spark.sources.tables import load_table
    from hadoop_prototype_spark.streaming.windows import tumbling_window_agg, with_watermark

    events = load_table(spark, sf_dir, "events")
    src = tempfile.mkdtemp(prefix="hps_bench_events_")
    events.write.mode("overwrite").parquet(src)

    t0 = time.perf_counter()
    stream = spark.readStream.schema(events.schema).parquet(src)
    windowed = tumbling_window_agg(with_watermark(stream, "2 hours"), "1 hour")
    q = (
        windowed.writeStream.format("noop")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return time.perf_counter() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from hadoop_prototype_spark.plans.registry import REGISTRY
    import hadoop_prototype_spark.plans  # noqa: F401
    from hadoop_prototype_spark.session import get_spark

    spark = get_spark(
        app_name="hps-bench",
        # progress bars write \r-spam to stdout which previously truncated the
        # JSON summary out of the driver's tail capture (BENCH_r06 parsed:null)
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    # warm the JVM + parquet footers once so timings measure the queries
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

    # machine-drift probes: same fixed pipelines at start AND end, compared
    # against the previous round's recorded values (see bench_calibration /
    # bench_calibration_io)
    cal_start = bench_calibration(spark)
    cal_io_start = bench_calibration_io(spark)

    # median-of-3 per query (round-9 verdict #6): single steady-state runs
    # still swung up to 2.9x within one round (dfsio 0.517 vs 1.482 s, same
    # code), forcing noise adjudication on every regression table. The
    # median absorbs one bad window; the min is kept alongside as the
    # "capability" number. Run 1 is still mostly whole-stage-codegen JIT,
    # which the median naturally discounts.
    # INTERLEAVED calibration probes (round-14 verdict #3): one single-run
    # probe of the same fixed pipeline every _PROBE_EVERY queries, recorded
    # as (queries-completed, sec). Start/end probes alone cannot localize a
    # mid-run contention episode (r14's driver run: 16 spurious "regressions"
    # in one contiguous window, adjudicable only by run-order clustering);
    # the timeline makes that a table lookup. Probes are NOT added to
    # ``value`` and per-query timing methodology is unchanged.
    _PROBE_EVERY = 10
    cal_timeline: list[list[float]] = []
    timings: dict[str, float] = {}
    timings_min: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        q = REGISTRY.get(name)
        if q is None:
            continue
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            df = q.spark_fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        runs.sort()
        timings[name] = round(runs[1], 3)
        timings_min[name] = round(runs[0], 3)
        total += runs[1]
        if len(timings) % _PROBE_EVERY == 0:
            cal_timeline.append([len(timings), round(_probe_once(spark), 3)])

    # the special benches keep their documented best-of protocols; their
    # one number fills both maps
    dt = bench_terasort(spark)
    timings["terasort_2m"] = timings_min["terasort_2m"] = round(dt, 3)
    total += dt

    dt = bench_concurrent(spark, sf_dir)
    timings["concurrent_4x"] = timings_min["concurrent_4x"] = round(dt, 3)
    total += dt

    dt = bench_streaming(spark, sf_dir)
    timings["streaming_tumbling"] = timings_min["streaming_tumbling"] = round(dt, 3)
    total += dt

    dt = bench_mrbench(spark)
    timings["mrbench_avg_small_job"] = timings_min["mrbench_avg_small_job"] = round(dt, 3)
    total += dt

    dt = bench_concurrent_merge(spark, sf_dir)
    timings["concurrent_merge_4x"] = timings_min["concurrent_merge_4x"] = round(dt, 3)
    total += dt

    w, r = bench_dfsio(spark)
    timings["dfsio_write_880mb"] = timings_min["dfsio_write_880mb"] = round(w, 3)
    timings["dfsio_read_880mb"] = timings_min["dfsio_read_880mb"] = round(r, 3)
    total += w + r

    cal_end = bench_calibration(spark)
    cal_io_end = bench_calibration_io(spark)

    detail = {
        "metric": "headline_query_wall_time",
        "value": round(total, 3),
        "unit": "sec",
        "protocol": "median_of_3",  # queries == per-query medians (min kept in queries_min)
        "queries": timings,
        "queries_min": timings_min,
        "calibration_start": cal_start,
        "calibration_end": cal_end,
        "calibration_io_start": cal_io_start,
        "calibration_io_end": cal_io_end,
        # (queries-completed, sec) single-run probes every _PROBE_EVERY
        # queries — the per-window machine-state record. run_order is the
        # position of every query in this run (the special lanes run after
        # the headline loop), so timeline positions map onto queries.
        "calibration_timeline": cal_timeline,
        "run_order": list(timings),
        "sf": sf,
    }
    # drift-normalized medians: divide every raw median by this round's
    # calibration ratio vs the newest prior round that recorded one, so a
    # regression table is one subtraction instead of a re-measurement
    # session (calibration fields first appear in round 13; earlier rounds
    # normalize against nothing and omit the map)
    prev, prev_round = _prev_detail()
    prev_cal = (
        (float(prev["calibration_start"]) + float(prev["calibration_end"])) / 2.0
        if prev
        else None
    )
    if prev_cal:
        ratio = ((cal_start + cal_end) / 2.0) / prev_cal
        detail["calibration_ratio_vs_prev"] = round(ratio, 4)
        detail["calibration_prev_round"] = prev_round
        detail["normalized"] = {
            k: round(v / ratio, 3) for k, v in timings.items()
        }
        # the committed regression table (round-13 verdict #6): the
        # normalized-vs-previous-round median and the worst/best queries,
        # so the next verdict quotes one recorded number instead of
        # recomputing from two detail files
        prev_q = prev.get("queries") or {}
        shared = sorted(
            (detail["normalized"][k] / prev_q[k], k)
            for k in detail["normalized"]
            if prev_q.get(k)
        )
        if shared and prev.get("sf") == sf:
            med = shared[len(shared) // 2][0]
            detail["regression_summary"] = {
                "vs_round": prev_round,
                "shared_queries": len(shared),
                "median_normalized_ratio": round(med, 4),
                "worst": {k: round(r, 3) for r, k in shared[-5:][::-1]},
                "best": {k: round(r, 3) for r, k in shared[:3]},
                "regressed_over_1_25x": {
                    k: round(r, 3) for r, k in shared if r > 1.25
                },
            }
            # Per-WINDOW normalization (round-14 verdict #3, additive — the
            # fields above keep their exact prior semantics): each query is
            # divided by the ratio of the probe state AT ITS RUN POSITION
            # (linear interpolation over start/timeline/end probes) to the
            # prior round's average probe, so one mid-run contention
            # episode inflates only its own window instead of leaving 16
            # spurious regressions (r14's driver run) or overcorrecting
            # every query through the run-level average.
            try:
                probes = (
                    [(0.0, float(cal_start))]
                    + [(float(p), float(s)) for p, s in cal_timeline]
                    + [(float(len(timings)), float(cal_end))]
                )
                shared_w = _windowed_ratios(timings, probes, prev_cal, prev_q)
                if shared_w:
                    med_w = shared_w[len(shared_w) // 2][0]
                    detail["regression_summary"]["windowed"] = {
                        "median_normalized_ratio": round(med_w, 4),
                        "worst": {k: round(r, 3) for r, k in shared_w[-5:][::-1]},
                        "regressed_over_1_25x": {
                            k: round(r, 3) for r, k in shared_w if r > 1.25
                        },
                    }
            except Exception:
                # the windowed table is adjudication sugar — never let it
                # take down the bench's contract output
                pass
    # Full detail: printed first AND persisted to a file, so per-query history
    # survives stdout-tail truncation. Also snapshotted per round (BENCH_
    # DETAIL_r{N}.json, N inferred from the driver's BENCH_r*.json artifacts:
    # this run feeds the NEXT round file) so future rounds can diff all
    # queries instead of the compact line's flagship subset.
    print(json.dumps(detail))
    try:
        # snapshot only the default-sf runs (the driver's configuration):
        # an sf-overridden local iteration run would otherwise mislabel
        # its numbers as the next round's
        snap = (
            os.path.join(REPO_ROOT, f"BENCH_DETAIL_r{_this_round():02d}.json")
            if "SPARK_GRAFT_SF_DIR" not in os.environ
            else None
        )
        for path in filter(None, (os.path.join(REPO_ROOT, "BENCH_DETAIL.json"), snap)):
            with open(path, "w") as f:
                json.dump(detail, f, indent=1, sort_keys=True)
                f.write("\n")
    except OSError:
        pass  # read-only checkout: stdout detail line still carries the data

    # Compact, guaranteed-parseable summary LAST (the driver captures the
    # stdout tail; this line is < 500 bytes regardless of registry growth).
    compact_queries = {k: timings[k] for k in FLAGSHIP if k in timings}
    sys.stdout.flush()
    print(
        json.dumps(
            {
                "metric": "headline_query_wall_time",
                "value": round(total, 3),
                "unit": "sec",
                "protocol": "median_of_3",
                "queries": compact_queries,
                "n_queries": len(timings),
                "calibration_start": cal_start,
                "calibration_end": cal_end,
                "calibration_io_start": cal_io_start,
                "calibration_io_end": cal_io_end,
                "detail": "BENCH_DETAIL.json",
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
