"""Job-trace building and replay — the Rumen + GridMix tool family.

The reference pairs Rumen (hadoop-tools/hadoop-rumen/.../TraceBuilder.java:51),
which digests MR job-history files into JSON job traces, with GridMix
(hadoop-tools/hadoop-gridmix/.../Gridmix.java:58), which replays a trace
as synthetic cluster load whose jobs match the traced shapes (task counts,
I/O volumes) under a submission policy (SERIAL / REPLAY / STRESS).

Spark-first translation:

- The "job history" is Spark's EVENT LOG — one JSON object per line with
  the public ``SparkListenerEvent`` schema (``spark.eventLog.enabled``).
  ``build_trace`` digests it into a per-job trace table. The parse itself
  is a DataFrame job (``spark.read.text`` + ``from_json`` with explicit
  schemas per event type): a cluster-year of event logs is terabytes, so
  the trace build must be distributed — exactly why Rumen ran as an MR
  job over history files.
- ``replay_trace`` is the GridMix half: one synthetic job per trace row,
  partitioned to the traced task count, sized to the traced input bytes,
  with a shuffle stage iff the traced job shuffled. SERIAL submits
  back-to-back (GridMix's SERIAL policy); REPLAY honors the traced
  inter-arrival gaps scaled by ``time_scale`` (0 collapses the gaps —
  useful for regression-benchmarking a scheduler change without waiting
  out a day-long trace).

The trace table is metadata-sized (one row per job) — collecting it on
the driver for replay mirrors GridMix's JobStory stream, not a data-plane
collect.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TRACE_COLUMNS = (
    "app",
    "job_id",
    "submit_ms",
    "duration_ms",
    "n_stages",
    "n_tasks",
    "input_bytes",
    "shuffle_read_bytes",
    "shuffle_write_bytes",
    "executor_run_ms",
    "executor_cpu_ns",
)

_JOB_START_SCHEMA = (
    "`Job ID` bigint, `Submission Time` bigint, `Stage IDs` array<bigint>"
)
_JOB_END_SCHEMA = "`Job ID` bigint, `Completion Time` bigint"
_TASK_END_SCHEMA = """
    `Stage ID` bigint,
    `Task Metrics` struct<
        `Executor Run Time`: bigint,
        `Executor CPU Time`: bigint,
        `Input Metrics`: struct<`Bytes Read`: bigint>,
        `Shuffle Read Metrics`: struct<
            `Remote Bytes Read`: bigint, `Local Bytes Read`: bigint>,
        `Shuffle Write Metrics`: struct<`Shuffle Bytes Written`: bigint>
    >
"""


def build_trace(spark: SparkSession, eventlog_path: str) -> DataFrame:
    """Digest a Spark event log (file, directory, or glob of JSON-lines
    files) into one trace row per job:

    (app, job_id, submit_ms, duration_ms, n_stages, n_tasks, input_bytes,
     shuffle_read_bytes, shuffle_write_bytes, executor_run_ms,
     executor_cpu_ns)

    ``app`` is the FULL source log path (``input_file_name()``): job and
    stage IDs restart at 0 in EVERY Spark application, so a directory of
    logs joined on bare IDs would bleed one app's stage metrics into
    another's jobs — every join below is therefore keyed on (app, id),
    and the output carries the discriminator. The full path (not the
    basename) is the key because a directory/glob input can legally hold
    two logs with the same basename in different subdirectories.

    Shape: one pass over the log lines; each event type is parsed with an
    explicit ``from_json`` schema (codegen, no Python); task metrics
    aggregate per (app, stage) with map-side combining, then map onto
    jobs via the JobStart stage list (metadata-sized explode) — log
    volume flows through exactly one aggregation, never a driver loop."""
    lines = spark.read.text(eventlog_path).select(
        F.input_file_name().alias("app"),
        F.get_json_object("value", "$.Event").alias("event"),
        "value",
    )

    starts = lines.filter(F.col("event") == "SparkListenerJobStart").select(
        "app", F.from_json("value", _JOB_START_SCHEMA).alias("j")
    )
    job_stages = starts.select(
        "app",
        F.col("j.`Job ID`").alias("job_id"),
        F.col("j.`Submission Time`").alias("submit_ms"),
        F.explode_outer("j.`Stage IDs`").alias("stage_id"),
    )
    ends = (
        lines.filter(F.col("event") == "SparkListenerJobEnd")
        .select("app", F.from_json("value", _JOB_END_SCHEMA).alias("j"))
        .select(
            "app",
            F.col("j.`Job ID`").alias("job_id"),
            F.col("j.`Completion Time`").alias("complete_ms"),
        )
    )
    tasks = (
        lines.filter(F.col("event") == "SparkListenerTaskEnd")
        .select("app", F.from_json("value", _TASK_END_SCHEMA).alias("t"))
        .select(
            "app",
            F.col("t.`Stage ID`").alias("stage_id"),
            F.coalesce(F.col("t.`Task Metrics`.`Executor Run Time`"), F.lit(0)).alias("run_ms"),
            F.coalesce(F.col("t.`Task Metrics`.`Executor CPU Time`"), F.lit(0)).alias("cpu_ns"),
            F.coalesce(
                F.col("t.`Task Metrics`.`Input Metrics`.`Bytes Read`"), F.lit(0)
            ).alias("in_bytes"),
            (
                F.coalesce(
                    F.col("t.`Task Metrics`.`Shuffle Read Metrics`.`Remote Bytes Read`"),
                    F.lit(0),
                )
                + F.coalesce(
                    F.col("t.`Task Metrics`.`Shuffle Read Metrics`.`Local Bytes Read`"),
                    F.lit(0),
                )
            ).alias("sr_bytes"),
            F.coalesce(
                F.col("t.`Task Metrics`.`Shuffle Write Metrics`.`Shuffle Bytes Written`"),
                F.lit(0),
            ).alias("sw_bytes"),
        )
    )
    per_stage = tasks.groupBy("app", "stage_id").agg(
        F.count(F.lit(1)).alias("n_tasks"),
        F.sum("run_ms").alias("run_ms"),
        F.sum("cpu_ns").alias("cpu_ns"),
        F.sum("in_bytes").alias("in_bytes"),
        F.sum("sr_bytes").alias("sr_bytes"),
        F.sum("sw_bytes").alias("sw_bytes"),
    )
    per_job = (
        job_stages.join(per_stage, ["app", "stage_id"], "left")
        .groupBy("app", "job_id", "submit_ms")
        .agg(
            F.count(F.when(F.col("stage_id").isNotNull(), 1)).alias("n_stages"),
            F.coalesce(F.sum("n_tasks"), F.lit(0)).cast("long").alias("n_tasks"),
            F.coalesce(F.sum("in_bytes"), F.lit(0)).cast("long").alias("input_bytes"),
            F.coalesce(F.sum("sr_bytes"), F.lit(0)).cast("long").alias("shuffle_read_bytes"),
            F.coalesce(F.sum("sw_bytes"), F.lit(0)).cast("long").alias("shuffle_write_bytes"),
            F.coalesce(F.sum("run_ms"), F.lit(0)).cast("long").alias("executor_run_ms"),
            F.coalesce(F.sum("cpu_ns"), F.lit(0)).cast("long").alias("executor_cpu_ns"),
        )
    )
    return (
        per_job.join(ends, ["app", "job_id"], "left")
        .select(
            "app",
            "job_id",
            "submit_ms",
            (F.col("complete_ms") - F.col("submit_ms")).alias("duration_ms"),
            "n_stages",
            "n_tasks",
            "input_bytes",
            "shuffle_read_bytes",
            "shuffle_write_bytes",
            "executor_run_ms",
            "executor_cpu_ns",
        )
        .orderBy("app", "job_id")
    )


def _run_story(
    spark: SparkSession, r, bytes_per_row: int, max_rows_per_job: int
) -> dict:
    """One synthetic LoadJob: traced partition count, rows ∝ input bytes,
    a shuffle stage iff the traced job shuffled."""
    n_tasks = max(1, int(r["n_tasks"] or 1))
    rows = max(1, min(max_rows_per_job, int(r["input_bytes"] or 0) // bytes_per_row))
    shuffled = bool((r["shuffle_write_bytes"] or 0) > 0)
    t0 = time.perf_counter()
    base = spark.range(0, rows, 1, n_tasks).selectExpr(
        "id", "md5(CAST(id AS STRING)) AS payload"
    )
    # what actually ran, measured on the pre-shuffle frame (the map stage
    # whose width the trace dictates); a shuffled job's REDUCE width is
    # governed by shuffle.partitions/AQE, deliberately not by the trace
    ran_tasks = base.rdd.getNumPartitions()
    synth = base
    if shuffled:
        synth = base.groupBy((F.col("id") % n_tasks).alias("k")).agg(
            F.count(F.lit(1)).alias("cnt"), F.max("payload").alias("probe")
        )
    synth.write.format("noop").mode("overwrite").save()
    return {
        "app": r["app"],
        "job_id": r["job_id"],
        "target_tasks": n_tasks,
        "ran_tasks": ran_tasks,
        "target_input_bytes": int(r["input_bytes"] or 0),
        "synth_rows": rows,
        "shuffled": shuffled,
        "wall_ms": int((time.perf_counter() - t0) * 1000),
    }


def replay_trace(
    spark: SparkSession,
    trace: DataFrame,
    policy: str = "serial",
    time_scale: float = 0.0,
    bytes_per_row: int = 100,
    max_rows_per_job: int = 50_000_000,
    concurrency: int = 4,
) -> list[dict]:
    """Replay a trace as synthetic load (the GridMix LoadJob analogue):
    per trace row, submit one job with the traced partition count over
    ``input_bytes / bytes_per_row`` rows (capped); the synthetic work is
    a hash projection, plus a task-count-keyed aggregate iff the traced
    job shuffled. Submission policies (GridMix's three):

    - ``serial``: one job at a time, back-to-back;
    - ``replay``: honor the traced inter-arrival gaps × ``time_scale``
      (0 collapses them);
    - ``stress``: keep ``concurrency`` jobs in flight at once — Spark's
      scheduler is thread-safe, so concurrent actions from a bounded
      thread pool are the local analogue of GridMix's keep-the-cluster-
      loaded submission loop.

    Returns one report dict per job (sorted by job_id): the traced
    targets next to what actually ran — the comparison GridMix prints at
    the end of a run."""
    if policy not in ("serial", "replay", "stress"):
        raise ValueError(f"unknown submission policy {policy!r}")
    stories = sorted(
        trace.collect(), key=lambda r: (r["submit_ms"] or 0, r["app"], r["job_id"])
    )
    if policy == "stress":
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=max(1, concurrency)) as pool:
            report = list(
                pool.map(
                    lambda r: _run_story(spark, r, bytes_per_row, max_rows_per_job),
                    stories,
                )
            )
        return sorted(report, key=lambda d: (d["app"], d["job_id"]))

    report: list[dict] = []
    prev_submit = None
    for r in stories:
        if (
            policy == "replay"
            and time_scale > 0
            and prev_submit is not None
            and r["submit_ms"] is not None
        ):
            gap_s = max(0.0, (r["submit_ms"] - prev_submit) / 1000.0 * time_scale)
            time.sleep(gap_s)
        prev_submit = r["submit_ms"] if r["submit_ms"] is not None else prev_submit
        report.append(_run_story(spark, r, bytes_per_row, max_rows_per_job))
    return report
