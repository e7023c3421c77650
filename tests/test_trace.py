"""Rumen/GridMix analogue: trace building from Spark event logs (synthetic
fixture with the public listener schema AND a genuine log produced by a
real eventLog-enabled session) and synthetic replay with shape parity."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

from hadoop_prototype_spark.sources.trace import build_trace, replay_trace


def _event_lines() -> list[str]:
    """A minimal but schema-faithful event log: job 0 = 2 stages, 3 tasks,
    known bytes incl. a shuffle; job 1 = 1 stage, 1 task, input only."""

    def task_end(stage, run_ms, cpu_ns, in_b=0, sr_remote=0, sr_local=0, sw=0):
        return {
            "Event": "SparkListenerTaskEnd",
            "Stage ID": stage,
            "Task Metrics": {
                "Executor Run Time": run_ms,
                "Executor CPU Time": cpu_ns,
                "Input Metrics": {"Bytes Read": in_b},
                "Shuffle Read Metrics": {
                    "Remote Bytes Read": sr_remote,
                    "Local Bytes Read": sr_local,
                },
                "Shuffle Write Metrics": {"Shuffle Bytes Written": sw},
            },
        }

    events = [
        {
            "Event": "SparkListenerJobStart",
            "Job ID": 0,
            "Submission Time": 1_000,
            "Stage IDs": [0, 1],
        },
        task_end(0, run_ms=50, cpu_ns=40_000_000, in_b=1_000, sw=300),
        task_end(0, run_ms=60, cpu_ns=50_000_000, in_b=1_200, sw=400),
        task_end(1, run_ms=30, cpu_ns=20_000_000, sr_remote=500, sr_local=200),
        {"Event": "SparkListenerJobEnd", "Job ID": 0, "Completion Time": 1_450},
        {
            "Event": "SparkListenerJobStart",
            "Job ID": 1,
            "Submission Time": 2_000,
            "Stage IDs": [2],
        },
        task_end(2, run_ms=10, cpu_ns=5_000_000, in_b=700),
        {"Event": "SparkListenerJobEnd", "Job ID": 1, "Completion Time": 2_100},
        # noise events a real log interleaves — must be ignored
        {"Event": "SparkListenerApplicationStart", "App Name": "x"},
        {"Event": "SparkListenerEnvironmentUpdate"},
    ]
    return [json.dumps(e) for e in events]


@pytest.fixture()
def eventlog(tmp_path):
    p = tmp_path / "eventlog.json"
    p.write_text("\n".join(_event_lines()) + "\n")
    return str(p)


def test_build_trace_exact_aggregates(spark, eventlog):
    rows = {r.job_id: r for r in build_trace(spark, eventlog).collect()}
    assert set(rows) == {0, 1}
    j0 = rows[0]
    assert j0.submit_ms == 1_000 and j0.duration_ms == 450
    assert j0.n_stages == 2 and j0.n_tasks == 3
    assert j0.input_bytes == 2_200
    assert j0.shuffle_read_bytes == 700 and j0.shuffle_write_bytes == 700
    assert j0.executor_run_ms == 140 and j0.executor_cpu_ns == 110_000_000
    j1 = rows[1]
    assert (j1.n_stages, j1.n_tasks, j1.input_bytes) == (1, 1, 700)
    assert j1.shuffle_write_bytes == 0 and j1.duration_ms == 100


def test_build_trace_directory_of_logs_does_not_bleed_across_apps(spark, tmp_path):
    """Job and stage IDs restart at 0 in every Spark application; a
    directory of two logs with colliding IDs must keep each app's metrics
    separate (reviewed round 8: bare-ID joins mixed apps)."""
    d = tmp_path / "logs"
    d.mkdir()
    (d / "app-A").write_text("\n".join(_event_lines()) + "\n")
    # app B: same job 0 / stage 0 IDs, different numbers
    b_events = [
        {
            "Event": "SparkListenerJobStart",
            "Job ID": 0,
            "Submission Time": 9_000,
            "Stage IDs": [0],
        },
        {
            "Event": "SparkListenerTaskEnd",
            "Stage ID": 0,
            "Task Metrics": {
                "Executor Run Time": 5,
                "Executor CPU Time": 1_000_000,
                "Input Metrics": {"Bytes Read": 11},
                "Shuffle Read Metrics": {"Remote Bytes Read": 0, "Local Bytes Read": 0},
                "Shuffle Write Metrics": {"Shuffle Bytes Written": 0},
            },
        },
        {"Event": "SparkListenerJobEnd", "Job ID": 0, "Completion Time": 9_050},
    ]
    (d / "app-B").write_text("\n".join(json.dumps(e) for e in b_events) + "\n")

    rows = {
        (os.path.basename(r.app), r.job_id): r
        for r in build_trace(spark, str(d)).collect()
    }
    assert set(rows) == {("app-A", 0), ("app-A", 1), ("app-B", 0)}
    a0, b0 = rows[("app-A", 0)], rows[("app-B", 0)]
    assert (a0.n_tasks, a0.input_bytes, a0.duration_ms) == (3, 2_200, 450)
    assert (b0.n_tasks, b0.input_bytes, b0.duration_ms) == (1, 11, 50)


def test_build_trace_same_basename_in_subdirs_does_not_collide(spark, tmp_path):
    """Two logs with the SAME basename in different subdirectories (legal
    under a glob/recursive input) must stay separate apps — the app key is
    the full path, not the basename (reviewed round 9)."""
    d = tmp_path / "logs"
    (d / "x").mkdir(parents=True)
    (d / "y").mkdir()
    (d / "x" / "eventlog").write_text("\n".join(_event_lines()) + "\n")
    tiny = [
        {"Event": "SparkListenerJobStart", "Job ID": 0, "Submission Time": 5_000,
         "Stage IDs": [0]},
        {"Event": "SparkListenerTaskEnd", "Stage ID": 0, "Task Metrics": {
            "Executor Run Time": 7, "Executor CPU Time": 2_000_000,
            "Input Metrics": {"Bytes Read": 42},
            "Shuffle Read Metrics": {"Remote Bytes Read": 0, "Local Bytes Read": 0},
            "Shuffle Write Metrics": {"Shuffle Bytes Written": 0}}},
        {"Event": "SparkListenerJobEnd", "Job ID": 0, "Completion Time": 5_020},
    ]
    (d / "y" / "eventlog").write_text("\n".join(json.dumps(e) for e in tiny) + "\n")

    trace = build_trace(spark, str(d / "*" / "eventlog")).collect()
    apps = {r.app for r in trace}
    assert len(apps) == 2, f"basename collision merged apps: {apps}"
    by_app_job = {(r.app, r.job_id): r for r in trace}
    x_app = next(a for a in apps if "/x/" in a)
    y_app = next(a for a in apps if "/y/" in a)
    assert by_app_job[(x_app, 0)].input_bytes == 2_200
    assert by_app_job[(y_app, 0)].input_bytes == 42
    assert by_app_job[(y_app, 0)].duration_ms == 20


def test_build_trace_empty_log(spark, tmp_path):
    p = tmp_path / "empty.json"
    p.write_text('{"Event": "SparkListenerEnvironmentUpdate"}\n')
    assert build_trace(spark, str(p)).count() == 0


def test_replay_matches_traced_shape(spark, eventlog):
    trace = build_trace(spark, eventlog)
    report = replay_trace(spark, trace, policy="serial", bytes_per_row=100)
    assert [r["job_id"] for r in report] == [0, 1]
    r0, r1 = report
    # job 0 shuffled in the trace -> synthetic job shuffles; task parity
    assert r0["target_tasks"] == 3 and r0["ran_tasks"] == 3 and r0["shuffled"]
    assert r0["synth_rows"] == 2_200 // 100
    assert r1["target_tasks"] == 1 and not r1["shuffled"]
    assert all(r["wall_ms"] >= 0 for r in report)


def test_replay_stress_policy_runs_concurrently_and_reports_all(spark, eventlog):
    """STRESS keeps several jobs in flight; the report must still cover
    every traced job with the same shape parity as serial submission."""
    trace = build_trace(spark, eventlog)
    report = replay_trace(spark, trace, policy="stress", concurrency=2)
    assert [r["job_id"] for r in report] == [0, 1]
    assert report[0]["target_tasks"] == 3 and report[0]["shuffled"]
    assert report[1]["target_tasks"] == 1 and not report[1]["shuffled"]


def test_replay_rejects_unknown_policy(spark, eventlog):
    with pytest.raises(ValueError, match="policy"):
        replay_trace(spark, build_trace(spark, eventlog), policy="sleep")


def test_build_trace_on_genuine_event_log(spark, tmp_path):
    """End-to-end against a REAL event log: a subprocess session with
    spark.eventLog.enabled runs a scan job and a shuffle job; build_trace
    must parse what Spark actually wrote (guards the from_json schemas
    against drift from the true listener format)."""
    logdir = tmp_path / "evlogs"
    logdir.mkdir()
    script = f"""
import sys
sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})
from hadoop_prototype_spark.session import get_spark
spark = get_spark(app_name="trace-e2e", extra_conf={{
    "spark.eventLog.enabled": "true",
    "spark.eventLog.dir": {str(logdir)!r},
    "spark.ui.showConsoleProgress": "false",
}})
from pyspark.sql import functions as F
spark.range(0, 10_000, 1, 4).selectExpr("sum(id)").collect()
spark.range(0, 10_000, 1, 4).groupBy((F.col("id") % 7).alias("k")).count().collect()
spark.stop()
"""
    subprocess.run(
        [sys.executable, "-c", script], check=True, capture_output=True, timeout=300
    )
    logs = [str(logdir / f) for f in os.listdir(logdir) if not f.startswith(".")]
    assert logs, "the session must have written an event log"
    trace = build_trace(spark, logs[0]).collect()
    assert len(trace) >= 2, "both actions must appear as traced jobs"
    assert sum(r.n_tasks for r in trace) >= 8
    assert any((r.shuffle_write_bytes or 0) > 0 for r in trace), (
        "the groupBy job must show shuffle bytes"
    )
    assert all(r.duration_ms is not None and r.duration_ms >= 0 for r in trace)
