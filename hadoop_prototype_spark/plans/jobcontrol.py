"""JobControl-style DAG orchestration (SURVEY.md §2.9).

Reference: MR lib/jobcontrol/{JobControl.java:55, ControlledJob.java:51} —
a DAG of jobs with dependencies and states READY/RUNNING/SUCCESS/FAILED/
DEPENDENT_FAILED.

Spark-first perspective: a multi-job MapReduce pipeline usually collapses
into ONE lazy DataFrame plan (see chain.py) — use JobControl only when
stages must genuinely materialize (checkpoint barriers, side-effect writes,
reuse by multiple downstreams). Each job's run() returns an optional
DataFrame made available to dependents; materialization strategy is the
job's own business (write/cache/checkpoint).
"""

from __future__ import annotations

import enum
from collections.abc import Callable
from dataclasses import dataclass, field
from graphlib import TopologicalSorter

from pyspark.sql import DataFrame, SparkSession


class State(enum.Enum):
    WAITING = "WAITING"
    READY = "READY"
    RUNNING = "RUNNING"
    SUCCESS = "SUCCESS"
    FAILED = "FAILED"
    DEPENDENT_FAILED = "DEPENDENT_FAILED"


@dataclass
class ControlledJob:
    name: str
    # run(spark, dep_results) -> optional DataFrame for dependents
    run: Callable[[SparkSession, dict[str, DataFrame | None]], DataFrame | None]
    depends_on: list[str] = field(default_factory=list)
    state: State = State.WAITING
    error: Exception | None = None


class JobControl:
    """Topological executor with reference-parity failure semantics."""

    def __init__(self, jobs: list[ControlledJob]):
        names = [j.name for j in jobs]
        if len(set(names)) != len(names):
            raise ValueError("duplicate job names")
        self.jobs = {j.name: j for j in jobs}
        self.results: dict[str, DataFrame | None] = {}
        for j in jobs:
            for dep in j.depends_on:
                if dep not in self.jobs:
                    raise ValueError(f"{j.name} depends on unknown job {dep}")

    def run(self, spark: SparkSession) -> dict[str, State]:
        results: dict[str, DataFrame | None] = {}
        self.results = results  # exposed: dependents' outputs, like Job.getCounters()
        order = TopologicalSorter({j.name: set(j.depends_on) for j in self.jobs.values()})
        for name in order.static_order():
            job = self.jobs[name]
            failed_dep = any(
                self.jobs[d].state in (State.FAILED, State.DEPENDENT_FAILED)
                for d in job.depends_on
            )
            if failed_dep:
                job.state = State.DEPENDENT_FAILED
                continue
            job.state = State.RUNNING
            try:
                results[name] = job.run(spark, {d: results.get(d) for d in job.depends_on})
                job.state = State.SUCCESS
            except Exception as e:  # noqa: BLE001 — job isolation is the contract
                job.state = State.FAILED
                job.error = e
        return {n: j.state for n, j in self.jobs.items()}
