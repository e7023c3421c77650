"""Multi-output sinks (SURVEY.md §2.2).

Reference: MultipleOutputs (MR lib/output/MultipleOutputs.java:40-179) —
N named side outputs each with its own format, plus per-record base paths;
MultipleTextOutputFormat (key-derived file names, old API);
LazyOutputFormat (:42, no file for empty outputs); NullOutputFormat (:36).

Spark-first:
- named outputs     → one filtered/transformed write per name. Catalyst
  prunes each branch's plan; to avoid re-reading the source N times, pass a
  cached df (caller's choice — at 100 TB you usually WANT independent
  column-pruned scans instead of a cache).
- key-derived paths → df.write.partitionBy(col): one directory per key
  value, written in a single job (this is the scalable form — a write per
  distinct key would be a driver-side loop).
- lazy outputs      → partitionBy only creates dirs for non-empty groups
  (default Spark behavior).
- null output       → format("noop"): executes the plan, writes nothing
  (used by bench.py to time plans without sink cost).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass
class NamedOutput:
    """One named side output: transform (often a filter), target, format."""

    transform: Callable[[DataFrame], DataFrame]
    path: str
    format: str = "parquet"
    options: dict[str, str] | None = None


def multiple_outputs(df: DataFrame, outputs: dict[str, NamedOutput], mode: str = "overwrite") -> None:
    """Write each named output (MultipleOutputs.write(name, ...) analogue)."""
    for _, out in sorted(outputs.items()):
        writer = out.transform(df).write.mode(mode).format(out.format)
        for k, v in (out.options or {}).items():
            writer = writer.option(k, v)
        writer.save(out.path)


def write_partitioned_by_key(
    df: DataFrame, path: str, partition_cols: list[str], format: str = "parquet", mode: str = "overwrite"
) -> None:
    """Key-derived output paths (MultipleTextOutputFormat / baseOutputPath):
    one directory per key value, single distributed write."""
    df.write.mode(mode).format(format).partitionBy(*partition_cols).save(path)


def null_output(df: DataFrame) -> None:
    """NullOutputFormat: run the plan, discard the rows."""
    df.write.format("noop").mode("overwrite").save()
