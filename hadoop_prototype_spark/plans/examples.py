"""Composed example pipelines (SURVEY.md §2.9).

Reference → here:
- Grep (EX/Grep.java:40): already a single declarative plan — see
  plans/queries_words.grep.
- Logalyzer (hadoop-tools/hadoop-extras/Logalyzer.java:69: doArchive +
  doAnalyze with LogRegexMapper and a KeyFieldBased sort): logalyzer()
  composes filter → regex extract → count → keyfield sort as ONE plan.
- HadoopArchives (hadoop-tools/hadoop-archives/HadoopArchives.java:84) and
  small-file compaction: compact() = read → repartition to target file
  size → write; the MR job disappears into a distributed write.
- DistCp (hadoop-tools/hadoop-distcp/DistCp.java:59): distributed copy =
  read + write with partition control. Provided as copy_dataset() for the
  structured re-encode path; the byte-preserving bulk copy with
  DynamicInputFormat's work-stealing chunk queue
  (mapred/lib/DynamicInputFormat.java:51) is
  sources/distcp.copy_files_dynamic (many LPT-balanced chunks, one task
  each — Spark's pull-based scheduler is the queue).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.sort import keyfield_sort


def logalyzer(
    logs: DataFrame,
    grep_pattern: str,
    sort_spec: str = "-k2,2n",
    line_col: str = "line",
    sep: str = "\t",
) -> DataFrame:
    """Grep + count + sort over log lines, as one Catalyst plan.

    Output lines are `match<TAB>count`, sorted by the '-k' spec — the
    reference's two chained MR jobs collapse into one shuffle + one sort.
    """
    counted = (
        logs.select(F.explode(F.regexp_extract_all(F.col(line_col), F.lit(grep_pattern), 0)).alias("match"))
        .groupBy("match")
        .agg(F.count("*").alias("cnt"))
        .select(F.concat_ws(sep, "match", "cnt").alias(line_col))
    )
    return keyfield_sort(counted, sort_spec, line_col, sep)


def compact(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    target_file_mb: int = 128,
    format: str = "parquet",
    num_output_files: int | None = None,
) -> None:
    """Small-files compaction (HadoopArchives capability): coalesce many
    small files into ~target_file_mb outputs in one distributed write.

    Output file count = total input bytes / target_file_mb (sized via the
    Hadoop FileSystem API, so it works on any supported filesystem), unless
    given explicitly.
    """
    df = spark.read.format(format).load(in_path)
    if num_output_files is None:
        jvm = spark._jvm
        conf = spark._jsc.hadoopConfiguration()
        path = jvm.org.apache.hadoop.fs.Path(in_path)
        fs = path.getFileSystem(conf)
        total_bytes = fs.getContentSummary(path).getLength()
        num_output_files = max(1, int(total_bytes // (target_file_mb * 1024 * 1024)) + 1)
    df.repartition(num_output_files).write.mode("overwrite").format(format).save(out_path)


def copy_dataset(
    spark: SparkSession, in_path: str, out_path: str, format: str = "parquet"
) -> None:
    """DistCp capability: distributed structured copy (re-encode included)."""
    spark.read.format(format).load(in_path).write.mode("overwrite").format(format).save(out_path)
