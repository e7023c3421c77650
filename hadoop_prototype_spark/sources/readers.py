"""Input-format equivalents (SURVEY.md §2.1).

Reference → here:
- TextInputFormat (MR lib/input/TextInputFormat.java:42): read_text.
- KeyValueTextInputFormat (KeyValueTextInputFormat.java:47, reader
  KeyValueLineRecordReader.java:39): split each line on the FIRST separator;
  no separator → whole line is key, empty value.
- FixedLengthInputFormat (FixedLengthInputFormat.java:47): fixed-width
  records with no delimiters — sc.binaryRecords splits at recordLength
  boundaries exactly like the reference's reader.
- MultipleInputs + DelegatingMapper (MultipleInputs.java:40,
  DelegatingInputFormat.java:50): per-source read + transform, then
  unionByName.
- SequenceFileInputFormat (SequenceFileInputFormat.java:41): ingest shim via
  sc.sequenceFile for compatibility; Parquet is the native container.
- NLineInputFormat (NLineInputFormat.java:61): fan-out control →
  records_per_partition.
- CombineFileInputFormat (CombineFileInputFormat.java:84): built into
  Spark's file scan (maxPartitionBytes/openCostInBytes pack small files);
  nothing to implement — see session.py.
"""

from __future__ import annotations

import math
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType, StringType


def read_text(spark: SparkSession, path: str) -> DataFrame:
    """Lines → df(line). The byte-offset key of TextInputFormat is dropped
    (it exists only to make keys unique; Spark rows don't need one)."""
    return spark.read.text(path).withColumnRenamed("value", "line")


def parse_kv(df: DataFrame, line_col: str = "line", sep: str = "\t") -> DataFrame:
    """KeyValueLineRecordReader: split on first separator occurrence."""
    esc = "".join(("\\" + c) if c in r"\.[]{}()*+?^$|" else c for c in sep)
    parts = F.split(F.col(line_col), esc, 2)
    return df.select(
        F.coalesce(F.try_element_at(parts, F.lit(1)), F.lit("")).alias("key"),
        F.coalesce(F.try_element_at(parts, F.lit(2)), F.lit("")).alias("value"),
    )


def read_kv_text(spark: SparkSession, path: str, sep: str = "\t") -> DataFrame:
    return parse_kv(read_text(spark, path), sep=sep)


def read_fixed_length(
    spark: SparkSession,
    path: str,
    record_length: int,
    fields: list[tuple[str, int, int]] | None = None,
    encoding: str = "utf-8",
) -> DataFrame:
    """FixedLengthInputFormat: undelimited records of exactly record_length
    bytes. fields = [(name, start_offset, length)] slices each record; with
    no fields, one 'record' string column.

    Scale note: sc.binaryRecords computes byte-range splits at record
    boundaries (the reference's computeSplitSize contract), so this scans in
    parallel without reading whole files on one task.
    """
    rdd = spark.sparkContext.binaryRecords(path, record_length)
    if fields is None:
        fields = [("record", 0, record_length)]

    def slice_record(rec: bytes):
        return tuple(rec[s : s + l].decode(encoding) for _, s, l in fields)

    schema = StructType([StructField(n, StringType(), False) for n, _, _ in fields])
    return spark.createDataFrame(rdd.map(slice_record), schema)


def multiple_inputs(
    spark: SparkSession,
    sources: list[tuple[str, Callable[[SparkSession, str], DataFrame], Callable[[DataFrame], DataFrame] | None]],
) -> DataFrame:
    """MultipleInputs: (path, reader, per-source transform) triples unioned.

    The per-path mapper of DelegatingMapper is the transform; pass None for
    identity. Output schemas must align by name (unionByName).
    """
    dfs = []
    for path, reader, transform in sources:
        df = reader(spark, path)
        if transform is not None:
            df = transform(df)
        dfs.append(df)
    if not dfs:
        raise ValueError("no sources")
    out = dfs[0]
    for df in dfs[1:]:
        out = out.unionByName(df)
    return out


def read_sequence_file(spark: SparkSession, path: str) -> DataFrame:
    """SequenceFile ingest shim (K/V container → df(key, value)).

    Types come through the Writable→Python converters of sc.sequenceFile.
    New data should use Parquet; this exists so reference datasets can be
    migrated in place.
    """
    rdd = spark.sparkContext.sequenceFile(path)
    return rdd.toDF(["key", "value"])


def write_sequence_file(df: DataFrame, path: str, key_col: str = "key",
                        value_col: str = "value") -> None:
    """SequenceFile write shim (SequenceFileOutputFormat.java:43): two
    columns → a Hadoop SequenceFile a reference job can read back.

    Types map through the Python→Writable converters of saveAsSequenceFile
    (str→Text, int→LongWritable, bytes→BytesWritable). One output file per
    partition, like one per reducer. Round-trips through
    read_sequence_file (pinned in tests). New data should use Parquet."""
    rdd = df.select(key_col, value_col).rdd.map(lambda r: (r[0], r[1]))
    rdd.saveAsSequenceFile(path)


def records_per_partition(df: DataFrame, n: int) -> DataFrame:
    """NLineInputFormat: bound records per task (fan-out control for
    expensive per-record work). Requires a count — use only when the
    downstream cost per record dwarfs a scan."""
    total = df.count()
    return df.repartition(max(1, math.ceil(total / n)))


def read_xml_records(spark: SparkSession, path: str, tag: str) -> DataFrame:
    """XML record scan (StreamXmlRecordReader, hadoop-tools/hadoop-streaming/
    .../StreamXmlRecordReader.java:46): records are the spans between
    <tag ...> and </tag>, emitted as one string column `record`.

    Compat shim: reads each file whole (records may span lines), extracts
    records with a non-greedy regex. Whole-file reads mean per-file memory —
    fine for the config/export files this format was used for; a 100 TB
    splittable XML scan belongs to a real XML source (spark-xml), not this
    reader.
    """
    files = spark.read.text(path, wholetext=True)
    pattern = rf"(?s)<{tag}(?:\s[^>]*)?>.*?</{tag}>"
    sql_pattern = pattern.replace("\\", "\\\\")  # SQL string literal unescapes one level
    return files.select(
        F.explode(F.expr(f"regexp_extract_all(value, '{sql_pattern}', 0)")).alias("record")
    )
