"""Bloom-filtered point-lookup container (BloomMapFile parity).

Reference: ``IO/BloomMapFile.java`` — a MapFile (sorted key/value container
with an index for random ``get(key)``) plus a dynamic bloom filter consulted
before touching the index, so lookups for absent keys cost ~0 IO.

Spark-first mapping: a sorted parquet dataset written with parquet's
column-level bloom filters (``parquet.bloom.filter.enabled#<col>``). A point
lookup is an equality filter: Catalyst pushes the predicate to the scan,
where parquet-mr consults (1) row-group min/max stats (effective because the
data is key-sorted, like MapFile's index) and (2) the bloom filter (catches
absent keys even when stats can't — e.g. hash-distributed keys). Both prune
whole row groups before any data pages are read, which is exactly the
BloomMapFile skip-the-seek behavior at columnar granularity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bloom_map(
    df: DataFrame,
    path: str,
    key_col: str,
    expected_ndv: int | None = None,
    sort: bool = True,
    row_group_bytes: int | None = None,
) -> None:
    """MapFile.Writer + BloomFilter contract (``IO/BloomMapFile.java:79``):
    write key-sorted, bloom-indexed parquet for point lookups.

    expected_ndv sizes the filter (reference: ``io.mapfile.bloom.size``);
    row_group_bytes shrinks row groups when lookup granularity matters more
    than scan throughput (MapFile's index-interval knob).
    """
    out = df.sort(key_col) if sort else df
    writer = out.write.option(f"parquet.bloom.filter.enabled#{key_col}", "true")
    if expected_ndv is not None:
        writer = writer.option(
            f"parquet.bloom.filter.expected.ndv#{key_col}", str(expected_ndv)
        )
    if row_group_bytes is not None:
        writer = writer.option("parquet.block.size", str(row_group_bytes))
    writer.mode("overwrite").parquet(path)


def bloom_map_get(spark: SparkSession, path: str, key_col: str, value) -> DataFrame:
    """``BloomMapFile.Reader.get`` (``IO/BloomMapFile.java:218``): equality
    lookup whose predicate reaches the parquet scan (PushedFilters), letting
    stats + bloom filters prune row groups driver-free."""
    return spark.read.parquet(path).filter(F.col(key_col) == F.lit(value))


def bloom_prune_stats(
    spark: SparkSession, file_path: str, key_col: str, value: str
) -> tuple[int, int, int]:
    """(row_groups, with_bloom, excluded_for_value) for ONE parquet file —
    reads the same parquet-mr bloom metadata the scan consults, so tests can
    assert actual prunability instead of trusting the write option."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    infile = jvm.org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        jvm.org.apache.hadoop.fs.Path(file_path), conf
    )
    reader = jvm.org.apache.parquet.hadoop.ParquetFileReader.open(infile)
    try:
        blocks = reader.getFooter().getBlocks()
        binary = jvm.org.apache.parquet.io.api.Binary.fromString(value)
        total = blocks.size()
        with_bloom = excluded = 0
        for i in range(total):
            rg = blocks.get(i)
            col = next(
                rg.getColumns().get(j)
                for j in range(rg.getColumns().size())
                if rg.getColumns().get(j).getPath().toDotString() == key_col
            )
            bloom = reader.getBloomFilterDataReader(rg).readBloomFilter(col)
            if bloom is None:
                continue
            with_bloom += 1
            if not bloom.findHash(bloom.hash(binary)):
                excluded += 1
        return total, with_bloom, excluded
    finally:
        reader.close()
