"""Provided-storage mounts (hadoop-fs2img parity — the CISL fork signature).

Reference: ``hadoop-tools/hadoop-fs2img`` walks an external store tree
(``TreeWalk.java:7``), resolves fixed-size block metadata
(``FixedBlockResolver.java:11``), and writes a namenode image
(``ImageWriter.java:54``, ``FileSystemImage.java:20``) so HDFS can mount
the external data as PROVIDED storage — query-in-place, no copy.

Spark-first: the catalog IS the namenode image. ``CREATE TABLE ... USING
<fmt> LOCATION <path>`` registers external data in place as an EXTERNAL
table — schema and partition discovery replace the tree walk, the file
index replaces block resolution, and DROP TABLE never deletes the data
(exactly fs2img's read-only mount contract). Partition directories become
catalog partitions, so partition pruning works on the mounted tree the
same way block locality worked on provided storage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def mount_provided(
    spark: SparkSession,
    location: str,
    name: str,
    fmt: str = "parquet",
    replace: bool = False,
) -> DataFrame:
    """Mount an external dataset tree as an EXTERNAL catalog table.

    The data is queried in place: no copy, no move, and dropping the table
    leaves every file untouched. Hive-style partition directories
    (``k=v/``) under ``location`` are discovered and registered (the
    TreeWalk), enabling catalog-side partition pruning.
    """
    if replace:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
    spark.sql(f"CREATE TABLE IF NOT EXISTS {name} USING {fmt} LOCATION '{location}'")
    try:
        # partition discovery for partitioned layouts (no-op otherwise)
        spark.sql(f"MSCK REPAIR TABLE {name}")
    except Exception:
        pass  # unpartitioned external tables need no recovery
    return spark.table(name)


def unmount_provided(spark: SparkSession, name: str) -> None:
    """Drop the mount. EXTERNAL semantics: metadata only — the mounted
    files must survive (asserted in tests, the fs2img contract)."""
    spark.sql(f"DROP TABLE IF EXISTS {name}")
