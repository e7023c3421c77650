"""Queries exercising the source-side operators against the fixtures.

- kv_parse: KeyValueTextInputFormat line-splitting semantics
  (MR lib/input/KeyValueLineRecordReader.java:39) applied to document text.
- md5_sample: MD5Filter hash sampling
  (MR lib/input/SequenceFileInputFilter.java:202) — deterministic at any
  parallelism, unlike positional PercentFilter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.filters import md5_filter
from ..sources.readers import parse_kv
from ..sources.tables import load_table
from .registry import register


@register(
    "kv_parse",
    oracle="""
    SELECT CASE WHEN strpos(text, ' ') > 0 THEN substr(text, 1, strpos(text, ' ') - 1)
                ELSE text END AS key,
           CASE WHEN strpos(text, ' ') > 0 THEN substr(text, strpos(text, ' ') + 1)
                ELSE '' END AS value
    FROM documents
    """,
    tags=("source",),
)
def kv_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split each document's text on the first separator into (key, value)."""
    docs = load_table(spark, sf_dir, "documents").select(F.col("text").alias("line"))
    return parse_kv(docs, sep=" ")


@register(
    "md5_sample",
    oracle="""
    SELECT o_orderkey, o_custkey FROM orders
    WHERE ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT % 10 = 0
    """,
    tags=("source", "filter"),
)
def md5_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-sampled scan: md5(key) % 10 == 0 keeps a deterministic ~10%."""
    orders = load_table(spark, sf_dir, "orders")
    return md5_filter(orders, "o_orderkey", 10).select("o_orderkey", "o_custkey")
