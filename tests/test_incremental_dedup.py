"""Incremental LSH dedup against a persisted index (operators/dedup.py).

The ingest-time contract: band keys of every seen doc (kept AND dropped)
are appended to a parquet index; each new batch dedups against the index +
itself and is bit-equal to rescanning the whole corpus with the global
no-lower-id-LSH-neighbor rule. Crash replay (appending a batch's keys
twice) must not change any decision.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from hadoop_prototype_spark.operators import dedup
from hadoop_prototype_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def _ids(df):
    return sorted(r.doc_id for r in df.select("doc_id").collect())


def test_incremental_lsh_matches_global_over_three_batches(spark, docs, tmp_path):
    """Batches processed in ascending-id order reproduce the global rule."""
    hi = docs.agg(F.max("doc_id")).first()[0]
    cuts = [hi // 3, 2 * hi // 3]
    batches = [
        docs.filter(F.col("doc_id") <= cuts[0]),
        docs.filter((F.col("doc_id") > cuts[0]) & (F.col("doc_id") <= cuts[1])),
        docs.filter(F.col("doc_id") > cuts[1]),
    ]
    index_path = str(tmp_path / "lsh_index")

    kept = []
    # batch 0 bootstraps: empty index == batch-mode dedup of itself
    first_keep = dedup.lsh_keepers(batches[0])
    kept += _ids(first_keep)
    dedup.lsh_index_keys(batches[0]).write.mode("overwrite").parquet(index_path)
    for b in batches[1:]:
        index = spark.read.parquet(index_path)
        keepers, bk = dedup.incremental_lsh_dedup(b, index)
        kept += _ids(keepers)
        bk.write.mode("append").parquet(index_path)

    assert sorted(kept) == _ids(dedup.lsh_keepers(docs))
    # the index holds every doc's keys, dropped docs included
    n_indexed = (
        spark.read.parquet(index_path).select("doc_id").distinct().count()
    )
    assert n_indexed == docs.count()


def test_incremental_lsh_replayed_append_is_idempotent(spark, docs, tmp_path):
    """At-least-once ingest: duplicate index rows change no keep decision."""
    hi = docs.agg(F.max("doc_id")).first()[0]
    base = docs.filter(F.col("doc_id") <= hi // 2)
    batch = docs.filter(F.col("doc_id") > hi // 2)
    index_path = str(tmp_path / "lsh_index")
    dedup.lsh_index_keys(base).write.mode("overwrite").parquet(index_path)
    once, _ = dedup.incremental_lsh_dedup(batch, spark.read.parquet(index_path))
    # crash replay: the same base keys land a second time
    dedup.lsh_index_keys(base).write.mode("append").parquet(index_path)
    twice, _ = dedup.incremental_lsh_dedup(batch, spark.read.parquet(index_path))
    assert _ids(once) == _ids(twice)


def test_incremental_lsh_broadcasts_batch_not_index(spark, docs, tmp_path):
    """Scale pin: the executed plan broadcasts the (small) batch band keys;
    the index side joins map-side without an Exchange of its own rows."""
    hi = docs.agg(F.max("doc_id")).first()[0]
    base = docs.filter(F.col("doc_id") <= hi // 2)
    batch = docs.filter(F.col("doc_id") > hi // 2)
    index_path = str(tmp_path / "lsh_index")
    dedup.lsh_index_keys(base).write.mode("overwrite").parquet(index_path)
    keepers, _ = dedup.incremental_lsh_dedup(batch, spark.read.parquet(index_path))
    keepers.collect()
    plan = keepers._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
