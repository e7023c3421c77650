"""Training-order operators (operators/training.py): permutation
validity, epoch independence, reproducibility, shard balance, and the
map-side shard plan."""

from __future__ import annotations

import pyspark.sql.functions as F

from hadoop_prototype_spark.operators import training
from hadoop_prototype_spark.sources.tables import load_table

N_SHARDS = 8


def test_epoch_order_is_a_reproducible_permutation(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    r1 = {
        r.doc_id: r.epoch_rank
        for r in training.epoch_order(docs, epoch=1).select("doc_id", "epoch_rank").collect()
    }
    assert sorted(r1.values()) == list(range(1, n + 1))  # contiguous 1..n
    r1_again = {
        r.doc_id: r.epoch_rank
        for r in training.epoch_order(docs, epoch=1).select("doc_id", "epoch_rank").collect()
    }
    assert r1 == r1_again  # same epoch → bit-identical order


def test_epochs_produce_different_orders(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    r1 = training.epoch_order(docs, epoch=1).select("doc_id", "epoch_rank")
    r2 = training.epoch_order(docs, epoch=2).select("doc_id", "epoch_rank")
    same = r1.join(r2, ["doc_id", "epoch_rank"]).count()
    # a fresh permutation: expected fixed points ≈ 1, not n
    assert same < r1.count() * 0.05


def test_shards_are_balanced_and_deterministic(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    sizes = {
        r.shard: r.n
        for r in training.shard_assignment(docs, n_shards=N_SHARDS)
        .groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert set(sizes) == set(range(N_SHARDS))
    mean = n / N_SHARDS
    assert all(0.5 * mean < s < 1.5 * mean for s in sizes.values())
    # changing the seed moves docs between shards
    moved = (
        training.shard_assignment(docs, n_shards=N_SHARDS, seed="other")
        .withColumnRenamed("shard", "shard2")
        .join(training.shard_assignment(docs, n_shards=N_SHARDS), "doc_id")
        .filter("shard != shard2")
        .count()
    )
    assert moved > n * 0.5


def test_shard_assignment_is_mapside_only(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = training.shard_assignment(docs, n_shards=N_SHARDS)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
