"""Training-order operators: deterministic epoch shuffling and shard
assignment (engine extension — the data-loader-facing step of a training
pipeline, downstream of sampling/packing in SURVEY.md's LLM set).

A 100 TB curated corpus is consumed by N data-parallel workers, each
needing a different, *reproducible* permutation per epoch. Doing this
with RNGs is wrong twice at scale: a retry re-draws (non-reproducible),
and a global ORDER BY rand() is a corpus-wide sort on a value you cannot
recompute. Here every decision is a pure function of
md5(seed | epoch | id) — the module-wide determinism idiom
(operators/sampling.py:46) — so retries, repartitions, and re-runs
cannot change the order, and any worker can recompute its own slice.

- shard_assignment: shard = hash % n_shards, pure map-side codegen (zero
  shuffle, composes with partition pruning at the scan).
- epoch_order: a contiguous global rank in the epoch's permutation via
  operators/sort.global_rank (range partition on literal boundaries +
  per-partition row_number + tiny offset broadcast) — the scalable form
  of ROW_NUMBER() OVER (ORDER BY hash); never a single-partition window.

Reference analogue: none (the reference stops at sort/partition); the
hash-order idiom is TotalOrderPartitioner + the md5 sampler reused.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_int, md5_int_sql
from .sort import global_rank


def _salt(seed: str, epoch: int) -> str:
    return f"{seed}|{epoch}|"


def epoch_hash(id_col: str, seed: str, epoch: int) -> Column:
    """The permutation key: a pure function of (seed, epoch, id)."""
    return md5_int(F.col(id_col).cast("string"), salt=_salt(seed, epoch))


def shard_assignment(
    df: DataFrame,
    n_shards: int = 16,
    seed: str = "s1",
    id_col: str = "doc_id",
    shard_col: str = "shard",
) -> DataFrame:
    """Assign each row to one of ``n_shards`` data-parallel workers.
    Balanced in expectation (hash uniformity), deterministic, map-side."""
    return df.withColumn(
        shard_col, (md5_int(F.col(id_col).cast("string"), salt=f"{seed}|") % n_shards)
    )


def epoch_order(
    df: DataFrame,
    epoch: int,
    seed: str = "s1",
    id_col: str = "doc_id",
    rank_col: str = "epoch_rank",
    num_partitions: int = 32,
) -> DataFrame:
    """Contiguous 1-based rank of every row in the epoch's deterministic
    global permutation. Each epoch is a fresh permutation (different
    salt); identical inputs always produce identical orders."""
    hashed = df.withColumn("_eh", epoch_hash(id_col, seed, epoch))
    return global_rank(
        hashed,
        "_eh",
        id_col,  # total order even under (vanishingly rare) hash collisions
        num_partitions=num_partitions,
        rank_col=rank_col,
    ).drop("_eh")


def training_order(
    df: DataFrame,
    epoch: int,
    n_shards: int = 16,
    seed: str = "s1",
    id_col: str = "doc_id",
) -> DataFrame:
    """Shard assignment + the epoch's global permutation rank: everything
    a deterministic distributed data loader needs. Write the result
    ``partitionBy(shard)`` sorted by ``epoch_rank`` and worker w streams
    shard w in rank order."""
    return epoch_order(
        shard_assignment(df, n_shards, seed, id_col), epoch, seed, id_col
    )


def training_order_oracle_sql(
    table: str = "documents",
    epoch: int = 1,
    n_shards: int = 16,
    seed: str = "s1",
    id_col: str = "doc_id",
) -> str:
    h = md5_int_sql(f"CAST({id_col} AS VARCHAR)", salt=_salt(seed, epoch))
    shard_h = md5_int_sql(f"CAST({id_col} AS VARCHAR)", salt=f"{seed}|")
    return f"""
    SELECT {id_col},
           {shard_h} % {n_shards} AS shard,
           ROW_NUMBER() OVER (ORDER BY {h}, {id_col}) AS epoch_rank
    FROM {table}
    """
