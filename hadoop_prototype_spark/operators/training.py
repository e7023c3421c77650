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


# --- fill-in-middle (FIM) transform -------------------------------------------

FIM_PREFIX, FIM_SUFFIX, FIM_MIDDLE = "<|fim_prefix|>", "<|fim_suffix|>", "<|fim_middle|>"


def fim_transform(
    df: DataFrame,
    percent: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic fill-in-middle training transform (the StarCoder/
    code-LLM PSM layout): for a doc-id-hashed ``percent``% of documents,
    split the token sequence at two md5-derived points 0 ≤ i1 ≤ i2 ≤ n and
    emit ``<|fim_prefix|>P<|fim_suffix|>S<|fim_middle|>M``; the rest pass
    through unchanged. Returns (doc_id, fim_applied, text_out).

    Everything derives from md5(doc_id) — no RNG — so the transform is
    reproducible across runs/partitionings and exactly re-derivable for
    any doc (the operators/training.py determinism contract: a retry
    re-draws nothing, an epoch is re-creatable from the seed alone).
    Pure map-side codegen string/array ops: zero shuffle at any scale.
    """
    sid = F.col(id_col).cast("string")
    words = F.split(F.col(text_col), r"\s+")
    n = F.size(words)
    selected = md5_int(sid, salt="fimsel") % 100 < F.lit(int(percent))
    i1 = md5_int(sid, salt="fim1") % (n + F.lit(1))
    i2 = i1 + md5_int(sid, salt="fim2") % (n - i1 + F.lit(1))
    prefix = F.array_join(F.slice(words, F.lit(1), i1), " ")
    middle = F.array_join(F.slice(words, i1 + F.lit(1), i2 - i1), " ")
    suffix = F.array_join(F.slice(words, i2 + F.lit(1), n - i2), " ")
    fim = F.concat(
        F.lit(FIM_PREFIX), prefix, F.lit(FIM_SUFFIX), suffix, F.lit(FIM_MIDDLE), middle
    )
    return df.select(
        F.col(id_col),
        selected.alias("fim_applied"),
        F.when(selected, fim).otherwise(F.col(text_col)).alias("text_out"),
    )


def fim_transform_oracle_sql(
    table: str = "documents", percent: int = 50, id_col: str = "doc_id"
) -> str:
    sel = md5_int_sql(f"concat('fimsel', CAST({id_col} AS VARCHAR))")
    h1 = md5_int_sql(f"concat('fim1', CAST({id_col} AS VARCHAR))")
    h2 = md5_int_sql(f"concat('fim2', CAST({id_col} AS VARCHAR))")
    return f"""
    WITH w AS (
        SELECT {id_col}, text,
               string_split_regex(text, '\\s+') AS words,
               len(string_split_regex(text, '\\s+')) AS n
        FROM {table}
    ), cut AS (
        SELECT *,
               {sel} % 100 < {int(percent)} AS fim_applied,
               {h1} % (n + 1) AS i1
        FROM w
    ), cut2 AS (
        SELECT *, i1 + {h2} % (n - i1 + 1) AS i2 FROM cut
    )
    SELECT {id_col}, fim_applied,
           CASE WHEN fim_applied THEN
               -- coalesce: DuckDB array_to_string([]) is NULL, Spark
               -- array_join([]) is '' — empty segments must concatenate
               '{FIM_PREFIX}' || coalesce(array_to_string(list_slice(words, 1, i1), ' '), '')
               || '{FIM_SUFFIX}' || coalesce(array_to_string(list_slice(words, i2 + 1, n), ' '), '')
               || '{FIM_MIDDLE}' || coalesce(array_to_string(list_slice(words, i1 + 1, i2), ' '), '')
           ELSE text END AS text_out
    FROM cut2
    """
