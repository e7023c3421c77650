"""Sequence packing for training-data pipelines (engine extension).

LLM pretraining consumes documents as one concatenated token stream
sliced into fixed-capacity sequences ("packs"). Given a deterministic
document order, each document's placement is a pure function of the
EXCLUSIVE prefix sum of token counts — so packing is a weighted global
running total, the weighted sibling of `sort.global_rank`:

1. sample order-key boundaries (InputSampler machinery, plan literals);
2. bucket rows with a pure expression — no sampled repartitionByRange,
   so every recomputation agrees;
3. within-bucket exclusive prefix sums via a window per bucket;
4. per-bucket token totals (tiny agg) → cumulative offsets, broadcast
   back; start = bucket offset + local prefix.

The single-partition window runs over the ~num_partitions-row bucket
totals, never the data. No row data moves except the one hash shuffle on
the bucket id — the same contract the total-order sort pins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .sort import _sample_boundaries, _strictly_before

DEFAULT_CAPACITY = 512


def pack_sequences(
    df: DataFrame,
    capacity: int = DEFAULT_CAPACITY,
    order_col: str = "doc_id",
    tokens: Column | None = None,
    text_col: str = "text",
    num_partitions: int = 32,
    samples_per_partition: int = 20,
) -> DataFrame:
    """Assign each document its slice of the concatenated token stream:
    (id, n_tokens, start_offset, first_pack, last_pack) for packs of
    ``capacity`` tokens, documents concatenated in ``order_col`` order.

    A document may straddle packs (first_pack < last_pack) — the
    concatenate-then-chunk regime; use the offsets to split on read.
    Empty documents occupy no tokens but are anchored to the pack at
    their offset.
    """
    tok = tokens if tokens is not None else F.size(F.split(F.col(text_col), r"\s+"))
    skdf = df.select(F.col(order_col).alias("_sk"), tok.cast("long").alias("_tok"))
    types = [skdf.schema["_sk"].dataType]

    bounds = _sample_boundaries(
        skdf, ["_sk"], [False], num_partitions, samples_per_partition
    )
    bucket = F.lit(0)
    for b in bounds:
        bucket = bucket + F.when(
            _strictly_before([F.col("_sk")], [False], b, types), 1
        ).otherwise(0)
    bucketed = skdf.withColumn("_bucket", bucket)

    w = (
        Window.partitionBy("_bucket")
        .orderBy("_sk")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = bucketed.withColumn("_local_incl", F.sum("_tok").over(w))
    offsets = (
        bucketed.groupBy("_bucket")
        .agg(F.sum("_tok").alias("_btok"))
        .select(
            "_bucket",
            (F.sum("_btok").over(Window.orderBy("_bucket")) - F.col("_btok")).alias(
                "_offset"
            ),
        )
    )
    start = F.col("_offset") + F.col("_local_incl") - F.col("_tok")
    # integer div, not float-divide-then-cast: double division loses exact
    # integer semantics once offsets pass 2^53 (a 100 TB token stream does)
    return (
        local.join(F.broadcast(offsets), "_bucket")
        .select(
            F.col("_sk").alias(order_col),
            F.col("_tok").alias("n_tokens"),
            start.alias("start_offset"),
        )
        .selectExpr(
            order_col,
            "n_tokens",
            "start_offset",
            f"start_offset div {capacity} AS first_pack",
            f"(start_offset + greatest(n_tokens, 1) - 1) div {capacity} AS last_pack",
        )
    )


def pack_sequences_oracle_sql(
    table: str = "documents", capacity: int = DEFAULT_CAPACITY
) -> str:
    return f"""
    WITH t AS (
        SELECT doc_id,
               CAST(len(string_split_regex(text, '\\s+')) AS BIGINT) AS n_tokens
        FROM {table}
    ), p AS (
        SELECT doc_id, n_tokens,
               CAST(COALESCE(sum(n_tokens) OVER (
                   ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS BIGINT) AS start_offset
        FROM t
    )
    SELECT doc_id, n_tokens, start_offset,
           start_offset // {capacity} AS first_pack,
           (start_offset + greatest(n_tokens, 1) - 1) // {capacity} AS last_pack
    FROM p
    """


# --- context-window chunking -------------------------------------------------

DEFAULT_CHUNK = 32
DEFAULT_STRIDE = 24


def chunk_documents(
    df: DataFrame,
    chunk: int = DEFAULT_CHUNK,
    stride: int = DEFAULT_STRIDE,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Slice each document into fixed-size token chunks with stride
    (overlap = chunk - stride) — the standard long-document→context-window
    preprocessing (each chunk keeps `overlap` tokens of left context).
    Returns (id, chunk_id, n_tokens, chunk_text); the final chunk may be
    short. Contrast pack_sequences: that CONCATENATES docs into a global
    stream; this splits WITHIN docs and never crosses a boundary.

    Scale shape: pure map-side — one split per document (generator
    barrier), chunk starts from a bounded sequence explode, slices by
    reference into the words array. Zero shuffles, composes with parquet
    pushdown; output rows ≈ n_tokens/stride per doc.
    """
    from .partition import fan_out

    if stride <= 0 or chunk <= 0:
        raise ValueError("chunk_documents: chunk and stride must be positive")
    words_df = fan_out(df).select(
        F.col(id_col),
        F.explode(F.array(F.split(F.col(text_col), r"\s+"))).alias("words"),
    )
    words = F.col("words")
    n = F.size(words)
    # the words array rides alongside the start explode (Generate keeps
    # sibling columns) — no self-join, zero shuffles
    return words_df.select(
        F.col(id_col),
        words,
        F.explode(F.sequence(F.lit(1), n, F.lit(stride))).alias("s"),
    ).select(
        F.col(id_col),
        ((F.col("s") - 1) / stride).cast("bigint").alias("chunk_id"),
        F.least(F.lit(chunk), F.size(words) - F.col("s") + 1)
        .cast("bigint")
        .alias("n_tokens"),
        F.array_join(F.slice(words, F.col("s"), F.lit(chunk)), " ").alias(
            "chunk_text"
        ),
    )


def chunk_documents_oracle_sql(
    table: str = "documents", chunk: int = DEFAULT_CHUNK, stride: int = DEFAULT_STRIDE
) -> str:
    return f"""
    WITH split AS (
        SELECT doc_id, string_split_regex(text, '\\s+') AS words FROM {table}
    )
    SELECT doc_id,
           CAST((s - 1) // {stride} AS BIGINT) AS chunk_id,
           CAST(least({chunk}, len(words) - s + 1) AS BIGINT) AS n_tokens,
           array_to_string(list_slice(words, s, s + {chunk} - 1), ' ') AS chunk_text
    FROM (SELECT doc_id, words, unnest(generate_series(1, len(words), {stride})) AS s
          FROM split)
    """


def padding_report(
    df: DataFrame,
    bucket_tokens: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Length-bucketed padding-efficiency report: the pad-vs-pack decision
    input (pack_sequences is the zero-waste alternative; this quantifies
    what naive pad-to-longest-in-bucket batching would cost instead).

    Per token-length bucket (floor(n_tokens / bucket_tokens)):
    (bucket, n_docs, sum_tokens, max_tokens, padded_tokens, waste_frac)
    where padded_tokens = n_docs·max_tokens (every doc padded to the
    bucket's longest) and waste_frac = 1 − sum/padded. One map-side
    projection + one ≤ (max_len/bucket_tokens)-group aggregate — the
    corpus never shuffles more than the bucket histogram."""
    toks = F.size(F.split(F.col(text_col), r"\s+")).cast("bigint")
    return (
        df.select(
            (toks / F.lit(int(bucket_tokens)))
            .cast("bigint")
            .alias("bucket"),
            toks.alias("_t"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_t").alias("sum_tokens"),
            F.max("_t").alias("max_tokens"),
        )
        .selectExpr(
            "bucket",
            "n_docs",
            "sum_tokens",
            "max_tokens",
            "n_docs * max_tokens AS padded_tokens",
            "1.0 - CAST(sum_tokens AS DOUBLE) / CAST(n_docs * max_tokens AS DOUBLE) AS waste_frac",
        )
    )


def padding_report_oracle_sql(table: str = "documents", bucket_tokens: int = 64) -> str:
    return f"""
    WITH t AS (
        SELECT CAST(len(string_split_regex(text, '\\s+')) AS BIGINT) AS _t
        FROM {table}
    ), b AS (
        SELECT _t // {int(bucket_tokens)} AS bucket, _t FROM t
    )
    SELECT bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(_t) AS BIGINT) AS sum_tokens,
           CAST(max(_t) AS BIGINT) AS max_tokens,
           CAST(count(*) * max(_t) AS BIGINT) AS padded_tokens,
           1.0 - CAST(sum(_t) AS DOUBLE) / CAST(count(*) * max(_t) AS DOUBLE) AS waste_frac
    FROM b GROUP BY bucket
    """
