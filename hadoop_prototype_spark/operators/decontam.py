"""Benchmark decontamination: flag training documents that overlap the
evaluation split (training-data pipeline).

Before an LLM trains on a corpus, documents sharing verbatim n-grams with
held-out evaluation data must be dropped — otherwise eval scores measure
memorization. The canonical published recipe (GPT-3 appendix C / PaLM /
Llama reports) is exact n-gram collision against the eval set.

Scale shape (the part that matters at 100 TB):
- The eval side is always tiny relative to the corpus (benchmark suites
  are MBs, the corpus is TBs). Its distinct shingle-hash set is built
  once and BROADCAST — the corpus side is never shuffled; contamination
  detection is a map-side semi-join over the corpus scan.
- Shingles are joined on a 48-bit md5-derived hash (functions/hashing),
  not the shingle string: the broadcast table carries 8-byte longs
  instead of raw n-gram text.
- Output is bounded: only contaminated docs (overlap > 0) with their hit
  counts, not the corpus.

Both the split assignment (operators/sampling.train_eval_split) and the
shingling (operators/dedup.word_shingles) are shared with the rest of the
pipeline, and the DuckDB oracle is generated from the same constants, so
engine and oracle cannot drift.

Reference parity: no MapReduce analogue — this is a first-class extension
the corpus pipeline needs (SURVEY.md training-data section).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_int_spark_sql, md5_int_sql
from .dedup import word_shingles, word_shingles_oracle_cte
from .sampling import RATE_BUCKETS, SPLIT_EDGES, SPLIT_SALT

# 48-bit shingle hashes: collision probability over an eval set of n
# shingles is ~n²/2^49 — negligible for any benchmark suite, and
# engine/oracle hash identically so even a collision stays bit-equal.
SHINGLE_HEX_CHARS = 12

TRAIN_EDGE = SPLIT_EDGES[0][1]  # bucket < edge → train; else eval/test


def _split_sides(df: DataFrame, id_col: str) -> tuple[DataFrame, DataFrame]:
    """(train, eval) by the shared train_eval_split bucket arithmetic."""
    bucket_sql = (
        f"{md5_int_spark_sql(f'CAST({id_col} AS STRING)', 8, salt=SPLIT_SALT)}"
        f" % {RATE_BUCKETS}"
    )
    bucket = F.expr(bucket_sql)
    return df.filter(bucket < TRAIN_EDGE), df.filter(bucket >= TRAIN_EDGE)


def _shingle_hashes(
    df: DataFrame, k: int, text_col: str, id_col: str, distinct: bool = False
) -> DataFrame:
    """distinct=False on the CORPUS side: repeated shingles are absorbed by
    the downstream countDistinct / post-join distinct, so the full shingle
    stream never pays a dedup shuffle. The eval side (tiny) dedups before
    broadcast."""
    sh = word_shingles(df, k, text_col=text_col, id_col=id_col, distinct=distinct)
    return sh.select(
        F.col(id_col), F.expr(md5_int_spark_sql("shingle", SHINGLE_HEX_CHARS)).alias("sh")
    )


def eval_contamination(
    df: DataFrame, k: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per contaminated training doc: how many distinct eval shingles it
    contains and how many distinct eval docs it collides with.

    Returns (id, n_hit_shingles, n_eval_docs), overlap > 0 rows only.
    """
    train, eval_ = _split_sides(df, id_col)
    train_sh = _shingle_hashes(train, k, text_col, id_col)
    eval_sh = (
        _shingle_hashes(eval_, k, text_col, id_col, distinct=True)
        .select(F.col(id_col).alias("eval_doc"), "sh")
        .distinct()
    )
    hits = train_sh.join(F.broadcast(eval_sh), "sh")
    return hits.groupBy(id_col).agg(
        F.countDistinct("sh").alias("n_hit_shingles"),
        F.countDistinct("eval_doc").alias("n_eval_docs"),
    )


def decontaminate(
    df: DataFrame, k: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """The filtering form: training docs with ZERO eval overlap (plus the
    eval/test rows untouched is the caller's concern — this returns the
    clean train set). Map-side broadcast anti-join over the corpus scan."""
    train, eval_ = _split_sides(df, id_col)
    train_sh = _shingle_hashes(train, k, text_col, id_col)
    eval_hashes = (
        _shingle_hashes(eval_, k, text_col, id_col, distinct=True).select("sh").distinct()
    )
    dirty = train_sh.join(F.broadcast(eval_hashes), "sh").select(id_col).distinct()
    return train.join(dirty, id_col, "left_anti")


def _split_docs_cte(table: str, id_col: str) -> str:
    bucket = (
        f"({md5_int_sql(f'CAST({id_col} AS VARCHAR)', 8, salt=SPLIT_SALT)}"
        f" % {RATE_BUCKETS})"
    )
    return f"""
    train_docs AS (SELECT * FROM {table} WHERE {bucket} < {TRAIN_EDGE}),
    eval_docs AS (SELECT * FROM {table} WHERE {bucket} >= {TRAIN_EDGE})
    """


def eval_contamination_oracle_sql(
    table: str = "documents", k: int = 3, id_col: str = "doc_id"
) -> str:
    sh_hash = md5_int_sql("shingle", SHINGLE_HEX_CHARS)
    return f"""
    WITH {_split_docs_cte(table, id_col)},
    {word_shingles_oracle_cte("train_docs", k, prefix="tr_")},
    {word_shingles_oracle_cte("eval_docs", k, prefix="ev_")},
    train_h AS (SELECT {id_col}, {sh_hash} AS sh FROM tr_shingles),
    eval_h AS (SELECT DISTINCT {id_col} AS eval_doc, {sh_hash} AS sh FROM ev_shingles)
    SELECT t.{id_col},
           count(DISTINCT t.sh) AS n_hit_shingles,
           count(DISTINCT e.eval_doc) AS n_eval_docs
    FROM train_h t JOIN eval_h e ON t.sh = e.sh
    GROUP BY t.{id_col}
    """


def decontaminate_oracle_sql(
    table: str = "documents", k: int = 3, id_col: str = "doc_id"
) -> str:
    sh_hash = md5_int_sql("shingle", SHINGLE_HEX_CHARS)
    return f"""
    WITH {_split_docs_cte(table, id_col)},
    {word_shingles_oracle_cte("train_docs", k, prefix="tr_")},
    {word_shingles_oracle_cte("eval_docs", k, prefix="ev_")},
    eval_h AS (SELECT DISTINCT {sh_hash} AS sh FROM ev_shingles),
    dirty AS (
        SELECT DISTINCT t.{id_col}
        FROM tr_shingles t JOIN eval_h e ON {md5_int_sql('t.shingle', SHINGLE_HEX_CHARS)} = e.sh
    )
    SELECT d.* FROM train_docs d
    WHERE d.{id_col} NOT IN (SELECT {id_col} FROM dirty)
    """


def contamination_by_source(
    df: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Contamination REPORT rolled up by corpus source: which feeds are
    leaking eval data, and how badly — the triage view a pipeline owner
    reads before deciding to drop or re-crawl a source. Returns one row
    per source present in train: (source, n_train_docs, n_contaminated,
    contaminated_frac, n_hit_shingles).

    Scale shape: the per-doc contamination set (bounded: contaminated
    docs only) joins back to the doc→source projection, then aggregates
    to |sources| rows. The corpus still never shuffles — the only new
    exchange is keyed on the source string.
    """
    contam = eval_contamination(df, k, text_col, id_col)
    train, _ = _split_sides(df, id_col)
    totals = train.groupBy(source_col).agg(F.count(F.lit(1)).alias("n_train_docs"))
    hits = (
        train.select(id_col, source_col)
        .join(contam, id_col)
        .groupBy(source_col)
        .agg(
            F.count(F.lit(1)).alias("n_contaminated"),
            F.sum("n_hit_shingles").cast("bigint").alias("n_hit_shingles"),
        )
    )
    return (
        totals.join(hits, source_col, "left")
        .select(
            source_col,
            "n_train_docs",
            F.coalesce(F.col("n_contaminated"), F.lit(0)).alias("n_contaminated"),
            (
                F.coalesce(F.col("n_contaminated"), F.lit(0)).cast("double")
                / F.col("n_train_docs").cast("double")
            ).alias("contaminated_frac"),
            F.coalesce(F.col("n_hit_shingles"), F.lit(0)).alias("n_hit_shingles"),
        )
    )


def contamination_by_source_oracle_sql(
    table: str = "documents", k: int = 3, id_col: str = "doc_id",
    source_col: str = "source",
) -> str:
    return f"""
    WITH contam AS ({eval_contamination_oracle_sql(table, k, id_col)}),
    tdocs AS (SELECT * FROM {table}
              WHERE ({md5_int_sql(f'CAST({id_col} AS VARCHAR)', 8, salt=SPLIT_SALT)}
                     % {RATE_BUCKETS}) < {TRAIN_EDGE}),
    totals AS (SELECT {source_col}, count(*) AS n_train_docs FROM tdocs GROUP BY 1),
    hits AS (
        SELECT d.{source_col},
               count(*) AS n_contaminated,
               CAST(sum(c.n_hit_shingles) AS BIGINT) AS n_hit_shingles
        FROM tdocs d JOIN contam c ON d.{id_col} = c.{id_col}
        GROUP BY 1
    )
    SELECT t.{source_col},
           t.n_train_docs,
           COALESCE(h.n_contaminated, 0) AS n_contaminated,
           CAST(COALESCE(h.n_contaminated, 0) AS DOUBLE)
               / CAST(t.n_train_docs AS DOUBLE) AS contaminated_frac,
           COALESCE(h.n_hit_shingles, 0) AS n_hit_shingles
    FROM totals t LEFT JOIN hits h ON t.{source_col} = h.{source_col}
    """
