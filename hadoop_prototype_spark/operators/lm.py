"""Bigram language-model perplexity scoring — the CCNet-style LM quality
signal, log-free.

CCNet ranks documents by the perplexity of a reference language model; the
classic pipeline trains a KenLM on Wikipedia and keeps the low-perplexity
tail. This module is that signal as a pure relational plan: a bigram model
(unigram + bigram counts) learned in one corpus pass, then every document
scored by its average per-bigram surprise.

Determinism contract (plans/registry.py) bans ln() — libm log is not
bit-portable. Surprise is therefore measured in INTEGER BITS via exact
floor-log2: floor(log2(x)) = length(bin(x)) - 1, identical in Spark and
DuckDB down to the string function. Per bigram (a, b):

    surprise_bits(a, b) = floor(log2 c(a)) - floor(log2 c(ab))  >= 0

i.e. the bit-quantized -log2 of the conditional probability c(ab)/c(a).
The document score is sum(bits)/n_bigrams — bits-per-bigram, a quantized
log2-perplexity. Exact integer sums; ONE IEEE division at the end.

Scale shape: the count tables are vocabulary-sized (map-side-combined
aggregates over the exploded token/bigram streams); scoring re-joins them
on the token keys — the inverted-index shuffle shape, never all-pairs. In
the CCNet deployment the model is trained ONCE on a reference corpus and
reused, so score_lm_perplexity accepts precomputed count frames (the
corpus_stats pattern); self-training on the input is the default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# bigram array over `words`, empty for docs with < 2 tokens (Spark's
# sequence(1, 0) would count DOWN, so the guard is load-bearing)
_BIGRAMS_SPARK = (
    "CASE WHEN size(words) >= 2 THEN"
    " transform(sequence(1, size(words) - 1),"
    "           i -> concat(element_at(words, i), ' ', element_at(words, i + 1)))"
    " ELSE array() END"
)
_BIGRAMS_DUCK = "list_transform(range(1, len(words)), i -> words[i] || ' ' || words[i + 1])"

_FLOG2_SPARK = lambda x: f"(length(bin({x})) - 1)"  # noqa: E731
_FLOG2_DUCK = lambda x: f"(length(bin({x})) - 1)"  # noqa: E731  (same text!)


def lm_bigram_model(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> tuple[DataFrame, DataFrame]:
    """(unigram counts (tok, c1), bigram counts (bigram, c2)) — the model.

    Note c(a) counts every occurrence of `a` (including document-final
    positions), the standard unigram denominator; both engines share the
    definition through the oracle CTEs."""
    words = df.selectExpr(f"split({text_col}, '\\\\s+') AS words")
    uni = (
        words.selectExpr("explode(words) AS tok")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    bi = (
        words.selectExpr(f"explode({_BIGRAMS_SPARK}) AS bigram")
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("c2"))
    )
    return uni, bi


def score_lm_perplexity(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    model: tuple[DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """(id, n_bigrams, bits, bits_per_bigram) per document.

    ``model``: precomputed (unigram, bigram) count frames — the trained-
    once/reused-everywhere CCNet deployment; joins against an external
    model are inner on the bigram (unseen bigrams of a foreign model would
    need smoothing — self-trained models see every bigram by construction).
    """
    uni, bi = model if model is not None else lm_bigram_model(df, text_col, id_col)
    doc_bi = df.selectExpr(
        id_col, f"split({text_col}, '\\\\s+') AS words"
    ).selectExpr(id_col, f"explode({_BIGRAMS_SPARK}) AS bigram")
    scored = (
        doc_bi.join(bi, "bigram")
        .withColumn("tok", F.expr("split(bigram, ' ')[0]"))
        .join(uni, "tok")
        .selectExpr(id_col, f"{_FLOG2_SPARK('c1')} - {_FLOG2_SPARK('c2')} AS bits")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("bits").alias("bits"),
        )
    )
    # docs with < 2 tokens have no bigrams: keep them with a 0-bit score
    return (
        df.select(id_col)
        .join(scored, id_col, "left")
        .selectExpr(
            id_col,
            "CAST(coalesce(n_bigrams, 0) AS BIGINT) AS n_bigrams",
            "CAST(coalesce(bits, 0) AS BIGINT) AS bits",
            "CASE WHEN coalesce(n_bigrams, 0) > 0"
            " THEN CAST(bits AS DOUBLE) / CAST(n_bigrams AS DOUBLE)"
            " ELSE 0.0 END AS bits_per_bigram",
        )
    )


def lm_perplexity_oracle_sql(table: str = "documents") -> str:
    f2 = _FLOG2_DUCK
    return f"""
    WITH w AS (
        SELECT doc_id, string_split_regex(text, '\\s+') AS words FROM {table}
    ),
    uni AS (
        SELECT tok, CAST(count(*) AS BIGINT) AS c1
        FROM (SELECT unnest(words) AS tok FROM w) GROUP BY tok
    ),
    bi AS (
        SELECT bigram, CAST(count(*) AS BIGINT) AS c2
        FROM (SELECT unnest({_BIGRAMS_DUCK}) AS bigram FROM w) GROUP BY bigram
    ),
    doc_bi AS (
        SELECT doc_id, unnest({_BIGRAMS_DUCK}) AS bigram FROM w
    ),
    scored AS (
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_bigrams,
               CAST(sum({f2('c1')} - {f2('c2')}) AS BIGINT) AS bits
        FROM doc_bi
        JOIN bi USING (bigram)
        JOIN uni ON uni.tok = string_split(bigram, ' ')[1]
        GROUP BY doc_id
    )
    SELECT w.doc_id,
           CAST(coalesce(n_bigrams, 0) AS BIGINT) AS n_bigrams,
           CAST(coalesce(bits, 0) AS BIGINT) AS bits,
           CASE WHEN coalesce(n_bigrams, 0) > 0
                THEN CAST(bits AS DOUBLE) / CAST(n_bigrams AS DOUBLE)
                ELSE 0.0 END AS bits_per_bigram
    FROM w LEFT JOIN scored ON w.doc_id = scored.doc_id
    """
