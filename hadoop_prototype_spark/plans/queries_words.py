"""Word-level canonical queries: WordCount, Grep, WordMean/Median/StdDev.

Reference analogues (SURVEY.md §2.3/§2.5/§2.9):
- WordCount       EX/WordCount.java:34        tokenize → (word,1) → sum
- Grep            EX/Grep.java:40             2-job pipeline: regex match count,
                                              then sort by count desc — here one
                                              declarative plan (Catalyst fuses it)
- WordMean        EX/WordMean.java:42         global avg word length
- WordMedian      EX/WordMedian.java:43       median word length
- WordStandardDeviation EX/WordStandardDeviation.java:42  stddev via Σx, Σx²

All run over the `documents` fixture's text column. Scale notes: tokenize +
groupBy(word) is a classic high-cardinality aggregation; Spark does map-side
partial aggregation (the reference's combiner, Job.setCombinerClass) and the
wordstat queries reduce to single-row global aggregates computed from exact
integer sums, so no double-summation ordering can diverge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import tokenize
from ..sources.tables import load_table
from .registry import register

GREP_PATTERN = r"[a-z]*or[a-z]*"  # any word containing "or" (sort, order, ...)


def _words(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tokenize(load_table(spark, sf_dir, "documents"), "text")


@register(
    "ex_wordcount",
    oracle=r"""
    SELECT word, count(*) AS cnt
    FROM (SELECT unnest(string_split_regex(text, '\s+')) AS word FROM documents)
    WHERE word <> ''
    GROUP BY word
    """,
    tags=("aggregate", "examples"),
)
def wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical tokenize→group→count (EX/WordCount.java:34)."""
    return _words(spark, sf_dir).groupBy("word").agg(F.count("*").alias("cnt"))


@register(
    "grep",
    oracle=rf"""
    WITH counted AS (
        SELECT match, count(*) AS cnt
        FROM (SELECT unnest(regexp_extract_all(text, '{GREP_PATTERN}')) AS match
              FROM documents)
        GROUP BY match
    )
    SELECT match, cnt,
           row_number() OVER (ORDER BY cnt DESC, match) AS rank
    FROM counted
    """,
    tags=("pipeline", "examples"),
)
def grep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grep pipeline (EX/Grep.java:40): count regex matches, then order by
    count descending (job 2's InverseMapper + LongWritable.DecreasingComparator,
    EX/Grep.java:80-93).

    The user-visible contract is SORTED output; since the driver compares
    order-insensitively, the ordering is made hash-visible as an explicit
    rank column — computed via global_rank (sampled range boundaries, never
    a single-partition window), with the match string as the unique
    tie-break the comparator's raw-byte ordering provides.
    """
    from ..operators.sort import global_rank

    docs = load_table(spark, sf_dir, "documents")
    counted = (
        docs.select(F.explode(F.regexp_extract_all("text", F.lit(GREP_PATTERN), 0)).alias("match"))
        .groupBy("match")
        .agg(F.count("*").alias("cnt"))
    )
    return global_rank(counted, ("cnt", True), "match", rank_col="rank")


_WORDSTAT_ORACLE_BASE = r"""
    WITH words AS (
        SELECT unnest(string_split_regex(text, '\s+')) AS word FROM documents
    ), lens AS (
        SELECT length(word) AS len FROM words WHERE word <> ''
    )
"""


@register(
    "ex_wordmean",
    oracle=_WORDSTAT_ORACLE_BASE
    + """
    SELECT CAST(sum(len) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean_len FROM lens
    """,
    tags=("aggregate", "examples"),
)
def wordmean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global average word length (EX/WordMean.java:42) from exact int sums."""
    lens = _words(spark, sf_dir).select(F.length("word").alias("len"))
    return lens.agg(
        (F.sum("len").cast("double") / F.count("*").cast("double")).alias("mean_len")
    )


@register(
    "ex_wordmedian",
    oracle=_WORDSTAT_ORACLE_BASE
    + """
    SELECT CAST(quantile_cont(len, 0.5) AS DOUBLE) AS median_len FROM lens
    """,
    tags=("aggregate", "examples"),
)
def wordmedian(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated median word length (EX/WordMedian.java:43).

    The reference walks a per-length count histogram to the middle; the
    exact `percentile` aggregate is the declarative equivalent (DuckDB:
    quantile_cont).
    """
    lens = _words(spark, sf_dir).select(F.length("word").alias("len"))
    return lens.agg(F.expr("CAST(percentile(len, 0.5) AS DOUBLE)").alias("median_len"))


@register(
    "ex_wordstddev",
    oracle=_WORDSTAT_ORACLE_BASE
    + """
    SELECT sqrt(
        (CAST(sum(len * len) AS DOUBLE)
         - CAST(sum(len) AS DOUBLE) * CAST(sum(len) AS DOUBLE) / CAST(count(*) AS DOUBLE))
        / CAST(count(*) AS DOUBLE)
    ) AS stddev_len FROM lens
    """,
    tags=("aggregate", "examples"),
)
def wordstddev(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population stddev of word length via Σx/Σx² (EX/WordStandardDeviation.java:42).

    Computed exactly as the reference does — from integer power sums —
    which also makes the double math engine-independent.
    """
    lens = _words(spark, sf_dir).select(F.length("word").alias("len"))
    sums = lens.agg(
        F.sum("len").alias("s1"), F.sum(F.col("len") * F.col("len")).alias("s2"), F.count("*").alias("n")
    )
    return sums.select(
        F.sqrt(
            (F.col("s2").cast("double") - F.col("s1").cast("double") * F.col("s1").cast("double") / F.col("n").cast("double"))
            / F.col("n").cast("double")
        ).alias("stddev_len")
    )


@register(
    "z_vocab_top50",
    oracle="""
    WITH tok AS (
        SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS token
        FROM documents
    )
    SELECT token, count(*) AS n, count(DISTINCT doc_id) AS doc_freq
    FROM tok
    GROUP BY token
    ORDER BY n DESC, token
    LIMIT 50
    """,
    tags=("textstats", "pipeline"),
)
def z_vocab_top50(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary building over the documents corpus: top-50 tokens by
    frequency (ties alphabetical) with document frequency. The top-K is
    orderBy+limit — TakeOrderedAndProject, per-partition heaps, no global
    sort and no single-partition window."""
    tok = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.explode(F.split(F.col("text"), r"\s+")).alias("token"))
    )
    return (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"), F.countDistinct("doc_id").alias("doc_freq"))
        .orderBy(F.col("n").desc(), "token")
        .limit(50)
    )
