"""One-scan corpus statistics, shared by every stats-hungry consumer.

Several pipeline operators need small corpus-level scalars whose natural
implementation is a full corpus scan each: BM25 needs (n_docs, avgdl),
mixture planners need per-source token totals, and the quality percentile
filter needs the corpus-wide quality histogram. Run independently those
are three extra 100 TB reads for a few hundred numbers.

This module computes ONE joint table in ONE corpus scan —

    (source, qbin, n_docs, n_tokens)

grouped by (source, quality-histogram-bin) — at most |sources| × bins rows
(metadata-sized: 20 sources × 256 bins at the fixture; a few thousand rows
at any realistic source count). Because the measures are additive counts,
every consumer's statistic is an exact marginal of this table:

- BM25's n_docs / sum_dl        = global sums,
- mixture planners' token totals = group-by-source sums,
- the percentile filter's quality histogram = group-by-qbin doc counts.

The binning and token definitions are shared with the consumers by
construction (textstats.quality_score_column / sketch._hist_bin_spark_sql /
textstats._words), so a cutoff derived from precomputed stats is
bit-identical to one derived in-query.

At 100 TB the table is persisted alongside the corpus at ingest
(write_corpus_stats; the incremental-ingestion ledger appends batches and
merged_corpus_stats folds them — counts are mergeable), and queries read a
few-KB parquet instead of re-scanning the corpus. The reference has no
analogue (its jobs recount inputs per run); this is the Spark-first
replacement for that repeated IO.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .sketch import _hist_bin_duck_sql, _hist_bin_spark_sql
from .textstats import (
    QUALITY_HIST_BINS,
    _words,
    quality_score_column,
    quality_score_sql,
)

STATS_SCHEMA = "source string, qbin bigint, n_docs bigint, n_tokens bigint"


@dataclass(frozen=True)
class CorpusStats:
    """Collected (source, qbin, n_docs, n_tokens) cells + bin count.

    Bounded by construction: |sources| × bins cells. All accessors are
    exact-integer marginals, safe to bake into plans as literals."""

    bins: int
    cells: tuple[tuple[str, int, int, int], ...]

    @property
    def n_docs(self) -> int:
        return sum(c[2] for c in self.cells)

    @property
    def n_tokens(self) -> int:
        return sum(c[3] for c in self.cells)

    def quality_histogram(self) -> list[tuple[int, int]]:
        """Sorted (qbin, n_docs) marginal — the quality_percentile_filter
        input shape."""
        h: dict[int, int] = {}
        for _, qbin, n_docs, _ in self.cells:
            h[qbin] = h.get(qbin, 0) + n_docs
        return sorted(h.items())

    def source_tokens(self) -> dict[str, int]:
        """Per-source whitespace-token totals — the mixture-planner input."""
        t: dict[str, int] = {}
        for source, _, _, n_tokens in self.cells:
            t[source] = t.get(source, 0) + n_tokens
        return t

    def source_docs(self) -> dict[str, int]:
        d: dict[str, int] = {}
        for source, _, n_docs, _ in self.cells:
            d[source] = d.get(source, 0) + n_docs
        return d


def corpus_stats_table(
    df: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
    bins: int = QUALITY_HIST_BINS,
) -> DataFrame:
    """(source, qbin, n_docs, n_tokens): the joint stats table in one scan.

    Shape: a pure map-side projection (token count + quality score are
    codegen Column expressions) followed by a hash aggregate with map-side
    combining into ≤ |sources| × bins groups — the cheapest possible pass
    over the corpus that still serves every downstream statistic."""
    per_doc = df.select(
        F.col(source_col).alias("source"),
        F.size(_words(F.col(text_col))).alias("_dl"),
        quality_score_column(text_col).alias("_quality"),
    )
    return (
        per_doc.selectExpr(
            "source",
            f"{_hist_bin_spark_sql('_quality', 0.0, 1.0, bins)} AS qbin",
            "_dl",
        )
        .groupBy("source", "qbin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_dl").alias("n_tokens"),
        )
    )


def corpus_stats_oracle_sql(table: str = "documents", bins: int = QUALITY_HIST_BINS) -> str:
    return f"""
    WITH w AS (
        SELECT source, text, string_split_regex(text, '\\s+') AS words FROM {table}
    ), per_doc AS (
        SELECT source,
               len(words) AS _dl,
               {quality_score_sql()} AS _quality
        FROM w
    )
    SELECT source,
           {_hist_bin_duck_sql('_quality', 0.0, 1.0, bins)} AS qbin,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(_dl) AS BIGINT) AS n_tokens
    FROM per_doc
    GROUP BY 1, 2
    """


def collect_corpus_stats(
    df: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
    bins: int = QUALITY_HIST_BINS,
) -> CorpusStats:
    """Run the one-scan stats pass and collect the (bounded) cell table."""
    rows = corpus_stats_table(df, text_col, source_col, bins).collect()
    return CorpusStats(
        bins=bins,
        cells=tuple(
            sorted((r.source, int(r.qbin), int(r.n_docs), int(r.n_tokens)) for r in rows)
        ),
    )


def write_corpus_stats(stats_df: DataFrame, path: str) -> None:
    """Persist the stats table alongside the corpus (a few KB of parquet).

    At ingest time this is the 'stats maintained with the data' half of the
    design: queries then read this instead of re-scanning the corpus."""
    stats_df.coalesce(1).write.mode("overwrite").parquet(path)


def read_corpus_stats(spark: SparkSession, path: str, bins: int = QUALITY_HIST_BINS) -> CorpusStats:
    rows = spark.read.schema(STATS_SCHEMA).parquet(path).collect()
    return CorpusStats(
        bins=bins,
        cells=tuple(
            sorted((r.source, int(r.qbin), int(r.n_docs), int(r.n_tokens)) for r in rows)
        ),
    )


def merged_corpus_stats(*stats_dfs: DataFrame) -> DataFrame:
    """Fold per-batch stats tables into one — counts are additive, so
    incremental ingest (ledger batches) never re-reads old data."""
    if not stats_dfs:
        raise ValueError("merged_corpus_stats needs at least one stats table")
    out = stats_dfs[0]
    for other in stats_dfs[1:]:
        out = out.unionByName(other)
    return out.groupBy("source", "qbin").agg(
        F.sum("n_docs").alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
    )
