"""Corpus indexing operators: TF-IDF term scoring and inverted-index
construction (training-data / retrieval pipeline).

A corpus pipeline needs term-importance signals (keyword extraction,
near-duplicate triage, quality weighting) and posting lists (retrieval,
contamination lookups). Both are pure relational plans:

- term frequencies: one map-side-combined aggregate over the exploded
  token stream, grouped by (doc, token);
- document frequencies: a second aggregate over the distinct (doc, token)
  pairs, grouped by token — vocabulary-sized output;
- the score-back join runs on the token key. At corpus scale the
  vocabulary can exceed the broadcast threshold, so the join is a plain
  shuffle-on-token equi-join (Spark picks broadcast automatically when
  the df table is small — both shapes are correct).

Determinism contract (plans/registry.py): NO logarithms. ln() is not
bit-portable across libm builds, so idf is kept as the exact ratio N/df:
tfidf_ratio = CAST(tf*N AS DOUBLE) / df — exact 64-bit integer products,
one IEEE division, bit-identical in Spark and DuckDB. Rankings by
tf·N/df and by tf·(ln N − ln df) agree whenever df ties break the same
way (and the tie-break here is total: score desc, token asc).

Inverted index at 100 TB: an uncapped posting list for a stop-word is a
single multi-GB array row — the classic skew bomb. The index therefore
stores IMPACT-ORDERED postings capped at ``max_postings`` docs per token
(highest-tf docs first, the tiered-index construction search engines
use), while keeping the exact df alongside so nothing is lost for
scoring. The cap itself is computed skew-safely: a SALTED two-phase
top-k (rank within (token, salt), then over the ≤ SALTS×k survivors),
so even the hottest token never lands in one window partition.

No reference analogue (the closest is the wordcount family,
EX/WordCount.java); this is a first-class engine extension.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

if TYPE_CHECKING:  # import cycle guard: corpusstats imports nothing from here
    from .corpusstats import CorpusStats

DEFAULT_TOP_TERMS = 5
DEFAULT_MAX_POSTINGS = 32


def _term_counts(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, token, tf) — one combining aggregate over the token stream."""
    toks = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), r"\s+")).alias("token")
    )
    return toks.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf"))


def tfidf_top_terms(
    df: DataFrame,
    top: int = DEFAULT_TOP_TERMS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``top`` terms per document by tf·N/df (exact-ratio tf-idf):
    (id, token, tf, df, tfidf, term_rank). Ties break on token asc."""
    tc = _term_counts(df, text_col, id_col)
    docfreq = tc.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.select(F.count(F.lit(1)).alias("_n"))
    scored = (
        tc.join(docfreq, "token")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("tfidf", F.expr("CAST(tf * _n AS DOUBLE) / CAST(df AS DOUBLE)"))
    )
    w = Window.partitionBy(id_col).orderBy(F.col("tfidf").desc(), F.col("token").asc())
    return (
        scored.withColumn("term_rank", F.row_number().over(w))
        .filter(F.col("term_rank") <= top)
        .select(id_col, "token", "tf", "df", "tfidf", "term_rank")
    )


def tfidf_top_terms_oracle_sql(
    table: str = "documents", top: int = DEFAULT_TOP_TERMS, id_col: str = "doc_id"
) -> str:
    return f"""
    WITH toks AS (
        SELECT {id_col}, unnest(string_split_regex(text, '\\s+')) AS token FROM {table}
    ), tc AS (
        SELECT {id_col}, token, count(*) AS tf FROM toks GROUP BY 1, 2
    ), docfreq AS (
        SELECT token, count(*) AS df FROM tc GROUP BY 1
    ), scored AS (
        SELECT tc.{id_col}, tc.token, tc.tf, d.df,
               CAST(tc.tf * (SELECT count(*) FROM {table}) AS DOUBLE)
                   / CAST(d.df AS DOUBLE) AS tfidf
        FROM tc JOIN docfreq d ON tc.token = d.token
    )
    SELECT {id_col}, token, tf, df, tfidf, term_rank FROM (
        SELECT *, row_number() OVER (
            PARTITION BY {id_col} ORDER BY tfidf DESC, token ASC
        ) AS term_rank
        FROM scored
    ) WHERE term_rank <= {top}
    """


def inverted_index(
    df: DataFrame,
    max_postings: int = DEFAULT_MAX_POSTINGS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(token, df, postings) — postings = the ``max_postings`` highest-tf
    docs for the token (ties: lowest id first), stored as a sorted-struct
    array [(tf desc, id asc)]. df stays exact even when the list is capped."""
    tc = _term_counts(df, text_col, id_col)
    # SALTED two-phase top-k: a bare Window.partitionBy(token) puts every
    # posting of a stop-word into ONE task — the skew bomb the cap exists
    # to avoid. Phase 1 ranks within (token, salt) — ≤ 1/SALTS of any hot
    # token per partition — and keeps max_postings per salt; any global
    # top-k member is necessarily in its salt's top-k, so phase 2's window
    # sees ≤ SALTS×max_postings bounded rows per token. df is aggregated
    # separately (exact, uncapped).
    SALTS = 16
    # type-independent salt: a numeric `id % SALTS` yields NULL for string
    # ids, silently collapsing phase 1 to one (token, NULL) partition —
    # correct results, defeated skew guard. xxhash64 salts any id type.
    salted = tc.withColumn(
        "_salt", F.expr(f"pmod(xxhash64({id_col}), {SALTS})").cast("int")
    )
    w1 = Window.partitionBy("token", "_salt").orderBy(
        F.col("tf").desc(), F.col(id_col).asc()
    )
    survivors = (
        salted.withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= max_postings)
    )
    w2 = Window.partitionBy("token").orderBy(F.col("tf").desc(), F.col(id_col).asc())
    ranked = survivors.withColumn("_r", F.row_number().over(w2)).filter(
        F.col("_r") <= max_postings
    )
    docfreq = tc.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    posts = (
        ranked.groupBy("token")
        .agg(
            F.array_sort(F.collect_list(F.struct("_r", F.col(id_col)))).alias("_posts")
        )
        .select(
            "token",
            F.transform(F.col("_posts"), lambda s: s[id_col]).alias("postings"),
        )
    )
    return docfreq.join(posts, "token").select("token", "df", "postings")


def inverted_index_oracle_sql(
    table: str = "documents",
    max_postings: int = DEFAULT_MAX_POSTINGS,
    id_col: str = "doc_id",
) -> str:
    return f"""
    WITH toks AS (
        SELECT {id_col}, unnest(string_split_regex(text, '\\s+')) AS token FROM {table}
    ), tc AS (
        SELECT {id_col}, token, count(*) AS tf FROM toks GROUP BY 1, 2
    ), ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY token ORDER BY tf DESC, {id_col} ASC
        ) AS _r
        FROM tc
    )
    SELECT token, count(*) AS df,
           list({id_col} ORDER BY _r) FILTER (WHERE _r <= {max_postings}) AS postings
    FROM ranked
    GROUP BY token
    """


# --- BM25-style ranked retrieval -------------------------------------------
#
# Ranked retrieval over the corpus for a fixed set of keyword queries —
# the lookup side of the inverted index above. BM25's tf saturation and
# length normalization are kept exactly; the idf factor is the RATIONAL
# form (N − df + 0.5)/(df + 0.5) instead of its logarithm (the module's
# no-ln determinism contract). Per-term scores are fixed-point-scaled to
# BIGINT before the per-doc sum, so the ranking is independent of
# partition order and engine (a raw double sum would drift in the last
# bit at 1000 executors).
BM25_K1 = 1.2
BM25_B = 0.75
BM25_SCALE = 1_000_000_000  # fixed-point per-term score quantum
BM25_TOPK = 5
BM25_QUERIES: tuple[tuple[int, str], ...] = (
    (0, "table scan join"),
    (1, "merge sort window"),
    (2, "stream batch key"),
)

# map-side tf is O(|terms|) extra column work per document scan; past this
# many distinct (qid, term) pairs the exploded inverted-index join wins
_BM25_MAPSIDE_MAX_TERMS = 64


def bm25_topk(
    df: DataFrame,
    queries: tuple[tuple[int, str], ...] = BM25_QUERIES,
    k: int = BM25_TOPK,
    text_col: str = "text",
    id_col: str = "doc_id",
    stats: "CorpusStats | None" = None,
) -> DataFrame:
    """Top-k documents per query by the rational-idf BM25 variant.

    Scale shape: query terms are a literal broadcast, so the corpus token
    stream filters map-side to matching terms BEFORE the one corpus-sized
    exchange (the (qid, doc, token) tf aggregate); df derives from tf's
    already-tiny output (NOT a second corpus pass — the DSIR scan-reuse
    lesson) and broadcasts back; n_docs/avgdl are a 2-number driver
    scalar baked in as plan literals (the quality_percentile_filter
    idiom — exact integers, so determinism is unaffected), which keeps
    the 1-row crossJoin/BroadcastNestedLoopJoin out of the plan. Top-k
    per query is a bounded window over ≤ matched docs.

    ``stats``: a precomputed operators.corpusstats.CorpusStats. With it
    the whole operator reads the corpus EXACTLY ONCE (the token-explode
    pass) — at 100 TB the stats table is maintained alongside the corpus
    at ingest, so the per-query second scan for two scalar numbers
    disappears. Without it, the scalars are computed here in a separate
    (second) corpus pass — correct, but the legacy shape.

    Degenerate input: an empty corpus (n_docs = 0) returns an empty
    (qid, id, rank, bm25) frame instead of crashing on the None sum /
    zero avgdl."""
    from pyspark.sql.window import Window

    spark = df.sparkSession
    if stats is not None:
        n_docs, sum_dl = stats.n_docs, stats.n_tokens
    else:
        n_docs, sum_dl = (
            df.select(F.size(F.split(F.col(text_col), r"\s+")).alias("_dl"))
            .agg(F.count(F.lit(1)), F.sum("_dl"))
            .first()
        )
    if not n_docs or not sum_dl:
        # empty corpus: sum_dl is NULL (or 0 for all-empty texts) and avgdl
        # would divide by zero — the correct result is simply no hits
        from pyspark.sql.types import (
            DoubleType,
            IntegerType,
            StructField,
            StructType,
        )

        return spark.createDataFrame(
            [],
            StructType(
                [
                    StructField("qid", IntegerType()),
                    StructField(id_col, df.schema[id_col].dataType),
                    StructField("rank", IntegerType()),
                    StructField("bm25", DoubleType()),
                ]
            ),
        )
    qpairs = sorted({(qid, t) for qid, q in queries for t in q.split()})
    sql_safe = all(
        "'" not in t and "\\" not in t for _, t in qpairs
    )  # terms ride in generated SQL literals on the map-side path
    if sql_safe and len(qpairs) <= _BM25_MAPSIDE_MAX_TERMS:
        # map-side tf: for a keyword-sized term set, count each term's
        # occurrences directly over the split array (one split per doc,
        # |terms| filter/size passes) and inline only the PRESENT (qid,
        # token, tf) structs — the corpus token stream is never exploded
        # and nothing corpus-sized crosses an exchange (r15 opt: measured
        # 2.1x vs the explode+broadcast-join shape at sf0.1; at 100 TB the
        # explode shape additionally shuffles every matched token). The
        # tf>0 filter reproduces the groupBy's present-tokens-only rows.
        structs = ", ".join(
            f"struct({int(qid)} AS qid, '{t}' AS token, "
            f"size(filter(_w, x -> x = '{t}')) AS tf)"
            for qid, t in qpairs
        )
        tf = (
            df.selectExpr(f"{id_col}", f"split({text_col}, '\\\\s+') AS _w")
            .selectExpr(
                id_col,
                "size(_w) AS dl",
                f"inline(filter(array({structs}), s -> s.tf > 0))",
            )
            .localCheckpoint(eager=False)
        )
    else:
        qterms = F.broadcast(spark.createDataFrame(qpairs, "qid int, token string"))
        toks = df.select(
            F.col(id_col),
            F.size(F.split(F.col(text_col), r"\s+")).alias("dl"),
            F.explode(F.split(F.col(text_col), r"\s+")).alias("token"),
        )
        matched = toks.join(qterms, "token")
        # MATERIALIZED (lazy localCheckpoint, the DSIR idiom): tf feeds both
        # the scoring join and the df aggregate — without the cut, each branch
        # re-runs the corpus explode (measured: 2 scans in the final plan,
        # ReuseExchange does not fire across the differing aggregates)
        tf = (
            matched.groupBy("qid", id_col, "token", "dl")
            .agg(F.count(F.lit(1)).alias("tf"))
            .localCheckpoint(eager=False)
        )
    dfreq = F.broadcast(
        tf.select("token", id_col)
        .distinct()
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    term = tf.join(dfreq, "token").selectExpr(
        "qid",
        id_col,
        f"""CAST(floor(
              (CAST(tf AS DOUBLE) * {BM25_K1 + 1.0!r}
               / (CAST(tf AS DOUBLE) + {BM25_K1!r} * ({1.0 - BM25_B!r} + {BM25_B!r}
                  * CAST(dl AS DOUBLE) / (CAST({int(sum_dl)} AS DOUBLE) / CAST({int(n_docs)} AS DOUBLE)))))
              * ((CAST({int(n_docs)} AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))
              * {float(BM25_SCALE)!r} + 0.5) AS BIGINT) AS term_score""",
    )
    scored = term.groupBy("qid", id_col).agg(F.sum("term_score").alias("score_scaled"))
    w = Window.partitionBy("qid").orderBy(F.col("score_scaled").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "qid",
            id_col,
            "rank",
            (F.col("score_scaled").cast("double") / F.lit(float(BM25_SCALE))).alias("bm25"),
        )
    )


def bm25_topk_oracle_sql(
    table: str = "documents",
    queries: tuple[tuple[int, str], ...] = BM25_QUERIES,
    k: int = BM25_TOPK,
) -> str:
    qrows = ", ".join(
        f"({qid}, '{t}')" for qid, t in sorted({(qid, t) for qid, q in queries for t in q.split()})
    )
    return f"""
    WITH qterms(qid, token) AS (VALUES {qrows}),
    toks AS (
        SELECT doc_id, len(string_split_regex(text, '\\s+')) AS dl,
               unnest(string_split_regex(text, '\\s+')) AS token
        FROM {table}
    ),
    stats AS (
        SELECT count(*) AS n_docs, sum(len(string_split_regex(text, '\\s+'))) AS sum_dl
        FROM {table}
    ),
    matched AS (SELECT q.qid, t.doc_id, t.token, t.dl FROM toks t JOIN qterms q USING (token)),
    tf AS (
        SELECT qid, doc_id, token, dl, count(*) AS tf
        FROM matched GROUP BY qid, doc_id, token, dl
    ),
    dfreq AS (
        SELECT token, count(DISTINCT doc_id) AS df FROM matched GROUP BY token
    ),
    term AS (
        SELECT qid, doc_id,
               CAST(floor(
                 (CAST(tf AS DOUBLE) * {BM25_K1 + 1.0!r}
                  / (CAST(tf AS DOUBLE) + {BM25_K1!r} * ({1.0 - BM25_B!r} + {BM25_B!r}
                     * CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))))
                 * ((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))
                 * {float(BM25_SCALE)!r} + 0.5) AS BIGINT) AS term_score
        FROM tf JOIN dfreq USING (token) CROSS JOIN stats
    ),
    scored AS (
        SELECT qid, doc_id, CAST(sum(term_score) AS BIGINT) AS score_scaled
        FROM term GROUP BY qid, doc_id
    ),
    ranked AS (
        SELECT qid, doc_id, score_scaled,
               CAST(row_number() OVER (PARTITION BY qid ORDER BY score_scaled DESC, doc_id) AS INT) AS rank
        FROM scored
    )
    SELECT qid, doc_id, rank,
           CAST(score_scaled AS DOUBLE) / {float(BM25_SCALE)!r} AS bm25
    FROM ranked WHERE rank <= {k}
    """
