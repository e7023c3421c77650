"""End-to-end RAG-style retrieval over the documents table — the
chunk → embed → index → top-k pipeline a retrieval-augmented training
or serving stack runs, as ONE declarative plan. First-class engine
component (no reference analogue; the reference's nearest surface is
the datajoin/inverted-index family).

Pipeline: chunk_documents (packing.py — map-side token windows) →
feature-hash sparse embedding (each token hashes to one of ``dim``
buckets via the engine-portable md5 hash, weight = term frequency; the
classic hashing-trick embedder, exact in integers) → inverted-index
equi-join on bucket between query postings and chunk postings (the
invindex.py shape: candidates are pairs sharing ≥1 bucket, never a
cross product) → integer dot + one IEEE division for the cosine →
windowed top-k per query.

Two serving shapes, same scoring arithmetic (shared helpers — the two
paths cannot drift):

- **direct** (rag_retrieve_topk): postings built inline from the
  corpus; one pass, right for ad-hoc runs.
- **indexed** (build_rag_index → rag_query_indexed): postings persist
  as a SNAPSHOT TABLE keyed and range-clustered on ``bucket``, with
  each chunk's squared norm DENORMALIZED onto its posting rows (the
  standard search-index trick — the cosine denominator never needs
  postings outside the probed buckets). A query collects its own
  bucket list (bounded by the query token count) and reads the index
  through snapshots.read_table_pruned_in — IN-list file skipping from
  the log's recorded per-file bucket ranges — so probe IO is the
  TOUCHED bucket files, never the index (the 100k-file point-lookup
  shape). append_rag_index lands new documents as a blind versioned
  append, so the index inherits time travel / CDC / OCC / vacuum from
  the snapshot layer.

Scale shape: the corpus side never collects and shuffles only (a) its
posting build (one groupBy) and (b) the bucket join keyed by bucket —
the standard inverted-index cost. Queries are a bounded set (a
broadcast side). At production scale ``dim`` is 2^18+, so postings are
sparse and a bucket's posting list is the natural skew unit (AQE
skew-split applies); the test fixture uses a small dim, which only
makes the candidate set denser, not the plan shape different. Every
number on the path is either an exact BIGINT (hash buckets, term
frequencies, dots, squared norms) or one of two IEEE doubles (sqrt,
final division) computed in the same order on both engines, so the
full top-k result value-hash-checks against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.hashing import md5_int_spark_sql, md5_int_sql
from .packing import chunk_documents, chunk_documents_oracle_sql

RAG_DIM = 32
RAG_SALT = "ragbkt"

# The index's embedding parameters are a PERSISTED LAYOUT CONTRACT, like
# dedup's _lsh_index_meta sidecar: a probe hashed mod a different dim than
# the build still hits valid buckets and silently returns wrong scores.
# Writers record (dim, salt, chunk, stride) once and refuse a conflicting
# append; probes read the recorded dim instead of trusting their caller.
_RAG_META = "_rag_index_meta.json"


def _rag_meta_path(index_table: str) -> str:
    import os

    return os.path.join(index_table, _RAG_META)


def read_rag_index_meta(index_table: str) -> dict | None:
    """The embedding parameters recorded with a persisted index, or None
    for a legacy index written before the sidecar existed."""
    import json
    import os

    p = _rag_meta_path(index_table)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def record_rag_index_meta(
    index_table: str, dim: int, chunk: int, stride: int
) -> None:
    """Persist the index's embedding parameters (first writer wins; later
    writers must match or they would interleave incompatible postings)."""
    import json
    import os
    import uuid

    meta = {"dim": int(dim), "salt": RAG_SALT,
            "chunk": int(chunk), "stride": int(stride)}
    existing = read_rag_index_meta(index_table)
    if existing is not None:
        if existing != meta:
            raise ValueError(
                f"RAG index at {index_table} was built with {existing}; "
                f"refusing to write postings embedded with {meta} "
                "(mixed parameters silently corrupt scores)"
            )
        return
    os.makedirs(index_table, exist_ok=True)
    tmp = os.path.join(index_table, f".meta-tmp-{uuid.uuid4().hex}")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, _rag_meta_path(index_table))


def _postings(
    df: DataFrame, id_cols: list[str], text_col: str, dim: int
) -> DataFrame:
    """(id_cols…, bucket, w): term-frequency postings of the feature-hash
    embedding — explode tokens, hash to a bucket, count. One shuffle."""
    bucket = (
        f"{md5_int_spark_sql('_tok', salt=RAG_SALT)} % {dim}"
    )
    return (
        df.select(
            *id_cols,
            F.explode(F.split(F.col(text_col), r"\s+")).alias("_tok"),
        )
        .select(*id_cols, F.expr(bucket).alias("bucket"))
        .groupBy(*id_cols, "bucket")
        .agg(F.count(F.lit(1)).alias("w"))
    )


def _with_sq_norm(post: DataFrame, id_cols: list[str], out: str) -> DataFrame:
    """Denormalize the per-vector SQUARED norm (exact BIGINT) onto every
    posting row — so downstream consumers of a posting subset never need
    the rows they skipped. A window sum over the id, not a groupBy +
    self-join: the join form evaluates the whole posting subtree (chunk
    explode + hash + tf aggregate) twice, the window reads it once
    (measured 2.06 -> 1.52 s on the direct RAG query at sf0.1; identical
    rows — the aggregate and the window see the same partitions)."""
    w = Window.partitionBy(*id_cols)
    return post.withColumn(out, F.sum(F.expr("w * w")).over(w))


def _query_postings(
    docs: DataFrame, n_queries: int, dim: int, id_col: str, text_col: str
) -> DataFrame:
    """(qid, bucket, qw, q2) for the query documents (ids below
    ``n_queries``, embedded over their FULL text)."""
    qpost = _postings(
        docs.filter(F.col(id_col) < n_queries).select(
            F.col(id_col).alias("qid"), F.col(text_col)
        ),
        ["qid"], text_col, dim,
    ).withColumnRenamed("w", "qw")
    return _with_sq_norm(
        qpost.withColumn("w", F.col("qw")), ["qid"], "q2"
    ).drop("w")


def _score_topk(
    cpost: DataFrame, qpost: DataFrame, k: int, id_col: str
) -> DataFrame:
    """Top-k per query from norm-carrying postings: cpost has
    (id_col, chunk_id, bucket, w, c2), qpost has (qid, bucket, qw, q2).
    The squared norms ride in the groupBy keys (constant per group), so
    the cosine is one division off the exact-integer dot."""
    dots = (
        cpost.join(F.broadcast(qpost), "bucket")
        .filter(F.col(id_col) != F.col("qid"))
        .groupBy("qid", id_col, "chunk_id", "c2", "q2")
        .agg(F.sum(F.expr("qw * w")).alias("dot"))
    )
    scored = dots.select(
        "qid",
        id_col,
        "chunk_id",
        F.expr(
            "CAST(dot AS DOUBLE) / (sqrt(CAST(q2 AS DOUBLE)) * "
            "sqrt(CAST(c2 AS DOUBLE)))"
        ).alias("cosine"),
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("cosine").desc(), F.col(id_col), F.col("chunk_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def rag_retrieve_topk(
    docs: DataFrame,
    k: int = 5,
    n_queries: int = 4,
    chunk: int = 32,
    stride: int = 32,
    dim: int = RAG_DIM,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Direct (index-free) top-k chunks per query document by
    feature-hash cosine: (qid, doc_id, chunk_id, cosine, rank). Query
    documents are the ids below ``n_queries`` (embedded over their FULL
    text); their own chunks are excluded from their candidates. Only
    chunks sharing at least one hash bucket with the query score
    (dot > 0 candidates — the inverted-index contract); ties break by
    (doc_id, chunk_id)."""
    from .partition import fan_out

    chunks = chunk_documents(
        docs, chunk=chunk, stride=stride, text_col=text_col, id_col=id_col
    )
    cpost = _with_sq_norm(
        _postings(fan_out(chunks), [id_col, "chunk_id"], "chunk_text", dim),
        [id_col, "chunk_id"],
        "c2",
    )
    qpost = _query_postings(docs, n_queries, dim, id_col, text_col)
    return _score_topk(cpost, qpost, k, id_col)


def _clustered_postings(
    docs: DataFrame, parts: int, chunk: int, stride: int, dim: int,
    id_col: str, text_col: str,
) -> DataFrame:
    """Norm-carrying chunk postings, range-clustered on bucket so every
    written file covers a contiguous bucket range (what the probe's
    IN-list file skipping prunes on)."""
    post = _with_sq_norm(
        _postings(
            chunk_documents(
                docs, chunk=chunk, stride=stride,
                text_col=text_col, id_col=id_col,
            ),
            [id_col, "chunk_id"], "chunk_text", dim,
        ),
        [id_col, "chunk_id"],
        "c2",
    )
    return post.repartitionByRange(parts, "bucket").sortWithinPartitions(
        "bucket", id_col, "chunk_id"
    )


def build_rag_index(
    spark: SparkSession,
    docs: DataFrame,
    index_table: str,
    chunk: int = 32,
    stride: int = 32,
    dim: int = RAG_DIM,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_files: int | None = None,
) -> dict:
    """Materialize the chunk postings as a SNAPSHOT TABLE keyed and
    range-clustered on ``bucket`` — each file covers a contiguous bucket
    range recorded in the log, so a probe's IN-list file-skips straight
    from the manifest. Each posting row carries its chunk's squared
    norm (``c2``), making any bucket subset self-sufficient for
    scoring. Returns create_table's accounting."""
    from math import ceil

    from ..sources import snapshots as sn

    parts = n_files if n_files is not None else max(2, ceil(dim / 8))
    clustered = _clustered_postings(
        docs, parts, chunk, stride, dim, id_col, text_col
    )
    record_rag_index_meta(index_table, dim, chunk, stride)
    version = sn.create_table(clustered, index_table, key_col="bucket")
    return {"version": version, "files": parts, "dim": dim}


def upsert_rag_index_batch(
    spark: SparkSession,
    batch_docs: DataFrame,
    index_table: str,
    txn: dict | None = None,
    chunk: int = 32,
    stride: int = 32,
    dim: int = RAG_DIM,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> dict:
    """Create-or-append for streaming maintainers (the ingest pipeline's
    per-batch hook): the first batch creates the index table, every
    later batch lands as a blind versioned append — both with ``txn``
    riding atomically in the log entry, so an at-least-once caller's
    replay finds the marker and skips instead of double-indexing."""
    from ..sources import snapshots as sn

    if txn is not None:
        v = sn.find_txn(index_table, txn["app"], txn["batch"])
        if v is not None:
            return {"version": v, "skipped_as_duplicate_txn": True}
    clustered = _clustered_postings(
        batch_docs, 2, chunk, stride, dim, id_col, text_col
    )
    record_rag_index_meta(index_table, dim, chunk, stride)
    if sn.current_version(index_table) == 0:
        try:
            version = sn.create_table(clustered, index_table, "bucket", txn=txn)
            return {"version": version}
        except (sn.ConflictError, ValueError):
            # a concurrent first-batch writer created the table between
            # our emptiness check and the v1 commit: converge to an
            # append against the winner's log instead of failing
            pass
    return sn.append_table_retrying(
        spark, index_table, clustered, "bucket", txn=txn
    )


def append_rag_index(
    spark: SparkSession,
    new_docs: DataFrame,
    index_table: str,
    chunk: int = 32,
    stride: int = 32,
    dim: int = RAG_DIM,
    id_col: str = "doc_id",
    text_col: str = "text",
    txn: dict | None = None,
) -> dict:
    """Incremental index maintenance: the NEW documents' postings land
    as one blind versioned append (O(batch) — no existing index file
    read or rewritten), bucket-clustered within the batch so the new
    files still carry tight bucket ranges for probe pruning. The caller
    guarantees the docs are new (ingest's dedup contract); pass ``txn``
    for replay-safe at-least-once callers. Postings are NOT key-unique
    per bucket by design — the index is append-and-probe, never
    merged."""
    from ..sources import snapshots as sn

    clustered = _clustered_postings(
        new_docs, 2, chunk, stride, dim, id_col, text_col
    )
    record_rag_index_meta(index_table, dim, chunk, stride)
    return sn.append_table_retrying(
        spark, index_table, clustered, "bucket", txn=txn
    )


def rag_query_indexed(
    spark: SparkSession,
    index_table: str,
    docs: DataFrame,
    k: int = 5,
    n_queries: int = 4,
    dim: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    version: int | None = None,
) -> DataFrame:
    """Top-k against the PERSISTED index: embed the queries, collect
    their bucket list (bounded by the query token count — a driver-side
    IN-list, the IVF-probe idiom), and read only the index files whose
    recorded bucket range overlaps it (read_table_pruned_in). Scoring
    is the shared _score_topk, so indexed results are bitwise-identical
    to the direct path at the same index contents. ``version`` pins the
    probe to an index snapshot (reproducible retrieval against a frozen
    index — time travel for free).

    ``dim`` defaults to the DIM THE INDEX WAS BUILT WITH (the persisted
    meta sidecar): probing mod a different modulus hits valid files but
    scores garbage, so an explicit mismatching dim fails loud here.
    Legacy indexes without a sidecar fall back to the caller's value
    (RAG_DIM when omitted)."""
    from ..sources import snapshots as sn

    meta = read_rag_index_meta(index_table)
    if meta is not None:
        if dim is not None and int(dim) != int(meta["dim"]):
            raise ValueError(
                f"index at {index_table} was built with dim={meta['dim']}; "
                f"probing with dim={dim} would silently return wrong scores"
            )
        dim = int(meta["dim"])
    elif dim is None:
        dim = RAG_DIM
    qpost = _query_postings(docs, n_queries, dim, id_col, text_col)
    qpost = qpost.localCheckpoint(eager=False)
    buckets = [r.bucket for r in qpost.select("bucket").distinct().collect()]
    cpost = sn.read_table_pruned_in(
        spark, index_table, buckets, version=version
    )
    # Skew spread (r11 advice): the index is bucket-CLUSTERED, so a hot
    # (Zipfian) bucket's entire posting list arrives in ONE scan task —
    # and since _score_topk's join is a broadcast (no exchange for AQE's
    # skew-split to act on), that one core would run the whole candidate
    # fan-out. Rebalance the PROBED postings (probe-sized, never the
    # index) on (doc, chunk) before the join, with an EXPLICIT partition
    # count: an unqualified repartition gets AQE-coalesced to ONE
    # partition on a small probe (measured in scale_curves
    # --rag-hot-bucket), which would recreate the very skew this
    # removes. The direct path needs no spread because its postings exit
    # a hash groupBy already scattered.
    cpost = cpost.repartition(
        spark.sparkContext.defaultParallelism, F.col(id_col), F.col("chunk_id")
    )
    return _score_topk(cpost, qpost, k, id_col)


def rag_retrieve_oracle_sql(
    table: str = "documents",
    k: int = 5,
    n_queries: int = 4,
    chunk: int = 32,
    stride: int = 32,
    dim: int = RAG_DIM,
) -> str:
    """DuckDB twin of rag_retrieve_topk AND rag_query_indexed (the two
    engine paths share their scoring helpers, so one oracle covers
    both), generated from the same parameters and the same chunking CTE
    (chunk_documents_oracle_sql) — the sides cannot drift."""
    bkt = md5_int_sql("token", salt=RAG_SALT)
    return f"""
    WITH chunks AS ({chunk_documents_oracle_sql(table, chunk, stride)}),
    cpost AS (
        SELECT doc_id, chunk_id, ({bkt}) % {dim} AS bucket,
               CAST(count(*) AS BIGINT) AS w
        FROM (
            SELECT doc_id, chunk_id,
                   unnest(string_split_regex(chunk_text, '\\s+')) AS token
            FROM chunks
        )
        GROUP BY doc_id, chunk_id, bucket
    ),
    qpost AS (
        SELECT qid, ({bkt}) % {dim} AS bucket, CAST(count(*) AS BIGINT) AS qw
        FROM (
            SELECT doc_id AS qid,
                   unnest(string_split_regex(text, '\\s+')) AS token
            FROM {table} WHERE doc_id < {n_queries}
        )
        GROUP BY qid, bucket
    ),
    cnorm AS (
        SELECT doc_id, chunk_id, CAST(sum(w * w) AS BIGINT) AS c2
        FROM cpost GROUP BY doc_id, chunk_id
    ),
    qnorm AS (
        SELECT qid, CAST(sum(qw * qw) AS BIGINT) AS q2
        FROM qpost GROUP BY qid
    ),
    dots AS (
        SELECT q.qid, c.doc_id, c.chunk_id, CAST(sum(q.qw * c.w) AS BIGINT) AS dot
        FROM cpost c JOIN qpost q ON c.bucket = q.bucket AND c.doc_id <> q.qid
        GROUP BY q.qid, c.doc_id, c.chunk_id
    ),
    scored AS (
        SELECT d.qid, d.doc_id, d.chunk_id,
               CAST(d.dot AS DOUBLE) / (sqrt(CAST(q.q2 AS DOUBLE)) *
               sqrt(CAST(c.c2 AS DOUBLE))) AS cosine
        FROM dots d
        JOIN cnorm c ON d.doc_id = c.doc_id AND d.chunk_id = c.chunk_id
        JOIN qnorm q ON d.qid = q.qid
    )
    SELECT qid, doc_id, chunk_id, cosine, rank FROM (
        SELECT qid, doc_id, chunk_id, cosine,
               row_number() OVER (
                   PARTITION BY qid ORDER BY cosine DESC, doc_id, chunk_id
               ) AS rank
        FROM scored
    ) WHERE rank <= {k}
    """
