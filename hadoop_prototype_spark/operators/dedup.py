"""Deduplication operators for training-data pipelines.

First-class engine components (no reference analogue — SURVEY.md §7 phase 5):

- exact_dedup:     hash-groupBy on content — one shuffle on md5(text).
- ngram_jaccard:   n-gram Jaccard (over the 48-bit-hashed shingle space)
                   for candidate pairs that share at least one shingle
                   (inverted-index join — never all-pairs; shuffles carry
                   longs, not shingle text).
- minhash_lsh:     MinHash signatures + banded LSH: candidates are pairs
                   agreeing on ≥1 band. Scale path: cost is Σ bucket²
                   per band, not n².
- simhash:         64→60-bit SimHash; near-dup candidates share ≥1 of 4
                   15-bit chunks (pigeonhole: hamming ≤ 3 ⇒ some chunk
                   equal), verified by bit_count(xor) ≤ max_hamming.

All hashing is md5-derived (functions/hashing.py) so the DuckDB oracles
produce bit-identical values. All operators are pure DataFrame expressions
— shingling explodes rows (map-side), candidate generation is an equi-join
on band/chunk keys (one shuffle), verification is a filter.

At 100 TB: every step is shuffle-on-key with map-side reduction; skewed
buckets (e.g. empty-ish docs sharing a band) are the main risk — AQE skew
handling plus the shingle-count filter keep buckets bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_int_sql, md5_int_spark_sql

# --- exact -----------------------------------------------------------------


def exact_dedup(df: DataFrame, content_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: keep min(id) per identical content; report group size.

    Shuffles on md5(content) (fixed 32-char key) rather than the full text —
    at 100 TB the shuffle moves hashes, not documents.
    """
    return (
        df.select(F.md5(F.col(content_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("keeper_id"), F.count("*").alias("n_copies"))
    )


def exact_dedup_oracle_sql(table: str = "documents") -> str:
    return f"""
    SELECT md5(text) AS content_hash, min(doc_id) AS keeper_id, count(*) AS n_copies
    FROM {table} GROUP BY 1
    """


# --- shingles --------------------------------------------------------------


def word_shingles(
    df: DataFrame, k: int = 3, text_col: str = "text", id_col: str = "doc_id", distinct: bool = True
) -> DataFrame:
    """Word k-shingles per document: (id, shingle), distinct by default.

    Documents with fewer than k words are dropped (no shingle exists) —
    mirrored exactly in the oracle SQL. Pass distinct=False when the
    consumer is dedup-insensitive (e.g. MinHash minima) — it saves a full
    shuffle.
    """
    from .partition import fan_out

    # Widen narrow inputs first: shingling is per-row compute, and a small
    # parquet file arrives as one partition (see partition.fan_out).
    df = fan_out(df)
    # Materialize the split ONCE per document behind a generator barrier:
    # projection collapse would otherwise inline `split(text)` into every
    # element_at below (k re-splits per shingle → ~50× the scan cost).
    words_df = df.select(
        F.col(id_col),
        F.explode(F.array(F.split(F.col(text_col), r"\s+"))).alias("words"),
    )
    words = F.col("words")
    n = F.size(words)
    idx = F.sequence(F.lit(1), n - (k - 1))
    shingle = lambda i: F.concat_ws(" ", *[F.element_at(words, i + j) for j in range(k)])  # noqa: E731
    out = words_df.filter(n >= k).select(
        F.col(id_col), F.explode(F.transform(idx, shingle)).alias("shingle")
    )
    return out.distinct() if distinct else out


def word_shingles_oracle_cte(table: str = "documents", k: int = 3, prefix: str = "") -> str:
    """CTE text producing (doc_id, shingle), matching word_shingles.

    ``prefix`` renames the CTEs (``{prefix}shingled``/``{prefix}shingles``)
    so two shingle sets (e.g. train vs eval in decontamination) can coexist
    in one oracle query.
    """
    parts = " || ' ' || ".join(f"words[pos + {j}]" for j in range(k))
    return f"""
    {prefix}shingled AS (
        SELECT doc_id, words, unnest(generate_series(1, len(words) - {k - 1})) AS pos
        FROM (SELECT doc_id, string_split_regex(text, '\\s+') AS words FROM {table})
        WHERE len(words) >= {k}
    ),
    {prefix}shingles AS (
        SELECT DISTINCT doc_id, {parts} AS shingle FROM {prefix}shingled
    )
    """


# --- n-gram Jaccard --------------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Pairs (a < b) with Jaccard(shingle sets) ≥ threshold.

    Inverted-index join: only pairs sharing ≥1 shingle are materialized.
    Jaccard is computed over the 48-bit-HASHED shingle space (the same
    md5 window-hash convention as duplicated_window_fraction): every
    shuffle — the per-doc distinct, the index self-join, both size joins —
    then carries an 8-byte long instead of the shingle text. At fixture
    vocabularies the collision probability per pair is ≪ 1e-9; widen
    hex_chars for billion-shingle corpora.
    """
    # the distinct (doc, hash) set feeds THREE consumers (sizes, both
    # sides of the inverted-index self-join); materialize it once (lazy
    # localCheckpoint) — exchange reuse alone leaves the shingle explode
    # + md5 pass running per consumer (measured ~1.15x at sf0.1, and the
    # reuse it replaces is not guaranteed across the differing subtrees)
    sh = (
        word_shingles(df, k, text_col, id_col, distinct=False)
        .selectExpr(id_col, f"{md5_int_spark_sql('shingle', 12)} AS wh")
        .distinct()
        .localCheckpoint(eager=False)
    )
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    a = sh.select(F.col(id_col).alias("a"), "wh")
    b = sh.select(F.col(id_col).alias("b"), "wh")
    inter = (
        a.join(b, "wh")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col(id_col).alias("a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("b"), F.col("n_sh").alias("n_b"))
    jac = F.col("n_inter").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_inter")
    ).cast("double")
    return (
        inter.join(sa, "a")
        .join(sb, "b")
        .select("a", "b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def ngram_jaccard_oracle_sql(table: str = "documents", threshold: float = 0.5, k: int = 3) -> str:
    from ..functions.hashing import md5_int_sql

    parts = " || ' ' || ".join(f"words[pos + {j}]" for j in range(k))
    return f"""
    WITH {word_shingles_oracle_cte(table, k)},
    hashed AS (
        SELECT DISTINCT doc_id, {md5_int_sql(f'({parts})', 12)} AS wh FROM shingled
    ),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM hashed GROUP BY 1),
    inter AS (
        SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS n_inter
        FROM hashed x JOIN hashed y ON x.wh = y.wh AND x.doc_id < y.doc_id
        GROUP BY 1, 2
    )
    SELECT a, b,
           CAST(n_inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = a
    JOIN sizes sb ON sb.doc_id = b
    WHERE CAST(n_inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE) >= {threshold}
    """


# --- corpus-level duplication fraction --------------------------------------


def duplicated_window_fraction(
    df: DataFrame, k: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc fraction of k-token windows that also occur in ANOTHER doc —
    the corpus-level duplication signal quality filters threshold on (the
    published web-corpus recipes cut documents whose text is mostly
    boilerplate shared across pages).

    Returns (id, n_windows, n_dup_windows, dup_fraction).

    Scale shape: never builds doc pairs. The plan is two aggregates and one
    equi-join, all keyed on a 48-bit window hash (never the window text):
    (doc, hash) occurrence counts → per-hash distinct-doc counts (vocabulary-
    sized) → join back → per-doc sums. Each step is map-side combining;
    output is one row per document.
    """
    from ..functions.hashing import md5_int_spark_sql

    sh = word_shingles(df, k, text_col, id_col, distinct=False)
    # occ feeds BOTH the per-hash doc-count aggregate and the join back;
    # materialize it once (lazy localCheckpoint) — without the cut the
    # shingle explode + md5 pass runs per consumer (measured ~1.8x at
    # sf0.1; occ is (doc, hash, count) rows, far smaller than the stream)
    occ = (
        sh.selectExpr(id_col, f"{md5_int_spark_sql('shingle', 12)} AS wh")
        .groupBy(id_col, "wh")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)
    )
    docs_per_hash = occ.groupBy("wh").agg(F.count(F.lit(1)).alias("n_docs"))
    joined = occ.join(docs_per_hash, "wh")
    return joined.groupBy(id_col).agg(
        F.sum("c").alias("n_windows"),
        F.sum(F.when(F.col("n_docs") >= 2, F.col("c")).otherwise(F.lit(0))).alias(
            "n_dup_windows"
        ),
        F.expr(
            "CAST(sum(CASE WHEN n_docs >= 2 THEN c ELSE 0 END) AS DOUBLE)"
            " / CAST(sum(c) AS DOUBLE)"
        ).alias("dup_fraction"),
    )


def duplicated_window_fraction_oracle_sql(table: str = "documents", k: int = 3) -> str:
    from ..functions.hashing import md5_int_sql

    # non-distinct occurrences, so build from the positional `shingled` CTE
    # (the `shingles` CTE dedups per doc — that's the distinct=True form)
    parts = " || ' ' || ".join(f"words[pos + {j}]" for j in range(k))
    return f"""
    WITH {word_shingles_oracle_cte(table, k)},
    occ AS (
        SELECT doc_id, {md5_int_sql(f'({parts})', 12)} AS wh, count(*) AS c
        FROM shingled GROUP BY 1, 2
    ),
    docs_per_hash AS (SELECT wh, count(*) AS n_docs FROM occ GROUP BY 1)
    SELECT o.doc_id,
           CAST(sum(o.c) AS BIGINT) AS n_windows,
           CAST(sum(CASE WHEN d.n_docs >= 2 THEN o.c ELSE 0 END) AS BIGINT) AS n_dup_windows,
           CAST(sum(CASE WHEN d.n_docs >= 2 THEN o.c ELSE 0 END) AS DOUBLE)
               / CAST(sum(o.c) AS DOUBLE) AS dup_fraction
    FROM occ o JOIN docs_per_hash d ON o.wh = d.wh
    GROUP BY o.doc_id
    """


# --- boilerplate span removal ----------------------------------------------


def remove_boilerplate_spans(
    df: DataFrame,
    k: int = 3,
    min_docs: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Span-level dedup (the published repeated-substring recipe, at word
    granularity): delete every token covered by ANY k-token window whose
    hash occurs in >= min_docs distinct documents, and reassemble the
    remaining tokens in order. Returns (id, text_clean, n_tokens,
    n_removed) for every input document. Unlike document-level dedup this
    strips shared boilerplate (headers, navigation, license blocks) while
    keeping each page's unique content.

    Scale shape: shuffles carry 48-bit window hashes and (doc, int-pos)
    pairs — the corpus TEXT is never exploded per token and never shuffled
    (tried first: a posexplode-per-token + (doc,pos) join + collect_list
    reassembly — one full token-grain shuffle plus a third corpus scan;
    this shape replaces all of that with a per-doc covered-position ARRAY,
    broadcast-or-shuffle joined back to the documents, and a map-side
    indexed filter over the split for reassembly). The window-frequency
    aggregate is vocabulary-sized with map-side combining; the covered
    join is selective by definition of min_docs. No doc-pair ever forms.
    """
    from .partition import fan_out

    from ..functions.hashing import md5_int_spark_sql

    # generator barrier: materialize the split once (word_shingles note)
    words_df = fan_out(df).select(
        F.col(id_col),
        F.explode(F.array(F.split(F.col(text_col), r"\s+"))).alias("words"),
    )
    words = F.col("words")
    n = F.size(words)
    shingle = lambda s: F.concat_ws(" ", *[F.element_at(words, s + j) for j in range(k)])  # noqa: E731
    starts = (
        words_df.filter(n >= k)
        .select(
            F.col(id_col),
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), n - (k - 1)),
                    lambda s: F.struct(s.alias("s"), shingle(s).alias("sh")),
                )
            ).alias("w"),
        )
        .select(F.col(id_col), F.col("w.s").alias("s"), F.col("w.sh").alias("sh"))
        .selectExpr(id_col, "s", f"{md5_int_spark_sql('sh', 12)} AS wh")
    )
    freq = (
        starts.groupBy("wh")
        .agg(F.countDistinct(id_col).alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .select("wh")
    )
    # per-doc covered-position set as ONE array row (bounded by doc length)
    covered_arr = (
        starts.join(freq, "wh")
        .select(
            F.col(id_col),
            F.explode(F.sequence(F.col("s"), F.col("s") + (k - 1))).alias("pos"),
        )
        .groupBy(id_col)
        .agg(F.collect_set("pos").alias("_cov"))
    )
    # reassembly is pure map-side: re-split the text and keep tokens whose
    # 1-based index is not in the covered set (empty for untouched docs)
    split_words = F.split(F.col(text_col), r"\s+")
    cov = F.coalesce(F.col("_cov"), F.expr("array()"))
    kept = F.filter(split_words, lambda tok, i: ~F.array_contains(cov, i + 1))
    return df.join(covered_arr, id_col, "left").select(
        F.col(id_col),
        F.array_join(kept, " ").alias("text_clean"),
        F.size(split_words).cast("bigint").alias("n_tokens"),
        F.size(cov).cast("bigint").alias("n_removed"),
    )


def remove_boilerplate_spans_oracle_sql(
    table: str = "documents", k: int = 3, min_docs: int = 5
) -> str:
    from ..functions.hashing import md5_int_sql

    parts = " || ' ' || ".join(f"words[pos + {j}]" for j in range(k))
    return f"""
    WITH split AS (
        SELECT doc_id, string_split_regex(text, '\\s+') AS words FROM {table}
    ),
    tok AS (
        SELECT doc_id, pos, words[pos] AS tok
        FROM (SELECT doc_id, words, unnest(generate_series(1, len(words))) AS pos FROM split)
    ),
    starts AS (
        SELECT doc_id, pos AS s, {md5_int_sql(f'({parts})', 12)} AS wh
        FROM (SELECT doc_id, words, unnest(generate_series(1, len(words) - {k - 1})) AS pos
              FROM split WHERE len(words) >= {k})
    ),
    freq AS (SELECT wh FROM starts GROUP BY wh HAVING count(DISTINCT doc_id) >= {min_docs}),
    covered AS (
        SELECT DISTINCT doc_id, unnest(generate_series(s, s + {k - 1})) AS pos
        FROM starts JOIN freq USING (wh)
    )
    SELECT t.doc_id,
           COALESCE(string_agg(CASE WHEN c.pos IS NULL THEN t.tok END, ' ' ORDER BY t.pos), '') AS text_clean,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN c.pos IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_removed
    FROM tok t LEFT JOIN covered c ON t.doc_id = c.doc_id AND t.pos = c.pos
    GROUP BY t.doc_id
    """


# --- MinHash + LSH ---------------------------------------------------------

NUM_HASHES = 16
NUM_BANDS = 4  # 4 rows per band

# One md5 per shingle, then h_i(s) = (A_i * base + B_i) mod M61 — the classic
# affine multi-hash family. A_i < 2^13 and base < 2^48 keep the product
# inside int64 (no 128-bit mulmod needed); constants are fixed so the DuckDB
# oracle derives the identical family.
M61 = (1 << 61) - 1
_A = [4097 + 8 * i * i + 24 * i + 3 for i in range(NUM_HASHES)]  # odd, < 2^13
_B = [(2654435761 * (i + 1)) % M61 for i in range(NUM_HASHES)]


def minhash_signatures(
    df: DataFrame,
    k: int = 3,
    num_hashes: int = NUM_HASHES,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc MinHash signature: min over shingles of affine hashes of one
    md5-derived 48-bit base hash per shingle."""
    # distinct=False: min() is insensitive to duplicate shingles — skip the shuffle
    sh = word_shingles(df, k, text_col, id_col, distinct=False)
    sh = sh.selectExpr(id_col, f"{md5_int_spark_sql('shingle', 12)} AS base")
    aggs = [
        F.expr(f"min(({_A[i]} * base + {_B[i]}) % {M61})").alias(f"mh_{i}")
        for i in range(num_hashes)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def minhash_band_keys(sig: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, band, band_key): md5 of the band's concatenated minhashes.

    One inline(array(struct...)) explosion — NOT a per-band union, which
    would re-execute the signature aggregation once per band.
    """
    rows_per_band = NUM_HASHES // NUM_BANDS
    structs = []
    for b in range(NUM_BANDS):
        concat = ", ".join(
            f"CAST(mh_{b * rows_per_band + r} AS STRING)" for r in range(rows_per_band)
        )
        structs.append(f"struct({b} AS band, md5(concat_ws('_', {concat})) AS band_key)")
    return sig.selectExpr(id_col, f"inline(array({', '.join(structs)}))")


def minhash_lsh_pairs(
    df: DataFrame, k: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Distinct candidate pairs (a < b) sharing ≥1 LSH band."""
    bk = minhash_band_keys(minhash_signatures(df, k, NUM_HASHES, text_col, id_col), id_col)
    return lsh_pairs_from_keys(bk, id_col)


def _minhash_sig_oracle_cols(num_hashes: int = NUM_HASHES) -> str:
    base = md5_int_sql("shingle", 12)
    return ", ".join(
        f"min(({_A[i]} * {base} + {_B[i]}) % {M61}) AS mh_{i}" for i in range(num_hashes)
    )


def minhash_pairs_oracle_ctes(table: str = "documents", k: int = 3) -> str:
    """CTE chain ending in pairs(a, b) — shared by the pair query and the
    connected-components oracle."""
    rows_per_band = NUM_HASHES // NUM_BANDS
    band_selects = []
    for b in range(NUM_BANDS):
        concat = ", ".join(
            f"CAST(mh_{b * rows_per_band + r} AS VARCHAR)" for r in range(rows_per_band)
        )
        band_selects.append(
            f"SELECT doc_id, {b} AS band, md5(concat_ws('_', {concat})) AS band_key FROM sig"
        )
    bands_union = " UNION ALL ".join(band_selects)
    return f"""{word_shingles_oracle_cte(table, k)},
    sig AS (SELECT doc_id, {_minhash_sig_oracle_cols()} FROM shingles GROUP BY doc_id),
    bands AS ({bands_union}),
    pairs AS (
        SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
        FROM bands x JOIN bands y
          ON x.band = y.band AND x.band_key = y.band_key AND x.doc_id < y.doc_id
    )"""


def minhash_lsh_oracle_sql(table: str = "documents", k: int = 3) -> str:
    return f"""
    WITH {minhash_pairs_oracle_ctes(table, k)}
    SELECT a, b FROM pairs
    """


# --- incremental LSH dedup against a persisted index -----------------------
#
# The ingest-time shape: a 100 TB corpus is deduped ONCE, its band keys are
# persisted, and each new crawl batch is deduped against that index without
# ever rescanning (or re-hashing) the corpus. Keep rule everywhere: a doc is
# dropped iff some LOWER-id doc shares an LSH band with it. The index stores
# band keys of EVERY seen doc (kept or dropped) — that makes batch-by-batch
# processing in ascending id order bit-equal to the global rule, because the
# global rule also drops d when its smaller neighbor was itself dropped.
# Re-appending a batch's keys after a crash is harmless: band keys are
# deterministic per doc and candidate sets are DISTINCT'd.


def lsh_pairs_from_keys(bk: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Distinct candidate pairs (a < b) from precomputed band keys."""
    a = bk.select(F.col(id_col).alias("a"), "band", "band_key")
    b = bk.select(F.col(id_col).alias("b"), "band", "band_key")
    return (
        a.join(b, ["band", "band_key"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def lsh_keepers(
    df: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    keys: DataFrame | None = None,
) -> DataFrame:
    """Batch-mode survivors: docs with no lower-id LSH band neighbor.

    Pass precomputed ``keys`` (lsh_index_keys output) when the caller also
    persists/reuses them — otherwise the signature pass would run twice."""
    bk = keys if keys is not None else lsh_index_keys(df, k, text_col, id_col)
    dropped = lsh_pairs_from_keys(bk, id_col).select(F.col("b").alias(id_col))
    return df.join(dropped.distinct(), id_col, "left_anti")


def lsh_keepers_oracle_sql(table: str = "documents", k: int = 3) -> str:
    return f"""
    WITH {minhash_pairs_oracle_ctes(table, k)}
    SELECT doc_id FROM {table}
    WHERE doc_id NOT IN (SELECT b FROM pairs)
    """


# Bucket count for the persisted index's band_bucket layout column. 64
# keeps local fixtures to a sane file count; a 100 TB deployment raises it
# (it only changes the LAYOUT — pruning math is identical) so a B-doc
# micro-batch touches ≤ min(B·bands, buckets) of the index's partitions.
BAND_BUCKETS = 64

# Sidecar recording the bucket count an index was laid out with. Pruning
# is only correct when batch keys are bucketed with the SAME count the
# index directories were written under — a silent mismatch (index at 2048,
# batch at the default 64) prunes away true collision partners and MISSES
# duplicates. Writers record the count once and refuse a conflicting
# append; readers re-derive the batch's buckets from the recorded count,
# so a caller can never probe with the wrong layout.
_INDEX_META = "_lsh_index_meta.json"


def _index_meta_path(index_path: str) -> str:
    import os

    return os.path.join(index_path, _INDEX_META)


def read_index_buckets(index_path: str) -> int | None:
    """The bucket count recorded with a persisted index, or None for a
    legacy index written before the sidecar existed."""
    import json
    import os

    p = _index_meta_path(index_path)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return int(json.load(f)["band_buckets"])


def record_index_buckets(index_path: str, buckets: int) -> None:
    """Persist the layout's bucket count (first writer wins; later writers
    must match or they would interleave two incompatible layouts)."""
    import json
    import os
    import uuid

    existing = read_index_buckets(index_path)
    if existing is not None:
        if existing != buckets:
            raise ValueError(
                f"index at {index_path} is laid out with band_buckets="
                f"{existing}; refusing to append keys bucketed at {buckets} "
                "(mixed layouts silently miss duplicates)"
            )
        return
    os.makedirs(index_path, exist_ok=True)
    tmp = os.path.join(index_path, f".meta-tmp-{uuid.uuid4().hex}")
    with open(tmp, "w") as f:
        json.dump({"band_buckets": int(buckets)}, f)
    os.replace(tmp, _index_meta_path(index_path))


def band_bucket_col(buckets: int = BAND_BUCKETS):
    """Deterministic bucket of the (band, band_key) join key — the
    reference analogue is MapFile's sparse index (IO/MapFile.java:59):
    probe the container through a key-derived address instead of scanning
    it. xxhash64's seed is fixed (42), so the bucket is stable across
    sessions/replays and a key always lands where a past write put it."""
    return F.pmod(F.xxhash64("band", "band_key"), F.lit(buckets)).cast("int")


def lsh_index_keys(
    df: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = BAND_BUCKETS,
) -> DataFrame:
    """(id, band, band_key, band_bucket) rows for every doc — the
    persistable index unit. band_bucket is pure layout: writers partition
    the persisted index by it, so an incremental dedup reads only the
    buckets its batch's keys can possibly collide in (the join key
    determines the bucket) instead of rescanning the whole index."""
    return minhash_band_keys(
        minhash_signatures(df, k, NUM_HASHES, text_col, id_col), id_col
    ).withColumn("band_bucket", band_bucket_col(buckets))


def write_lsh_index(
    keys: DataFrame, index_path: str, mode: str = "append", buckets: int = BAND_BUCKETS
) -> None:
    """Append a batch's band keys to the persisted index in the prunable
    layout: directory-partitioned by band_bucket, pre-shuffled on it so
    each bucket gets ONE file per batch (not one per task), with a
    parquet bloom filter on band_key so point/IN probes can skip row
    groups inside a touched bucket.

    The bucket count is recorded in a sidecar (first write) and enforced
    on every append — and band_bucket is RECOMPUTED here from ``buckets``
    rather than trusted from the caller, so a keys frame bucketed with a
    different count can never write directories that disagree with the
    recorded layout."""
    record_index_buckets(index_path, buckets)
    (
        keys.withColumn("band_bucket", band_bucket_col(buckets))
        .repartition(F.col("band_bucket"))
        .write.mode(mode)
        .option("parquet.bloom.filter.enabled#band_key", "true")
        # NDV-blind sizing allocates the 1 MB max bloom on some chunks —
        # measured 69 MB vs 9 MB for a 20k-doc index; adaptive sizes each
        # bloom to the chunk's actual key count
        .option("parquet.bloom.filter.adaptive.enabled", "true")
        .partitionBy("band_bucket")
        .parquet(index_path)
    )


def read_lsh_index_pruned(
    spark, index_path: str, batch_keys: DataFrame, push_keys_limit: int = 1024
) -> DataFrame:
    """The persisted index restricted to the partitions the batch can
    collide in. The batch's distinct band_bucket values (≤ BAND_BUCKETS,
    a driver-sized list) become a partition-pruning IN filter — files in
    other buckets are never listed into the scan, so per-batch index IO
    is O(index · touched_buckets / buckets), not O(index). Correct by
    construction: equal (band, band_key) ⇒ equal band_bucket, so no join
    partner lives outside the retained buckets. Falls back to the full
    index for a legacy layout without the band_bucket column.

    Small batches prune FURTHER: when the batch has ≤ ``push_keys_limit``
    distinct band keys, the exact key set is pushed into the parquet scan
    (PushedFilters: In(band_key, …) → row-group stats + the bloom filter
    write_lsh_index enables), dropping IO below even the touched buckets'
    size. Equally correctness-preserving: an index row whose band_key is
    not in the batch's key set can never find a join partner."""
    idx = spark.read.parquet(index_path)
    if "band_bucket" not in idx.columns or "band_bucket" not in batch_keys.columns:
        return idx
    # re-derive the batch's buckets from the count the index was LAID OUT
    # with (the sidecar) — trusting the caller's band_bucket column would
    # silently prune away true collision partners whenever the two counts
    # diverge. A legacy index without the sidecar keeps the caller's
    # buckets (both sides were written by the same pre-sidecar code with
    # the module default, the only count that code ever used).
    idx_buckets = read_index_buckets(index_path)
    if idx_buckets is not None:
        batch_keys = batch_keys.withColumn("band_bucket", band_bucket_col(idx_buckets))
    hit = sorted(
        int(r[0])
        for r in batch_keys.select("band_bucket").distinct().collect()
        if r[0] is not None
    )
    idx = idx.filter(F.col("band_bucket").isin(hit))
    keys = (
        batch_keys.select("band_key").distinct().limit(push_keys_limit + 1).collect()
    )
    if 0 < len(keys) <= push_keys_limit:
        idx = idx.filter(F.col("band_key").isin(sorted(r[0] for r in keys)))
    return idx


def incremental_lsh_dedup(
    batch: DataFrame,
    index: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    keys: DataFrame | None = None,
    broadcast_batch: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Dedup a new batch against a persisted LSH index without touching the
    corpus. Returns (surviving batch rows, the batch's band keys to append
    to the index — append them ALL, kept and dropped alike).

    Scale shape: the batch's distinct band keys are BROADCAST, so the index
    scan is filtered map-side and never shuffles — the only shuffled rows
    are actual band collisions (plus the batch's own keys for the in-batch
    self-join). An ingest of B docs against an N-doc index costs O(B)
    shuffle, not O(N). Pair with read_lsh_index_pruned for the IO half of
    that contract: a band_bucket-partitioned index is also only READ in
    the buckets the batch touches. Pass precomputed ``keys``
    (lsh_index_keys output, already materialized) when the caller computed
    them for the pruned read — otherwise the signature pass would run
    twice.

    ``broadcast_batch=True`` is right for trigger-bounded streaming
    batches (the design point). For a BULK backfill whose "batch" is
    itself executor-memory-sized, pass False: the index-vs-batch join
    falls back to a shuffled hash join on (band, band_key) — both sides
    shuffle O(their size), no driver-sized assumption. Decisions are
    identical either way (pinned by test)."""
    # the batch's keys feed two joins here plus the caller's index append —
    # materialize once (lazy localCheckpoint, the BM25/DSIR idiom; batch-
    # sized, bounded by the ingest trigger) instead of re-hashing per use
    bk = (
        keys
        if keys is not None
        else lsh_index_keys(batch, k, text_col, id_col).localCheckpoint(eager=False)
    )
    idx_a = index.select(F.col(id_col).alias("a"), "band", "band_key")
    b_side = bk.select(F.col(id_col).alias("b"), "band", "band_key")
    vs_index = (
        idx_a.join(
            F.broadcast(b_side) if broadcast_batch else b_side,
            ["band", "band_key"],
        )
        .filter(F.col("a") < F.col("b"))
        .select("b")
    )
    xa = bk.select(F.col(id_col).alias("a"), "band", "band_key")
    in_batch = (
        xa.join(b_side, ["band", "band_key"])
        .filter(F.col("a") < F.col("b"))
        .select("b")
    )
    dropped = vs_index.union(in_batch).distinct().withColumnRenamed("b", id_col)
    return batch.join(dropped, id_col, "left_anti"), bk


# --- SimHash ---------------------------------------------------------------

SIMHASH_BITS = 60  # 15 md5 hex chars → always-positive int64
SIMHASH_CHUNKS = 4
CHUNK_BITS = SIMHASH_BITS // SIMHASH_CHUNKS  # 15


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """60-bit SimHash over word hashes: bit j of the signature is the sign
    of Σ_words (2·bit_j(md5int(word)) − 1).

    Physical shape: explode words → ONE md5 per word occurrence → 60 integer
    bit-count aggregates + count(*) in a single hash aggregation (map-side
    partial), then a cheap projection assembles the signature
    (sign(Σ(2b−1)) > 0 ⇔ 2·Σb > n). Bit sums are commutative integer adds:
    deterministic at any parallelism. All wide expressions are generated
    SQL strings (single parse JVM-side) — Column-by-Column construction of
    a 60-agg plan costs ~2s of py4j driver time per query build.
    """
    # no fan_out here: the signature feeds a self-join; an extra repartition
    # on both subtrees broke exchange reuse and cost more than it saved
    # (measured: +0.7s at sf0.1)
    word_hash = md5_int_spark_sql("w", 15)
    rows = df.selectExpr(
        id_col, f"explode(split({text_col}, '\\\\s+')) AS w"
    ).selectExpr(id_col, f"{word_hash} AS h")
    aggs = [F.expr(f"sum((h >> {j}) & 1)").alias(f"c_{j}") for j in range(SIMHASH_BITS)]
    aggs.append(F.expr("count(*)").alias("n_w"))
    sums = rows.groupBy(id_col).agg(*aggs)
    sig = " + ".join(
        f"(CASE WHEN 2 * c_{j} > n_w THEN {2**j}L ELSE 0L END)" for j in range(SIMHASH_BITS)
    )
    return sums.select(F.col(id_col), F.expr(sig).alias("simhash"))


def simhash_chunks(sig: DataFrame, id_col: str = "doc_id", carry: tuple[str, ...] = ()) -> DataFrame:
    """(id, chunk, chunk_val[, carry...]): 4 × 15-bit chunks of the signature.

    One inline(array(struct...)) explosion — NOT a 4-way union, which would
    re-execute the signature aggregation once per chunk.
    """
    mask = (1 << CHUNK_BITS) - 1
    # shiftright(), not `>>`: the `>>` operator fails to parse inside
    # struct(... AS alias) arguments in Spark's named-expression grammar.
    structs = ", ".join(
        f"struct({c} AS chunk, shiftright(simhash, {c * CHUNK_BITS}) & {mask} AS chunk_val)"
        for c in range(SIMHASH_CHUNKS)
    )
    return sig.selectExpr(id_col, *carry, f"inline(array({structs}))")


def simhash_near_dup_pairs(
    df: DataFrame, max_hamming: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Pairs (a < b) with hamming(simhash) ≤ max_hamming.

    Candidates share ≥1 chunk (pigeonhole for max_hamming ≤ 3 with 4
    chunks), verified exactly with bit_count(xor). The signatures ride
    along through the chunk join (no second join back to sig; the two
    identical sig subtrees collapse into one via ReuseExchange).
    """
    sig = simhash(df, text_col, id_col)
    ch = simhash_chunks(sig, id_col, carry=("simhash",))
    a = ch.select(F.col(id_col).alias("a"), F.col("simhash").alias("sig_a"), "chunk", "chunk_val")
    b = ch.select(F.col(id_col).alias("b"), F.col("simhash").alias("sig_b"), "chunk", "chunk_val")
    cand = (
        a.join(b, ["chunk", "chunk_val"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", "sig_a", "sig_b")
        .distinct()
    )
    ham = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return cand.select("a", "b", ham.alias("hamming")).filter(F.col("hamming") <= max_hamming)


def simhash_oracle_sig_cte(table: str = "documents") -> str:
    word_hash = md5_int_sql("w", 15)
    bit_terms = []
    for j in range(SIMHASH_BITS):
        s = (
            f"list_reduce(list_prepend(0::BIGINT, list_transform(words, w -> "
            f"(({word_hash} >> {j}) & 1) * 2 - 1)), (a, b) -> a + b)"
        )
        bit_terms.append(f"CASE WHEN {s} > 0 THEN {2**j}::BIGINT ELSE 0::BIGINT END")
    sig = " + ".join(bit_terms)
    return f"""
    sig AS (
        SELECT doc_id, {sig} AS simhash
        FROM (SELECT doc_id, string_split_regex(text, '\\s+') AS words FROM {table})
    )
    """


def simhash_near_dup_oracle_sql(table: str = "documents", max_hamming: int = 3) -> str:
    mask = (1 << CHUNK_BITS) - 1
    chunk_selects = " UNION ALL ".join(
        f"SELECT doc_id, {c} AS chunk, (simhash >> {c * CHUNK_BITS}) & {mask} AS chunk_val FROM sig"
        for c in range(SIMHASH_CHUNKS)
    )
    return f"""
    WITH {simhash_oracle_sig_cte(table)},
    chunks AS ({chunk_selects}),
    cand AS (
        SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
        FROM chunks x JOIN chunks y
          ON x.chunk = y.chunk AND x.chunk_val = y.chunk_val AND x.doc_id < y.doc_id
    )
    SELECT a, b, bit_count(xor(sa.simhash, sb.simhash)) AS hamming
    FROM cand JOIN sig sa ON sa.doc_id = a JOIN sig sb ON sb.doc_id = b
    WHERE bit_count(xor(sa.simhash, sb.simhash)) <= {max_hamming}
    """


# --- dup-pair clustering (connected components) ------------------------------


def connected_components(
    edges: DataFrame,
    src: str = "a",
    dst: str = "b",
    max_iter: int = 30,
    strict: bool = True,
) -> DataFrame:
    """(node, component) over an undirected edge list, component = min node
    id in the connected component — how a dedup pipeline collapses near-dup
    PAIRS into clusters and elects the canonical (min-id) document.

    Algorithm: min-label propagation fused with pointer jumping
    (comp := min(comp, min neighbor comp, comp(comp))) — the hash-to-min
    family; pointer jumping halves chain depth each round so convergence is
    O(log diameter), not O(diameter). Each round is three key shuffles over
    (node, comp) pairs — never the documents — and one scalar aggregate for
    the convergence test (label sums are monotone decreasing and strictly
    decrease until fixpoint; summed in DECIMAL(38,0) so 10^11 nodes with
    10^11 ids cannot overflow). localCheckpoint truncates each round's
    lineage — iterative plans otherwise grow superlinearly and replan from
    scratch every round; at cluster scale swap for checkpoint() on durable
    storage so executor loss cannot force recomputation through dead rounds.
    """
    from pyspark.sql import Observation

    e = edges.select(F.col(src).cast("long").alias("x"), F.col(dst).cast("long").alias("y"))
    e = e.union(e.select(F.col("y").alias("x"), F.col("x").alias("y"))).distinct().localCheckpoint()
    # the convergence sum rides as an OBSERVATION on the job that
    # materializes each round's checkpoint — one executed job per round
    # instead of two (checkpoint + separate collect; r15 opt — the
    # per-round driver sync halves, which is the whole fixed cost of the
    # loop on small graphs)
    obs0 = Observation()
    labels = (
        e.select(F.col("x").alias("node")).distinct().withColumn("comp", F.col("node"))
    ).observe(obs0, F.sum(F.col("comp").cast("decimal(38,0)")).alias("s")).localCheckpoint()
    old_sum = obs0.get["s"]
    converged = False
    for _ in range(max_iter):
        nbr = (
            e.join(labels, e.x == labels.node)
            .groupBy(F.col("y").alias("nbr_node"))
            .agg(F.min("comp").alias("nbr_comp"))
        )
        stepped = labels.join(nbr, labels.node == nbr.nbr_node, "left").select(
            "node", F.least(F.col("comp"), F.coalesce("nbr_comp", F.col("comp"))).alias("comp")
        )
        ptr = stepped.select(F.col("node").alias("p_node"), F.col("comp").alias("p_comp"))
        obs = Observation()
        labels = (
            stepped.join(ptr, stepped.comp == ptr.p_node, "left")
            .select(
                "node",
                F.least(F.col("comp"), F.coalesce("p_comp", F.col("comp"))).alias("comp"),
            )
            .observe(obs, F.sum(F.col("comp").cast("decimal(38,0)")).alias("s"))
            .localCheckpoint()
        )
        new_sum = obs.get["s"]
        if new_sum == old_sum:
            converged = True
            break
        old_sum = new_sum
    if not converged:
        # Partial labels silently returned here would split real components —
        # a correctness trap at scale. Fail loudly (or warn when the caller
        # explicitly accepts approximate labels).
        msg = (
            f"connected_components did not converge within max_iter={max_iter} "
            "rounds; labels may still span unmerged components"
        )
        if strict:
            raise RuntimeError(msg)
        import warnings

        warnings.warn(msg, RuntimeWarning, stacklevel=2)
    return labels.select("node", F.col("comp").alias("component"))


def dedup_clusters_oracle_sql(table: str = "documents", k: int = 3) -> str:
    """Recursive-CTE transitive closure over the minhash pair graph —
    exponential-ish for the oracle's tiny graphs, exact for grading."""
    return f"""
    WITH RECURSIVE {minhash_pairs_oracle_ctes(table, k)},
    edges AS (SELECT a, b FROM pairs UNION SELECT b, a FROM pairs),
    reach(a, b) AS (
        SELECT a, b FROM edges
        UNION
        SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    )
    SELECT a AS doc_id, least(a, min(b)) AS component
    FROM reach GROUP BY a
    """


def canonical_docs(docs: DataFrame, components: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Elect one keeper per near-dup cluster: the LONGEST member (by
    n_chars, ties to the lowest id) — the usual "keep the most complete
    copy" policy, unlike the min-id election `connected_components` bakes
    into the component label.

    Scale shape: `components` holds only clustered docs (id → label pairs),
    so the join is id-to-id; the election is a map-side-combining min_by
    over a PACKED LONG key (-n_chars·2³² + id — a struct key would demote
    the aggregate to SortAggregate; primitive buffers keep it in
    HashAggregate with partial combine). Width guard: exact while
    n_chars < 2³¹ and ids < 2³² — both far above any real document.
    Singleton documents never enter the shuffle and are not in the output.
    Output: (component, keeper_id, n_members, max_chars).
    """
    members = components.join(
        docs.select(F.col(id_col).alias("node"), "n_chars"), "node"
    )
    packed = F.col("node") - F.col("n_chars") * F.lit(4294967296)
    return members.groupBy("component").agg(
        F.min_by(F.col("node"), packed).alias("keeper_id"),
        F.count(F.lit(1)).alias("n_members"),
        F.max("n_chars").alias("max_chars"),
    )


def canonical_docs_oracle_sql(table: str = "documents", k: int = 3) -> str:
    """Cluster closure + longest-member election in one recursive CTE."""
    return f"""
    WITH RECURSIVE {minhash_pairs_oracle_ctes(table, k)},
    edges AS (SELECT a, b FROM pairs UNION SELECT b, a FROM pairs),
    reach(a, b) AS (
        SELECT a, b FROM edges
        UNION
        SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    ),
    comp AS (
        SELECT a AS doc_id, least(a, min(b)) AS component FROM reach GROUP BY a
    ),
    member AS (
        SELECT c.component, c.doc_id, d.n_chars,
               row_number() OVER (
                   PARTITION BY c.component ORDER BY d.n_chars DESC, c.doc_id ASC
               ) AS rn
        FROM comp c JOIN {table} d ON d.doc_id = c.doc_id
    )
    SELECT component,
           max(CASE WHEN rn = 1 THEN doc_id END) AS keeper_id,
           count(*) AS n_members,
           max(n_chars) AS max_chars
    FROM member GROUP BY component
    """
