"""Text analysis operators for training-data pipelines.

Beyond the reference (which has no scalar-function library — SURVEY.md
§2.3): language-ID, quality scoring, token counting, and document
fingerprinting over a `text` column. All pure Column expressions — no
Python UDFs — so they run inside whole-stage codegen and scale linearly
with executors; per-document cost is O(len(text)).

Determinism: ratios divide exact integer counts as doubles; the
fingerprint is an md5-based polynomial fold (functions/hashing.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import fold_hash, fold_hash_sql, md5_int, md5_int_sql

# Marker vocabularies for the n-gram/stopword language heuristic. The test
# corpus is a synthetic tech-word soup; real deployments swap these for real
# stopword lists — the operator shape (per-language token-set hit counts +
# deterministic argmax) is what matters.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "und", "merge", "window", "batch"),
    "en": ("the", "a", "fast", "key", "order"),
    "es": ("el", "la", "data", "row", "column"),
    "fr": ("le", "et", "table", "part", "value"),
    "zh": ("de", "shi", "query", "scan", "join"),
}

STOPWORDS = ("the", "a", "of", "and", "to", "in")

BPE_ISH_PATTERN = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"

PUNCT_PATTERN = r"[^a-z0-9\s]"


def _words(text: Column) -> Column:
    return F.split(text, r"\s+")


def token_counts(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace token count + BPE-ish regex token count per document."""
    text = F.col(text_col)
    return df.select(
        F.col(id_col),
        F.size(_words(text)).alias("ws_tokens"),
        F.size(F.regexp_extract_all(text, F.lit(BPE_ISH_PATTERN), 0)).alias("bpe_tokens"),
    )


def quality_scores(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality features: length, mean word length, stopword ratio,
    punctuation ratio, and a blended [0,1] score."""
    text = F.col(text_col)
    words = _words(text)
    n_words = F.size(words)
    sum_len = F.aggregate(
        F.transform(words, lambda w: F.length(w)), F.lit(0).cast("long"), lambda a, x: a + x
    )
    n_stop = F.size(F.filter(words, lambda w: w.isin(*STOPWORDS)))
    n_punct = F.size(F.regexp_extract_all(text, F.lit(PUNCT_PATTERN), 0))
    n_chars = F.length(text)
    nw = n_words.cast("double")
    mean_word_len = sum_len.cast("double") / nw
    stop_ratio = n_stop.cast("double") / nw
    punct_ratio = n_punct.cast("double") / n_chars.cast("double")
    quality = (
        F.least(nw / F.lit(100.0), F.lit(1.0)) * 0.3
        + (F.lit(1.0) - punct_ratio) * 0.4
        + stop_ratio * 0.3
    )
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_words.alias("n_words"),
        mean_word_len.alias("mean_word_len"),
        stop_ratio.alias("stop_ratio"),
        punct_ratio.alias("punct_ratio"),
        quality.alias("quality"),
    )


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Language ID by marker-token hit counts; deterministic argmax
    (ties broken by language code order)."""
    words = _words(F.col(text_col))

    def _marker_count(markers: tuple[str, ...]) -> Column:
        # NB: the lambda must take exactly one arg — F.filter treats a second
        # parameter as the element index.
        return F.size(F.filter(words, lambda w: w.isin(*markers)))

    score_cols = {lang: _marker_count(m) for lang, m in sorted(LANG_MARKERS.items())}
    scored = df.select(
        F.col(id_col), *[c.alias(f"score_{lang}") for lang, c in score_cols.items()]
    )
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[F.col(f"score_{la}") for la in langs])
    pred = F.lit(None).cast("string")
    # first language (alphabetical) reaching the max wins — build CASE chain
    expr = None
    for la in langs:
        cond = F.col(f"score_{la}") == best
        expr = F.when(cond, F.lit(la)) if expr is None else expr.when(cond, F.lit(la))
    pred = expr
    return scored.select(id_col, pred.alias("pred_lang"), best.alias("score"))


def fingerprints(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Document fingerprint: polynomial fold over per-word md5 hashes —
    order-sensitive (anagram documents get different prints), rolling-hash
    style, engine-portable."""
    words = _words(F.col(text_col))
    hashed = F.transform(words, lambda w: md5_int(w, 8))
    return df.select(F.col(id_col), fold_hash(hashed).alias("fingerprint"))


# --- DuckDB oracle generators (same parameters, same semantics) -----------


def token_counts_oracle_sql(table: str = "documents") -> str:
    return f"""
    SELECT doc_id,
           len(string_split_regex(text, '\\s+')) AS ws_tokens,
           len(regexp_extract_all(text, '{BPE_ISH_PATTERN}')) AS bpe_tokens
    FROM {table}
    """


def quality_scores_oracle_sql(table: str = "documents") -> str:
    stop_list = ", ".join(f"'{w}'" for w in STOPWORDS)
    return f"""
    WITH w AS (
        SELECT doc_id, text, string_split_regex(text, '\\s+') AS words FROM {table}
    )
    SELECT doc_id,
           length(text) AS n_chars,
           len(words) AS n_words,
           CAST(list_reduce(list_prepend(0::BIGINT, list_transform(words, x -> length(x)::BIGINT)), (a,b) -> a + b) AS DOUBLE)
               / CAST(len(words) AS DOUBLE) AS mean_word_len,
           CAST(len(list_filter(words, x -> x IN ({stop_list}))) AS DOUBLE)
               / CAST(len(words) AS DOUBLE) AS stop_ratio,
           CAST(len(regexp_extract_all(text, '{PUNCT_PATTERN}')) AS DOUBLE)
               / CAST(length(text) AS DOUBLE) AS punct_ratio,
           least(CAST(len(words) AS DOUBLE) / 100.0, 1.0) * 0.3
             + (1.0 - CAST(len(regexp_extract_all(text, '{PUNCT_PATTERN}')) AS DOUBLE)
                      / CAST(length(text) AS DOUBLE)) * 0.4
             + CAST(len(list_filter(words, x -> x IN ({stop_list}))) AS DOUBLE)
                      / CAST(len(words) AS DOUBLE) * 0.3 AS quality
    FROM w
    """


def lang_id_oracle_sql(table: str = "documents") -> str:
    langs = sorted(LANG_MARKERS)
    score_exprs = []
    for la in langs:
        markers = ", ".join(f"'{m}'" for m in LANG_MARKERS[la])
        score_exprs.append(f"len(list_filter(words, x -> x IN ({markers}))) AS score_{la}")
    best = "greatest(" + ", ".join(f"score_{la}" for la in langs) + ")"
    case = "CASE " + " ".join(f"WHEN score_{la} = best THEN '{la}'" for la in langs) + " END"
    return f"""
    WITH w AS (
        SELECT doc_id, string_split_regex(text, '\\s+') AS words FROM {table}
    ), s AS (
        SELECT doc_id, {', '.join(score_exprs)} FROM w
    ), b AS (
        SELECT doc_id, {best} AS best, * FROM s
    )
    SELECT doc_id, {case} AS pred_lang, best AS score FROM b
    """


def fingerprints_oracle_sql(table: str = "documents") -> str:
    hashed = (
        "list_transform(string_split_regex(text, '\\s+'), w -> "
        + md5_int_sql("w", 8)
        + ")"
    )
    return f"SELECT doc_id, {fold_hash_sql(hashed)} AS fingerprint FROM {table}"
