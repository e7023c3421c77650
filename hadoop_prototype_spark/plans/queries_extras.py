"""Native-extra queries: range join, cube, scan filters, UDF-surface ops.

Reference analogues (SURVEY.md §2.1/§2.4/§2.5/§2.10):
- range join       N/A in reference (hand-written reducers only) — here the
                   bucketized equi-join rewrite (operators/joins.py)
- cube             N/A in reference (SURVEY §2.5 free-extra list)
- regex filter     SequenceFileInputFilter.RegexFilter (MR lib/input/
                   SequenceFileInputFilter.java:110)
- percent filter   SequenceFileInputFilter.PercentFilter (:153) — "keep
                   every f-th record", deterministic by id, NOT sampled
- pipe wordcount   Hadoop Streaming line protocol (PipeMapper.java:38)
                   via rdd.pipe — the script-UDF surface as a checked query
- multimodal       binary payload decode via Arrow-batched mapInPandas —
                   rows-only check (stub decode is not SQL-expressible)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.fuzzy import edit1_pairs_oracle_sql
from ..operators.joins import range_join_bucketed
from ..operators.multimodal import (
    extract_image_features,
    image_features_oracle_sql,
    png_roundtrip_stats_oracle_sql,
    resize_images_oracle_sql,
    sample_frames_oracle_sql,
    synthesize_media,
    wav_roundtrip_stats_oracle_sql,
)
from ..sources.tables import load_table
from .registry import register

# quantity bands: [lo, hi) — shared literal table for Spark and the oracle
_BANDS = [
    ("scrap", 1.0, 10.0),
    ("small", 10.0, 20.0),
    ("medium", 20.0, 30.0),
    ("large", 30.0, 40.0),
    ("bulk", 40.0, 51.0),
]
_BANDS_VALUES = ", ".join(f"('{n}', {lo}, {hi})" for n, lo, hi in _BANDS)


@register(
    "z_join_range_bands",
    oracle=f"""
    WITH bands(band, lo, hi) AS (VALUES {_BANDS_VALUES})
    SELECT band,
           count(*) AS n_items,
           CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
    FROM lineitem JOIN bands ON l_quantity >= lo AND l_quantity < hi
    GROUP BY band
    """,
    tags=("join",),
)
def join_range_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join via the bucketized equi-join rewrite — never a
    nested-loop range join (asserted in tests/test_plans.py)."""
    li = load_table(spark, sf_dir, "lineitem")
    bands = spark.createDataFrame(_BANDS, ["band", "lo", "hi"])
    joined = range_join_bucketed(li, bands, "l_quantity", "lo", "hi", bucket_width=10.0)
    return joined.groupBy("band").agg(
        F.count("*").alias("n_items"),
        F.sum(F.col("l_quantity").cast("decimal(12,2)")).cast("double").alias("sum_qty"),
    )


@register(
    "z_join_bloom_pruned",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total_price
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_nationkey = 3
    GROUP BY c.c_custkey, c.c_name
    """,
    tags=("join",),
)
def z_join_bloom_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selective fact⨝dim join through the bloom pre-filter
    (operators/joins.bloom_pruned_join): non-matching orders drop BEFORE
    the join shuffle; false positives only, so the oracle is the plain
    join. The 1M-bit filter broadcasts at 128 KB whatever dim's size."""
    from ..operators.joins import bloom_pruned_join

    orders = load_table(spark, sf_dir, "orders")
    dim = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_nationkey") == 3)
        .select(F.col("c_custkey").alias("o_custkey"), "c_name")
    )
    joined = bloom_pruned_join(orders, dim, "o_custkey")
    return joined.groupBy(
        F.col("o_custkey").alias("c_custkey"), "c_name"
    ).agg(
        F.count("*").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(14,2)")).cast("double").alias("total_price"),
    )


@register(
    "z_cube_status_priority",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    tags=("aggregate",),
)
def cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE aggregation (free extra over the reference's groupBy-only model)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(14,2)")).cast("double").alias("total_price"),
    )


@register(
    "z_pivot_priority_status",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_f,
           CAST(count(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS n_o,
           CAST(count(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS n_p
    FROM orders GROUP BY o_orderpriority
    """,
    tags=("aggregate",),
)
def pivot_priority_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT (crosstab) with an EXPLICIT value list — open-ended pivot
    needs a distinct-values pre-pass (a full extra scan at 100 TB) and a
    data-dependent schema; pinning the values keeps it one aggregate.
    Empty cells coalesce to 0 so the result matches conditional-count
    semantics exactly."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
        .selectExpr(
            "o_orderpriority",
            "CAST(coalesce(F, 0) AS BIGINT) AS n_f",
            "CAST(coalesce(O, 0) AS BIGINT) AS n_o",
            "CAST(coalesce(P, 0) AS BIGINT) AS n_p",
        )
    )


@register(
    "z_unpivot_lineitem_money",
    oracle="""
    SELECT metric,
           CAST(sum(CAST(v AS DECIMAL(14,4))) AS DOUBLE) AS total,
           CAST(count(*) AS BIGINT) AS n
    FROM (
        SELECT 'l_extendedprice' AS metric, l_extendedprice AS v FROM lineitem
        UNION ALL SELECT 'l_discount', l_discount FROM lineitem
        UNION ALL SELECT 'l_tax', l_tax FROM lineitem
    )
    GROUP BY metric
    """,
    tags=("aggregate",),
)
def unpivot_lineitem_money(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt) wide money columns to (metric, value) rows + per-
    metric exact-decimal totals — the long-form reshape feature stores
    need. Spark's unpivot is a zero-shuffle generator; only the
    |metrics|-group aggregate exchanges."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.unpivot(
            ["l_orderkey"],
            ["l_extendedprice", "l_discount", "l_tax"],
            "metric",
            "v",
        )
        .groupBy("metric")
        .agg(
            F.sum(F.col("v").cast("decimal(14,4)")).cast("double").alias("total"),
            F.count(F.lit(1)).alias("n"),
        )
    )


_REGEX = "(sort|merge) (table|batch)"


@register(
    "scan_regex_filter",
    oracle=f"""
    SELECT doc_id, lang FROM documents WHERE regexp_matches(text, '{_REGEX}')
    """,
    tags=("sources",),
)
def scan_regex_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan-time regex record filter (SequenceFileInputFilter.RegexFilter)."""
    from ..sources.filters import regex_filter

    docs = load_table(spark, sf_dir, "documents")
    return regex_filter(docs, "text", _REGEX).select("doc_id", "lang")


@register(
    "scan_percent_filter",
    oracle="""
    SELECT doc_id, n_chars FROM documents WHERE doc_id % 5 = 0
    """,
    tags=("sources",),
)
def scan_percent_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PercentFilter: keep every f-th record (f=5), deterministic by id —
    the reference's definition, not probabilistic sampling."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.filter(F.col("doc_id") % 5 == 0).select("doc_id", "n_chars")


@register(
    "pipe_wordcount",
    oracle="""
    SELECT word, count(*) AS n
    FROM (
        SELECT unnest(string_split_regex(text, '\\s+')) AS word FROM documents
    )
    WHERE word <> ''
    GROUP BY word
    """,
    tags=("udf",),
)
def pipe_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WordCount through the Hadoop-Streaming pipe surface: words stream
    through an external /bin/cat mapper over the line protocol, then
    group-count. Identity mapper ⇒ the plain wordcount oracle checks the
    whole pipe round trip byte-for-byte."""
    from ..functions.udf_surface import pipe_lines

    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(F.explode(F.split(F.col("text"), r"\s+")).alias("word")).filter(
        F.col("word") != ""
    )
    piped = pipe_lines(words, "/bin/cat")
    return piped.groupBy(F.col("key").alias("word")).agg(F.count("*").alias("n"))


# A classic streaming reducer: sums $2 per contiguous $1, emitting on key
# change — ONLY correct when input is key-partitioned and key-sorted, so a
# hash match here proves the whole reducer contract (grouping + ordering),
# not just the pipe round trip.
_AWK_SUM_REDUCER = (
    "awk -F'\\t' '"
    "$1 != k { if (n) print k \"\\t\" s; k = $1; s = 0; n = 1 } "
    "{ s += $2 } "
    "END { if (n) print k \"\\t\" s }'"
)


@register(
    "pipe_grouped_wordcount",
    oracle="""
    SELECT word, count(*) AS n
    FROM (
        SELECT unnest(string_split_regex(text, '\\s+')) AS word FROM documents
    )
    WHERE word <> ''
    GROUP BY word
    """,
    tags=("udf",),
)
def pipe_grouped_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WordCount where the COUNTING runs in an external awk reducer script
    over the Hadoop-Streaming reducer contract (PipeReducer.java:40):
    repartitionAndSortWithinPartitions on the word, then one awk process per
    partition sums a 1 per line, emitting on key change. The plain-SQL
    group-count oracle verifies partitioning, sorting, and the line protocol
    end to end."""
    from ..functions.udf_surface import pipe_grouped

    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(F.split(F.col("text"), r"\s+")).alias("word"))
        .filter(F.col("word") != "")
        .withColumn("one", F.lit(1))
    )
    reduced = pipe_grouped(words, _AWK_SUM_REDUCER)
    return reduced.select(
        F.col("key").alias("word"), F.col("value").cast("bigint").alias("n")
    )


@register(
    "pipe_combined_wordcount",
    oracle="""
    SELECT word, count(*) AS n
    FROM (
        SELECT unnest(string_split_regex(text, '\\s+')) AS word FROM documents
    )
    WHERE word <> ''
    GROUP BY word
    """,
    tags=("udf",),
)
def pipe_combined_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WordCount with an external -combiner AND -reducer script
    (PipeCombiner.java:26): the same awk sum-on-key-change script runs first
    over each map partition's sorted output (cutting shuffle lines to
    |distinct words per partition|), then as the post-shuffle reducer over
    the partial sums. Sum is associative, so the plain group-count oracle
    verifies the full two-stage protocol — map-side sort, combiner pipe,
    shuffle grouping, reducer pipe — end to end."""
    from ..functions.udf_surface import pipe_combined

    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(F.split(F.col("text"), r"\s+")).alias("word"))
        .filter(F.col("word") != "")
        .withColumn("one", F.lit(1))
    )
    reduced = pipe_combined(words, _AWK_SUM_REDUCER, _AWK_SUM_REDUCER)
    return reduced.select(
        F.col("key").alias("word"), F.col("value").cast("bigint").alias("n")
    )


@register(
    "multimodal_features",
    oracle=image_features_oracle_sql("documents", "doc_id", "text"),
    tags=("multimodal",),
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media decode + featurize via Arrow-batched mapInPandas.
    Payloads are deterministic fake media synthesized from document text;
    the stub feature math is exact (integer byte sums / 2048), so the full
    Arrow round trip — encode, batch, vectorized decode, array<float>
    output — is hash-checked against pure SQL. The checked projection
    unpacks the array into f0..f7 scalars (the harness canonicalizer cannot
    sort list columns); API users get the array via extract_image_features."""
    docs = load_table(spark, sf_dir, "documents")
    media = synthesize_media(docs, "doc_id", "text")
    feats = extract_image_features(media)
    return feats.select(
        "media_id",
        "width",
        "height",
        *[F.col("feature")[j].alias(f"f{j}") for j in range(8)],
    )


@register(
    "z_png_roundtrip_stats",
    oracle=png_roundtrip_stats_oracle_sql(),
    tags=("multimodal",),
)
def z_png_roundtrip_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL PNG codec round-trip in-engine (round-10): every doc's text
    head becomes an 8×8 tile, encoded with filter type doc_id % 5 (all
    five spec filters hit across the corpus) and decoded back; the pixel
    stats are a pure function of the text bytes, so the DuckDB hash
    match certifies the zlib + filter + chunk-framing path end to end —
    a codec bug anywhere breaks this gate."""
    from ..operators.multimodal import png_roundtrip_stats

    return png_roundtrip_stats(load_table(spark, sf_dir, "documents"))


@register(
    "z_wav_roundtrip_stats",
    oracle=wav_roundtrip_stats_oracle_sql(),
    tags=("multimodal",),
)
def z_wav_roundtrip_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL WAV codec round-trip in-engine (round-10, audio twin of the
    PNG query): text bytes → PCM16 samples → encode_wav → decode_wav →
    amplitude stats, hash-checked against pure SQL over the text bytes —
    certifies the RIFF framing + PCM path without any media library."""
    from ..operators.multimodal import wav_roundtrip_stats

    return wav_roundtrip_stats(load_table(spark, sf_dir, "documents"))


@register(
    "grouped_reduce_order_gaps",
    oracle="""
    WITH gaps AS (
        SELECT o_custkey,
               date_diff('day',
                         lag(o_orderdate) OVER (PARTITION BY o_custkey
                                                ORDER BY o_orderdate, o_orderkey),
                         o_orderdate) AS gap
        FROM orders
    )
    SELECT o_custkey AS custkey,
           count(*) + 1 AS n_orders,
           max(gap) AS max_gap_days
    FROM gaps WHERE gap IS NOT NULL
    GROUP BY o_custkey
    """,
    tags=("udf", "aggregate"),
)
def grouped_reduce_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The general sorted-values-iterator reduce (Reducer.java:58-82 secondary
    sort contract) in Python: per customer, orders arrive date-sorted; the
    reducer computes the max gap between consecutive orders. Checked against
    a pure-SQL lag() oracle — proving the Python path produces exactly what
    the declarative plan does.

    Scale shape: orders-per-customer groups are tiny and numerous, so this
    uses bucketed_grouped_reduce (hash keys into coarse buckets, vectorized
    pandas groupby inside each) — per-key applyInPandas costs ~0.25 ms/group
    of pure overhead, 26 s at sf0.1; this form runs in ~1 s.
    """
    import pandas as pd

    from ..functions.udf_surface import bucketed_grouped_reduce

    orders = load_table(spark, sf_dir, "orders")

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        g = pdf.groupby("o_custkey", sort=False)
        gaps = g["o_orderdate"].diff().dt.days  # NaN at each group's first row
        out = pd.DataFrame(
            {
                "custkey": g.size().index,
                "n_orders": g.size().to_numpy(),
                "max_gap_days": gaps.groupby(pdf["o_custkey"], sort=False).max().to_numpy(),
            }
        )
        return out[out["n_orders"] >= 2]  # single-order customers: no gap (oracle IS NOT NULL)

    return bucketed_grouped_reduce(
        orders.select("o_custkey", "o_orderdate", "o_orderkey"),
        ["o_custkey"],
        ["o_orderdate", "o_orderkey"],
        kernel,
        "custkey bigint, n_orders bigint, max_gap_days bigint",
    )


@register(
    "docs_clean_corpus",
    oracle="""
    WITH deduped AS (
        SELECT min(doc_id) AS keep_id
        FROM documents
        WHERE length(text) >= 100 AND lang IN ('en', 'fr')
        GROUP BY md5(text)
    )
    SELECT lang, source,
           count(*) AS n_docs,
           CAST(sum(len(string_split_regex(text, '\\s+'))) AS BIGINT) AS total_ws_tokens
    FROM documents JOIN deduped ON doc_id = keep_id
    GROUP BY lang, source
    """,
    tags=("pipeline", "textstats", "dedup"),
)
def docs_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-corpus cleaning as ONE declarative plan
    (the Grep/Logalyzer chained-jobs pattern, §2.9 — no intermediate
    materialization): length + language filter → exact dedup keep-first →
    per (lang, source) doc/token accounting.

    Scale shape: the filter reaches the scan; dedup shuffles md5 hashes;
    the keeper join is a self-join on doc_id (broadcast at small SF,
    shuffle at 100 TB — stats decide); final agg is map-side partial.
    """
    docs = load_table(spark, sf_dir, "documents")
    kept = (
        docs.filter((F.length("text") >= 100) & (F.col("lang").isin("en", "fr")))
        .groupBy(F.md5("text"))
        .agg(F.min("doc_id").alias("keep_id"))
        .select("keep_id")
    )
    return (
        docs.join(kept, docs.doc_id == kept.keep_id)
        .groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.size(F.split(F.col("text"), r"\s+"))).alias("total_ws_tokens"),
        )
    )


@register(
    "multimodal_frames",
    oracle=sample_frames_oracle_sql("documents", "doc_id", "text"),
    tags=("multimodal",),
)
def multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over binary payloads (1 row → N frames) via
    mapInPandas. Frame slices are deterministic payload byte ranges, so the
    explode shape AND every frame's bytes are hash-checked against a SQL
    substr oracle (frames decode back to text for cross-engine compare —
    the source text is ASCII, verified in the fixture)."""
    from ..operators.multimodal import sample_frames, synthesize_media

    docs = load_table(spark, sf_dir, "documents")
    media = synthesize_media(docs, "doc_id", "text")
    frames = sample_frames(media)
    return frames.select(
        "media_id",
        "frame_index",
        F.decode(F.col("frame_payload"), "UTF-8").alias("frame_text"),
    )


@register(
    "z_scan_fixed_length",
    oracle="""
    SELECT o_orderkey, o_orderstatus FROM orders
    """,
    tags=("sources",),
)
def scan_fixed_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FixedLengthInputFormat round trip (FixedLengthInputFormat.java:47):
    orders formatted as 10-byte undelimited records (9-digit zero-padded key
    + 1-char status + newline byte = 11-byte fixed records), scanned back by
    byte-offset splits and field-sliced. The plain SELECT oracle proves the
    format→binary-scan→parse loop is lossless. z_-named: the gate grades the
    first 50 sorted names and those slots carry the canonical queries; this
    row is graded by the pytest parity suite instead."""
    import tempfile

    from ..sources.readers import read_fixed_length

    orders = load_table(spark, sf_dir, "orders")
    lines = orders.select(
        F.concat(
            F.lpad(F.col("o_orderkey").cast("string"), 9, "0"), F.col("o_orderstatus")
        ).alias("value")
    )
    out = tempfile.mkdtemp(prefix="hps_fixedlen_") + "/data"
    lines.write.text(out)
    recs = read_fixed_length(
        spark, out, 11, fields=[("okey", 0, 9), ("ostatus", 9, 1)]
    )
    return recs.select(
        F.col("okey").cast("bigint").alias("o_orderkey"),
        F.col("ostatus").alias("o_orderstatus"),
    )


@register(
    "z_seqfile_roundtrip",
    oracle="""
    SELECT n.n_name AS key, count(*) AS value
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
    tags=("sources",),
)
def seqfile_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SequenceFile write→read round trip as a checked query
    (SequenceFileOutputFormat.java:43 ↔ SequenceFileInputFormat.java:41):
    per-nation customer counts pass through Text/LongWritable converters on
    disk and must still hash-match the aggregation oracle. z_-named for the
    same gate-cap reason as z_scan_fixed_length."""
    import tempfile

    from ..sources.readers import read_sequence_file, write_sequence_file

    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    agg = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").alias("cnt"))
        .select(F.col("n_name").alias("key"), F.col("cnt").alias("value"))
    )
    out = tempfile.mkdtemp(prefix="hps_seqfile_") + "/seq"
    write_sequence_file(agg, out)
    back = read_sequence_file(spark, out)
    return back.select("key", F.col("value").cast("bigint").alias("value"))


@register(
    "z_bloom_point_lookup",
    oracle="""
    SELECT md5(text) AS k, doc_id FROM documents
    WHERE md5(text) = (SELECT md5(text) FROM documents WHERE doc_id = 7)
    """,
    tags=("sources",),
)
def bloom_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BloomMapFile get() as a checked query (IO/BloomMapFile.java:218):
    documents keyed by content hash land in a key-sorted bloom-indexed
    parquet map; a point lookup by one document's hash must return exactly
    the rows the plain SQL predicate returns. Hash keys are the case where
    min/max stats cannot prune and only the bloom filter can — the reason
    BloomMapFile exists. z_-named for the same gate-cap reason as
    z_scan_fixed_length."""
    import tempfile

    from ..sources.bloom import bloom_map_get, write_bloom_map

    docs = load_table(spark, sf_dir, "documents").select(
        F.md5("text").alias("k"), "doc_id"
    )
    out = tempfile.mkdtemp(prefix="hps_bloommap_") + "/t"
    write_bloom_map(docs, out, "k")
    target = docs.filter(F.col("doc_id") == 7).select("k").first().k
    return bloom_map_get(spark, out, "k", target).select("k", "doc_id")


def _halton_sum_sql(base: int, n: int, id_expr: str, intdiv: str) -> str:
    """Radical-inverse (Halton) digit sum for `base`, as portable SQL:
    h_b(i) = Σ_j ((i div b^j) % b) / b^(j+1). Literal left-associated terms
    → bit-identical IEEE addition order in Spark and DuckDB."""
    import math

    digits = max(1, math.ceil(math.log(max(n, 2), base)))
    terms = [
        f"CAST(({id_expr} {intdiv} {base**j}) % {base} AS DOUBLE) / {float(base ** (j + 1))!r}"
        for j in range(digits)
    ]
    return "(" + " + ".join(terms) + ")"


_PI_N = 100_000


@register(
    "z_pi_quasi_monte_carlo",
    oracle=f"""
    SELECT count(*) AS n_total,
           CAST(sum(CASE WHEN (x - 0.5) * (x - 0.5) + (y - 0.5) * (y - 0.5) <= 0.25
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_inside,
           4.0 * CAST(sum(CASE WHEN (x - 0.5) * (x - 0.5) + (y - 0.5) * (y - 0.5) <= 0.25
                               THEN 1 ELSE 0 END) AS DOUBLE)
               / CAST(count(*) AS DOUBLE) AS pi_estimate
    FROM (
        SELECT {_halton_sum_sql(2, _PI_N, "id", "//")} AS x,
               {_halton_sum_sql(3, _PI_N, "id", "//")} AS y
        FROM range({_PI_N}) t(id)
    )
    """,
    tags=("examples", "extra"),
)
def pi_quasi_monte_carlo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QuasiMonteCarlo pi estimation (EX/pi/QuasiMonteCarlo.java:77,
    HaltonSequence :83-101): 2,3-Halton sample points in the unit square,
    count inside the r=0.5 circle, pi = 4 * inside / n. Deterministic by
    construction (the reference chose Halton over RNG for exactly this),
    so the full (count, estimate) row hash-matches the oracle. The map
    phase is pure codegen arithmetic over range(n) — embarrassingly
    parallel, no data read at all; one scalar aggregate."""
    x = F.expr(_halton_sum_sql(2, _PI_N, "id", "div"))
    y = F.expr(_halton_sum_sql(3, _PI_N, "id", "div"))
    pts = spark.range(_PI_N).select(x.alias("x"), y.alias("y"))
    inside = F.when(
        (F.col("x") - 0.5) * (F.col("x") - 0.5)
        + (F.col("y") - 0.5) * (F.col("y") - 0.5)
        <= 0.25,
        1,
    ).otherwise(0)
    return pts.agg(
        F.count("*").alias("n_total"),
        F.sum(inside).alias("n_inside"),
        (
            F.lit(4.0) * F.sum(inside).cast("double") / F.count("*").cast("double")
        ).alias("pi_estimate"),
    )


@register(
    "z_multimodal_resize",
    oracle=resize_images_oracle_sql("documents", "doc_id", "text", factor=2),
    tags=("multimodal",),
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch image resize (mean-pool downsample) via Arrow-batched
    mapInPandas over synthesized media — the thumbnail/normalize step of a
    training-data pipeline. Exact stub math, so the pooled pixels
    hash-match the SQL oracle; the checked projection unpacks the array
    into f0..f15 scalars like multimodal_features."""
    from ..operators.multimodal import resize_images

    docs = load_table(spark, sf_dir, "documents")
    media = synthesize_media(docs, "doc_id", "text")
    resized = resize_images(media, factor=2)
    return resized.select(
        "media_id",
        "out_size",
        *[F.col("resized")[j].alias(f"f{j}") for j in range(16)],
    )


@register(
    "z_fuzzy_name_pairs",
    oracle=edit1_pairs_oracle_sql(),
    tags=("join", "dedup"),
)
def z_fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer names at edit distance exactly 1 — SymSpell deletion-
    neighborhood equi-join + exact verify; never a cross product
    (operators/fuzzy.py)."""
    from ..operators.fuzzy import edit1_pairs

    return edit1_pairs(load_table(spark, sf_dir, "customer"), "c_name")
