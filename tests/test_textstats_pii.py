"""PII scrubbing and repetition stats on crafted fixtures.

The synthetic documents corpus contains no real PII, so the oracle-parity
test alone never exercises a redaction; these fixtures do.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_prototype_spark.operators import textstats


def _df(spark, rows):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], "doc_id long, text string"
    )


def test_pii_scrub_redacts_all_three_kinds(spark):
    df = _df(
        spark,
        [
            "contact alice.smith+x@example.co.uk or bob@sub.domain.org today",
            "server at 10.0.255.3 answered, backup at 192.168.1.1 did not",
            "call +1 (555) 123-4567 or +44 20 7946 0958 now",
            "nothing sensitive here",
        ],
    )
    out = {r.doc_id: r for r in textstats.pii_scrub(df).collect()}
    assert (out[0].n_emails, out[0].n_ips, out[0].n_phones) == (2, 0, 0)
    assert (out[1].n_emails, out[1].n_ips, out[1].n_phones) == (0, 2, 0)
    assert (out[2].n_emails, out[2].n_ips, out[2].n_phones) == (0, 0, 2)
    assert (out[3].n_emails, out[3].n_ips, out[3].n_phones) == (0, 0, 0)


def test_pii_scrub_replaces_text_not_just_counts(spark):
    df = _df(spark, ["mail a@b.io from 1.2.3.4"])
    scrubbed = (
        df.select(
            F.regexp_replace(
                F.regexp_replace("text", textstats.PII_EMAIL, "<EMAIL>"),
                textstats.PII_IPV4,
                "<IP>",
            ).alias("s")
        )
        .first()
        .s
    )
    assert scrubbed == "mail <EMAIL> from <IP>"
    # operator's md5 corresponds to the same scrubbed string
    row = textstats.pii_scrub(df).first()
    assert row.scrubbed_len == len(scrubbed)


def test_repetition_ratios(spark):
    df = _df(
        spark,
        [
            "a b c d",          # all unique: 0 dup words, 0 dup bigrams
            "a a a a",          # 3/4 dup words, 2/3 dup bigrams
            "x y x y x",        # dup bigrams: [x y, y x, x y, y x] → 2/4
            "solo",             # single word: no bigrams, ratios 0
        ],
    )
    out = {r.doc_id: r for r in textstats.repetition_stats(df).collect()}
    assert out[0].dup_word_ratio == 0.0 and out[0].dup_bigram_ratio == 0.0
    assert abs(out[1].dup_word_ratio - 0.75) < 1e-12
    assert abs(out[1].dup_bigram_ratio - 2 / 3) < 1e-12
    assert abs(out[2].dup_bigram_ratio - 0.5) < 1e-12
    assert out[3].n_words == 1
    assert out[3].dup_bigram_ratio == 0.0
    # Gopher-style top-n-gram dominance shares
    assert abs(out[0].top_bigram_share - 1 / 3) < 1e-12  # all distinct
    assert abs(out[0].top_trigram_share - 0.5) < 1e-12
    assert out[1].top_bigram_share == 1.0  # "a a" fills every slot
    assert out[1].top_trigram_share == 1.0
    assert abs(out[2].top_bigram_share - 0.5) < 1e-12  # "x y" 2 of 4
    assert abs(out[2].top_trigram_share - 2 / 3) < 1e-12  # "x y x" 2 of 3
    assert out[3].top_bigram_share == 0.0 and out[3].top_trigram_share == 0.0


def test_quality_scores_empty_document_no_divide_by_zero(spark):
    """An empty document (real at scale: fully stripped by upstream span
    dedup) must score, not abort the job under ANSI division — and the
    DuckDB oracle must produce the identical row."""
    import duckdb

    import pytest

    from hadoop_prototype_spark.operators.textstats import (
        quality_scores,
        quality_scores_oracle_sql,
    )

    df = spark.createDataFrame([(7, ""), (8, "the data table")], ["doc_id", "text"])
    got = {r.doc_id: r for r in quality_scores(df).collect()}
    assert got[7].punct_ratio == 0.0 and got[7].n_chars == 0
    # split('') yields one empty token (repo-wide convention), so the
    # length term is 1/100*0.3; punct term is the guarded (1-0)*0.4
    assert got[7].quality == pytest.approx(0.403)

    sql = quality_scores_oracle_sql("(SELECT 7 AS doc_id, '' AS text) t")
    row = duckdb.connect().execute(sql).fetchone()
    spark_row = got[7]
    assert row[0] == 7
    for i, col in enumerate(
        ["doc_id", "n_chars", "n_words", "mean_word_len", "stop_ratio", "punct_ratio", "quality"]
    ):
        assert float(row[i]) == float(spark_row[col]), col


def test_token_diversity_hand_checkable(spark):
    """Simpson repeat probability and TTR on hand-computable docs; the
    n=1 guard returns 0 rather than dividing by zero."""
    import pytest

    from hadoop_prototype_spark.operators.textstats import token_diversity

    docs = spark.createDataFrame(
        [
            (1, "a a a a"),          # all same: simpson = 1, ttr = 1/4
            (2, "a b c d"),          # all distinct: simpson = 0, ttr = 1
            (3, "a a b b"),          # 2+2: (2+2)/(4*3) = 1/3
            (4, "solo"),             # n=1: guarded
        ],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r for r in token_diversity(docs).collect()}
    assert got[1].simpson == 1.0 and got[1].ttr == 0.25
    assert got[2].simpson == 0.0 and got[2].ttr == 1.0
    assert got[3].simpson == pytest.approx(1 / 3)
    assert got[4].simpson == 0.0 and got[4].n_tokens == 1


def test_strip_markup_on_real_html(spark):
    """The synthetic corpus has no markup, so the oracle-parity run alone
    never exercises a strip; this fixture does — script/style/comment
    removal, tag stripping, entity decode order, whitespace collapse,
    idempotence."""
    html = (
        "<html><head><style>body { color: red; }</style>"
        "<script type='text/js'>if (a < b) { alert('hi'); }</script></head>"
        "<body><!-- nav\n bar --><h1>Title</h1>\n"
        "<p>A &amp;amp; B &lt;tag&gt; &quot;q&quot; &#39;s&#39;&nbsp;end</p>"
        "</body></html>"
    )
    df = _df(spark, [html, "plain text stays", ""])
    out = {r.doc_id: r for r in textstats.strip_markup(df).collect()}
    assert out[0].clean_text == 'Title A &amp; B <tag> "q" \'s\' end'
    assert out[1].clean_text == "plain text stays"
    assert out[2].clean_text == ""
    assert out[0].n_chars_raw == len(html)
    assert out[0].n_chars_clean == len(out[0].clean_text)

    # idempotent: cleaning cleaned text changes nothing (note &amp;amp;
    # decodes ONE level per pass by design — matches the oracle exactly)
    once = textstats.strip_markup(df).selectExpr("doc_id", "clean_text AS text")
    twice = {r.doc_id: r.clean_text for r in textstats.strip_markup(once).collect()}
    assert twice[1] == out[1].clean_text and twice[2] == out[2].clean_text
