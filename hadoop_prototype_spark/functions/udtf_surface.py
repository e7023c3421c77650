"""Python UDTF surface (table functions — the 1→N row half of the
reference's Mapper contract, SURVEY.md §2.10).

A reference Mapper is simultaneously a scalar function (1→1), a filter
(1→0..1) and a TABLE function (1→N rows via multiple context.write calls
— e.g. the tokenizer in EX/WordCount.java:36 emits one record per word).
The DataFrame surface covers 1→N with explode()/mapInPandas; Spark 4's
native Python UDTFs add the missing LATERAL-join form usable from SQL:
``SELECT t.* FROM docs, LATERAL split_records(docs.text) t``.

UDTFs here are row-at-a-time Python — the slow path by design (registry
doc: hot paths stay codegen). They exist for API-surface parity and for
logic that genuinely needs per-row Python with multi-row output; the
tokenize example has a codegen twin (explode+split) the tests compare
against.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf


@udtf(returnType="pos int, token string")
class TokenizeUDTF:
    """One row per whitespace token with its position — the WordCount
    mapper's emit loop (EX/WordCount.java:36) as a table function."""

    def eval(self, text: str):
        if text is None:
            return
        for pos, tok in enumerate(text.split()):
            yield pos, tok


@udtf(returnType="key string, value string")
class ParseKvUDTF:
    """KeyValueTextInputFormat's record split (first separator wins;
    missing separator → empty value) as a table function."""

    def eval(self, line: str, sep: str = "\t"):
        if line is None:
            return
        key, found, value = line.partition(sep)
        yield key, value if found else ""


@udtf(returnType="field string, idx int")
class ExplodeFieldsUDTF:
    """FieldSelection-style: one output row per delimited field."""

    def eval(self, line: str, sep: str = "\t"):
        if line is None:
            return
        for i, f in enumerate(line.split(sep)):
            yield f, i


def register_udtfs(spark: SparkSession) -> None:
    """Register the UDTF surface for SQL LATERAL use."""
    spark.udtf.register("tokenize", TokenizeUDTF)
    spark.udtf.register("parse_kv", ParseKvUDTF)
    spark.udtf.register("explode_fields", ExplodeFieldsUDTF)
