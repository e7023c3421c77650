"""Text helper functions (tokenize / regex extract).

Reference analogues: TokenCounterMapper (MR lib/map/TokenCounterMapper.java:35,
whitespace tokenize → (token,1)) and RegexMapper (MR lib/map/RegexMapper.java:36,
emit every regex match). Both were row-at-a-time Java map functions; here they
are pure Column expressions so they stay inside whole-stage codegen — no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WHITESPACE = r"\s+"


def tokenize(df: DataFrame, text_col: str, out: str = "word", pattern: str = WHITESPACE) -> DataFrame:
    """Explode ``text_col`` into one row per non-empty token.

    TokenCounterMapper equivalent: split on whitespace, drop empties
    (StringTokenizer never yields empty tokens).
    """
    return df.select(
        F.explode(F.split(F.col(text_col), pattern)).alias(out)
    ).filter(F.col(out) != "")


def regex_matches(df: DataFrame, text_col: str, regex: str, out: str = "match") -> DataFrame:
    """Explode every match of ``regex`` in ``text_col`` (RegexMapper semantics)."""
    return df.select(
        F.explode(F.regexp_extract_all(F.col(text_col), F.lit(regex), 0)).alias(out)
    )


def word_length(word: Column) -> Column:
    return F.length(word)
