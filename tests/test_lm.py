"""LM perplexity scoring pinned against a transparent python model, plus
degenerate inputs and the external-model (train-once) path."""

from __future__ import annotations

import math
from collections import Counter

from hadoop_prototype_spark.operators.lm import lm_bigram_model, score_lm_perplexity


def _python_model(texts: dict[int, str]):
    uni: Counter = Counter()
    bi: Counter = Counter()
    for t in texts.values():
        words = t.split()
        uni.update(words)
        bi.update(f"{a} {b}" for a, b in zip(words, words[1:]))
    return uni, bi


def _python_scores(texts: dict[int, str]):
    uni, bi = _python_model(texts)
    out = {}
    for i, t in texts.items():
        words = t.split()
        bigrams = [f"{a} {b}" for a, b in zip(words, words[1:])]
        bits = sum(
            (uni[b.split(" ")[0]].bit_length() - 1) - (bi[b].bit_length() - 1)
            for b in bigrams
        )
        out[i] = (len(bigrams), bits, bits / len(bigrams) if bigrams else 0.0)
    return out


def test_lm_scores_match_python_model(spark):
    texts = {
        1: "the cat sat on the mat",
        2: "the cat ran",
        3: "a dog sat on a mat",
        4: "the the the the",
        5: "solo",  # no bigrams → zero score
        6: "cat mat",
    }
    df = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id bigint, text string"
    )
    got = {
        r.doc_id: (r.n_bigrams, r.bits, r.bits_per_bigram)
        for r in score_lm_perplexity(df).collect()
    }
    want = _python_scores(texts)
    assert got == want
    # a rare bigram of a common token must cost more bits than a common one
    assert got[6][2] >= got[4][2]


def test_lm_external_model_path(spark):
    """Train on a reference corpus, score a different one (the CCNet
    deployment): scoring must use the MODEL's counts."""
    ref = spark.createDataFrame(
        [(1, "x y x y x y x y"), (2, "x z")], "doc_id bigint, text string"
    )
    model = lm_bigram_model(ref)
    target = spark.createDataFrame([(10, "x y x z")], "doc_id bigint, text string")
    r = score_lm_perplexity(target, model=model).collect()[0]
    # c(x)=5, c('x y')=4, c('x z')=1; bigram 'y x' in target: c(y)=4, c('y x')=3
    fl = lambda v: v.bit_length() - 1  # noqa: E731
    want_bits = (fl(5) - fl(4)) + (fl(4) - fl(3)) + (fl(5) - fl(1))
    assert (r.n_bigrams, r.bits) == (3, want_bits)


def test_lm_degenerate_inputs(spark):
    empty = spark.createDataFrame([], "doc_id bigint, text string")
    assert score_lm_perplexity(empty).count() == 0
    shorts = spark.createDataFrame(
        [(1, ""), (2, "one")], "doc_id bigint, text string"
    )
    rows = {r.doc_id: r for r in score_lm_perplexity(shorts).collect()}
    assert rows[2].n_bigrams == 0 and rows[2].bits_per_bigram == 0.0
