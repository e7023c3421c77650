"""Property-based tests (hypothesis) for the spec compilers.

The reference tests its spec parsers with hand-picked cases
(TestKeyFieldHelper.java, TestMRFieldSelection.java); we upgrade to
randomized properties: the compiled Spark expression must agree with a
direct pure-Python evaluation of the spec on arbitrary inputs.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hadoop_prototype_spark.operators.fieldsel import parse_spec
from hadoop_prototype_spark.operators.sort import parse_keyfield_spec

# --- fieldsel spec parser ---------------------------------------------------

_field_pos = st.integers(min_value=0, max_value=9)


@st.composite
def fieldsel_specs(draw):
    def part():
        return draw(
            st.one_of(
                _field_pos.map(str),
                st.tuples(_field_pos, _field_pos).map(lambda t: f"{min(t)}-{max(t)}"),
                _field_pos.map(lambda i: f"{i}-"),
            )
        )

    keys = [part() for _ in range(draw(st.integers(1, 4)))]
    vals = [part() for _ in range(draw(st.integers(0, 4)))]
    return ",".join(keys) + (":" + ",".join(vals) if vals else "")


def _eval_part(part: str, fields: list[str]) -> list[str]:
    """Reference semantics of one spec element (FieldSelectionHelper.java:60):
    i, i-j (inclusive), or i- (open range)."""
    if "-" in part:
        start_s, end_s = part.split("-", 1)
        start = int(start_s)
        end = int(end_s) if end_s else None
        if end is None:
            return fields[start:]
        return fields[start : end + 1]
    i = int(part)
    return [fields[i]] if i < len(fields) else []


@given(spec=fieldsel_specs(), n_fields=st.integers(1, 10))
@settings(max_examples=200, deadline=None)
def test_fieldsel_parse_roundtrip(spec, n_fields):
    keys, vals = parse_spec(spec)
    # parsed structure re-renders to the same selection as direct evaluation
    fields = [f"f{i}" for i in range(n_fields)]
    for parts, raw in ((keys, spec.split(":")[0]), ):
        expected = []
        for p in raw.split(","):
            expected.extend(_eval_part(p, fields))
        got = []
        for ps in parts:
            if ps.end is None:
                got.extend(fields[ps.start:])
            elif ps.start == ps.end:
                if ps.start < len(fields):
                    got.append(fields[ps.start])
            else:
                got.extend(fields[ps.start : ps.end + 1])
        assert got == expected, f"spec={spec!r} fields={n_fields}"


# --- keyfield '-k' sort spec -----------------------------------------------


@st.composite
def keyfield_specs(draw):
    n = draw(st.integers(1, 3))
    parts = []
    for _ in range(n):
        f1 = draw(st.integers(1, 5))
        opts = draw(st.sampled_from(["", "n", "r", "nr"]))
        parts.append(f"-k{f1},{f1}{opts}")
    return " ".join(parts)


@given(spec=keyfield_specs(), seed=st.integers(0, 2**31 - 1))
@settings(max_examples=50, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_keyfield_sort_matches_python_sort(spark, spec, seed):
    """The compiled sort expressions order rows exactly as a pure-Python
    GNU-sort-subset implementation does."""
    import random

    from hadoop_prototype_spark.operators.sort import keyfield_sort_columns

    rng = random.Random(seed)
    rows = [
        ("\t".join(str(rng.choice([1, 2, 10, -3, 0, 7])) for _ in range(5)),)
        for _ in range(30)
    ]
    df = spark.createDataFrame(rows, ["line"])
    got = [r.line for r in df.orderBy(*keyfield_sort_columns(spec), "line").collect()]

    specs = parse_keyfield_spec(spec)

    def field_key(line: str, s):
        fields = line.split("\t")
        v = fields[s.start_field - 1] if s.start_field <= len(fields) else ""
        if s.numeric:
            return float(v) if v.strip() else 0.0
        return v

    # stable multi-pass sort, least-significant key first — models mixed
    # asc/desc multi-key ordering without inventing an order-reversing
    # encoding (negated codepoints get the lexicographic prefix rule wrong)
    expected = sorted(r[0] for r in rows)  # total tie-break, matching orderBy
    for s in reversed(specs):
        expected.sort(key=lambda line: field_key(line, s), reverse=s.reverse)
    assert got == expected, f"spec={spec!r}"


@st.composite
def offset_keyfield_specs(draw):
    f1 = draw(st.integers(1, 3))
    f2 = draw(st.integers(f1, 3))
    c1 = draw(st.integers(1, 4))
    c2 = draw(st.one_of(st.none(), st.integers(1, 4)))
    r = draw(st.sampled_from(["", "r"]))
    tail = f"{f2}.{c2}" if c2 is not None else f"{f2}"
    return f"-k{f1}.{c1},{tail}{r}"


def _offset_key(line: str, s, sep: str = "\t") -> str:
    """Independent model of the GNU-sort char-offset key (KeyFieldHelper
    semantics): the key is the char span from (start_field, start_char)
    through (end_field, end_char), separators included."""
    fields = line.split(sep)
    # open-ended (-k2.3): through end of line, KeyFieldHelper.java:137-141
    end = s.end_field if s.end_field is not None else len(fields)
    joined = sep.join(fields[s.start_field - 1 : end])
    if s.end_char is None:
        key_end = len(joined)
    else:
        last = fields[end - 1] if end <= len(fields) else ""
        key_end = len(joined) - (len(last) - min(len(last), s.end_char))
    return joined[s.start_char - 1 : max(key_end, s.start_char - 1)]


@given(spec=offset_keyfield_specs(), seed=st.integers(0, 2**31 - 1))
@settings(max_examples=40, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_keyfield_char_offsets_match_python_model(spark, spec, seed):
    import random

    from hadoop_prototype_spark.operators.sort import keyfield_sort_columns

    rng = random.Random(seed)
    alphabet = "abcxyz"
    rows = [
        (
            "\t".join(
                "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 4)))
                for _ in range(3)
            ),
        )
        for _ in range(25)
    ]
    df = spark.createDataFrame(rows, ["line"])
    got = [r.line for r in df.orderBy(*keyfield_sort_columns(spec), "line").collect()]

    (s,) = parse_keyfield_spec(spec)
    expected = sorted(r[0] for r in rows)
    expected.sort(key=lambda line: _offset_key(line, s), reverse=s.reverse)
    assert got == expected, f"spec={spec!r}"


# ---------------------------------------------------------------------------
# KeyFieldBasedComparator vs the real GNU sort binary.
#
# The hypothesis property above checks the Spark compiler against
# _offset_key — but that model shares the joined/key_end formula with the
# implementation, so a common misreading of GNU-sort/KeyFieldHelper
# semantics would pass. These cases compare against /usr/bin/sort itself
# (LC_ALL=C: byte collation, matching Spark's UTF8 binary ordering on
# ASCII). Spark adds the raw line as a final tie-break, mirroring GNU
# sort's last-resort whole-line comparison when keys compare equal.

_GNU_LINES = [
    "delta\t10\tzebra x",
    "alpha\t2\tzebra y",
    "alpha\t10\tapple q",
    "charlie\t2\tapple r",
    "bravo\t33\tmango s",
    "bravo\t4\tmango t",
    "delta\t4\tberry u",
    "echo\t100\tberry v",
    "alphabet\t2\tcherry w",
    "alp\t25\tcherry x",
    "a\t7\tdate yz",
    "ab\t7\tdate ya",
    "abc\t70\tfig z",
    "charlie\t21\tfig zz",
    "echo\t3\tgrape ab",
    "foxtrot\t3\tgrape aa",
]

_GNU_SPECS = [
    "-k1",
    "-k3",
    "-k2,2n",
    "-k2,2nr -k1",
    "-k1r -k2,2n",
    "-k1.2,1.4",
    "-k1.3",
    "-k2.2,3.1",
    "-k1.2,2.1",
    "-k3.3,3.5 -k1",
]


@pytest.mark.parametrize("spec", _GNU_SPECS)
def test_keyfield_sort_matches_gnu_sort_binary(spark, spec):
    import subprocess

    from pyspark.sql import functions as F

    from hadoop_prototype_spark.operators.sort import keyfield_sort_columns

    gnu = subprocess.run(
        ["sort", "-t", "\t"] + spec.split(),
        input="\n".join(_GNU_LINES) + "\n",
        capture_output=True,
        text=True,
        env={"LC_ALL": "C"},
        check=True,
    ).stdout.splitlines()

    df = spark.createDataFrame([(l,) for l in _GNU_LINES], ["line"])
    got = [
        r.line
        for r in df.orderBy(
            *keyfield_sort_columns(spec), F.col("line")
        ).collect()
    ]
    assert got == gnu, f"spec {spec!r}: spark order diverges from GNU sort"


# --- as-of join vs quadratic model ------------------------------------------


@given(seed=st.integers(0, 2**31 - 1))
@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_asof_join_matches_quadratic_model(spark, seed):
    """asof_join (union-and-window, one shuffle) must equal the O(L×R)
    definition: for each left row, the right row with max (t, rid) among
    same-key rows with t ≤ left.t."""
    import random

    from hadoop_prototype_spark.operators.joins import asof_join

    rng = random.Random(seed)
    left = [
        (rng.randint(0, 3), rng.randint(0, 30), i) for i in range(rng.randint(1, 15))
    ]
    right = [
        (rng.randint(0, 3), rng.randint(0, 30), 100 + i, rng.random())
        for i in range(rng.randint(0, 15))
    ]
    ldf = spark.createDataFrame(left, "k long, t long, lid long")
    rdf = spark.createDataFrame(right, "k long, t long, rid long, val double")
    got = {
        (r.k, r.t, r.lid): (r.asof_rid, r.asof_val)
        for r in asof_join(ldf, rdf, "k", "t", ["rid", "val"], right_id_col="rid").collect()
    }
    assert len(got) == len({(k, t, lid) for k, t, lid in left})
    for k, t, lid in left:
        matches = [(rt, rid, v) for rk, rt, rid, v in right if rk == k and rt <= t]
        want = max(matches, key=lambda m: (m[0], m[1]), default=None)
        expect = (want[1], want[2]) if want else (None, None)
        assert got[(k, t, lid)] == expect, (seed, k, t, got[(k, t, lid)], expect)


# --- edit-distance-1 pairs vs brute force -----------------------------------


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@given(seed=st.integers(0, 2**31 - 1))
@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_edit1_pairs_match_bruteforce(spark, seed):
    """Deletion-neighborhood candidates + verify must produce EXACTLY the
    brute-force set of distance-1 pairs (completeness is the theorem the
    SymSpell construction claims; this checks it, not assumes it)."""
    import random

    from hadoop_prototype_spark.operators.fuzzy import edit1_pairs

    rng = random.Random(seed)
    strs = sorted(
        {
            "".join(rng.choice("abc") for _ in range(rng.randint(1, 5)))
            for _ in range(rng.randint(2, 12))
        }
    )
    df = spark.createDataFrame([(s,) for s in strs], ["name"])
    got = sorted((r.a, r.b) for r in edit1_pairs(df, "name").collect())
    want = sorted(
        (a, b)
        for i, a in enumerate(strs)
        for b in strs[i + 1 :]
        if _lev(a, b) == 1
    )
    assert got == want, (seed, got, want)


# --- boilerplate-span removal vs direct python model ------------------------


@given(seed=st.integers(0, 2**31 - 1))
@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_boilerplate_spans_match_python_model(spark, seed):
    """remove_boilerplate_spans (hash-keyed, never token-shuffling) must
    equal the direct O(docs x windows) python definition: a token is
    removed iff some k-window covering it occurs in >= min_docs distinct
    docs."""
    import random

    from hadoop_prototype_spark.operators.dedup import remove_boilerplate_spans

    rng = random.Random(seed)
    vocab = ["a", "b", "c", "d", "e"]
    k, min_docs = 3, 2
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 12))))
        for i in range(rng.randint(2, 10))
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.text_clean, r.n_tokens, r.n_removed)
        for r in remove_boilerplate_spans(df, k=k, min_docs=min_docs).collect()
    }

    # python model
    words = {i: t.split() for i, t in docs}
    from collections import defaultdict

    win_docs = defaultdict(set)
    for i, w in words.items():
        for s in range(len(w) - k + 1):
            win_docs[tuple(w[s : s + k])].add(i)
    frequent = {w for w, ds in win_docs.items() if len(ds) >= min_docs}
    for i, w in words.items():
        covered = set()
        for s in range(len(w) - k + 1):
            if tuple(w[s : s + k]) in frequent:
                covered.update(range(s, s + k))
        kept = [t for p, t in enumerate(w) if p not in covered]
        assert got[i] == (" ".join(kept), len(w), len(covered)), (seed, i)


# --- context-window chunking vs python slices -------------------------------


@given(seed=st.integers(0, 2**31 - 1))
@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_chunk_documents_match_python_slices(spark, seed):
    """chunk_documents must equal python's range(0, n, stride) slicing for
    arbitrary doc lengths, chunk sizes, and strides (incl. stride > chunk,
    i.e. gaps)."""
    import random

    from hadoop_prototype_spark.operators.packing import chunk_documents

    rng = random.Random(seed)
    chunk = rng.randint(1, 6)
    stride = rng.randint(1, 8)
    docs = [
        (i, " ".join(f"w{i}_{j}" for j in range(rng.randint(1, 20))))
        for i in range(rng.randint(1, 6))
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.doc_id, r.chunk_id): (r.chunk_text, r.n_tokens)
        for r in chunk_documents(df, chunk=chunk, stride=stride).collect()
    }
    want = {}
    for i, t in docs:
        w = t.split()
        for cid, s in enumerate(range(0, len(w), stride)):
            piece = w[s : s + chunk]
            want[(i, cid)] = (" ".join(piece), len(piece))
    assert got == want, (seed, chunk, stride)


def test_dsir_importance_is_layout_invariant(spark):
    """DSIR scores must not depend on physical partitioning: integer
    bucket weights make the per-doc sum exact in any order."""
    from hadoop_prototype_spark.operators.sampling import dsir_importance

    rows = [(i, f"tok{i % 7} tok{i % 3} tok{i % 11}", "en" if i % 2 else "de") for i in range(60)]
    base = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    a = {r.doc_id: (r.raw_score, r.importance) for r in dsir_importance(base.repartition(1)).collect()}
    b = {r.doc_id: (r.raw_score, r.importance) for r in dsir_importance(base.repartition(13)).collect()}
    assert a == b


@given(seed=st.integers(0, 2**31 - 1))
@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_tokenize_ids_match_python_model(spark, seed):
    """tokenize_to_ids against a transparent python model: same vocab
    (top-N by count, ties alphabetical, ids 1..N by rank), same OOV-0
    convention, order preserved."""
    import random
    import re
    from collections import Counter

    from hadoop_prototype_spark.operators.textstats import tokenize_to_ids

    rng = random.Random(seed)
    alphabet = ["aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh"]
    docs = [
        (i, " ".join(rng.choice(alphabet) for _ in range(rng.randint(1, 12))))
        for i in range(rng.randint(1, 12))
    ]
    vocab_size = rng.randint(1, 6)

    # python model — split on \s+ like the operator
    toks = {d: re.split(r"\s+", t) for d, t in docs}
    counts = Counter(w for ws in toks.values() for w in ws)
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_size]
    vid = {w: i + 1 for i, (w, _) in enumerate(ranked)}
    expect = {d: [vid.get(w, 0) for w in ws] for d, ws in toks.items()}

    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    out = {
        r.doc_id: list(r.token_ids)
        for r in tokenize_to_ids(df, vocab_size=vocab_size).collect()
    }
    assert out == expect


@given(seed=st.integers(0, 2**31 - 1))
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_bm25_matches_python_model(spark, seed):
    """bm25_topk against a transparent python replica of the exact
    formula — same rational idf, same fixed-point floor scaling, same
    (score desc, doc_id) tie-break."""
    import math
    import random
    import re
    from collections import Counter

    from hadoop_prototype_spark.operators.invindex import (
        BM25_B,
        BM25_K1,
        BM25_SCALE,
        bm25_topk,
    )

    rng = random.Random(seed)
    alphabet = ["aa", "bb", "cc", "dd", "ee"]
    docs = [
        (i, " ".join(rng.choice(alphabet) for _ in range(rng.randint(1, 15))))
        for i in range(rng.randint(2, 10))
    ]
    queries = ((0, " ".join(rng.sample(alphabet, 2))), (1, rng.choice(alphabet)))
    k = 3

    toks = {d: re.split(r"\s+", t) for d, t in docs}
    n_docs = len(docs)
    avgdl = sum(len(ws) for ws in toks.values()) / n_docs
    qterms = sorted({(qid, t) for qid, q in queries for t in q.split()})
    dfreq = Counter()
    for t in {t for _, t in qterms}:
        dfreq[t] = sum(1 for ws in toks.values() if t in ws)
    expect = {}
    for qid, t in qterms:
        for d, ws in toks.items():
            tf = ws.count(t)
            if tf == 0:
                continue
            dl = len(ws)
            sat = (tf * (BM25_K1 + 1.0)) / (tf + BM25_K1 * ((1.0 - BM25_B) + BM25_B * dl / avgdl))
            idf = (n_docs - dfreq[t] + 0.5) / (dfreq[t] + 0.5)
            expect[(qid, d)] = expect.get((qid, d), 0) + int(
                math.floor(sat * idf * float(BM25_SCALE) + 0.5)
            )
    want = {}
    for qid in {q for q, _ in qterms}:
        ranked = sorted(
            ((s, d) for (q, d), s in expect.items() if q == qid),
            key=lambda t: (-t[0], t[1]),
        )[:k]
        for r, (s, d) in enumerate(ranked, 1):
            want[(qid, d)] = (r, s / float(BM25_SCALE))

    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = {
        (r.qid, r.doc_id): (r.rank, r.bm25)
        for r in bm25_topk(df, queries=queries, k=k).collect()
    }
    assert got == want


@given(seed=st.integers(0, 2**31 - 1))
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_bpe_learn_matches_python_model(spark, seed):
    """bpe_learn against a transparent python replica: same pair counts,
    same (count desc, left, right) tie-break, same greedy left-to-right
    merge application between rounds."""
    import random
    import re
    from collections import Counter

    from hadoop_prototype_spark.operators.textstats import bpe_learn

    rng = random.Random(seed)
    alphabet = ["a", "b", "c"]
    docs = [
        (i, " ".join(rng.choice(alphabet) for _ in range(rng.randint(1, 10))))
        for i in range(rng.randint(1, 8))
    ]
    n_merges = 4

    def model(docs, n_merges):
        corpora = [re.split(r"\s+", t) for _, t in docs]
        out = []
        for rank in range(1, n_merges + 1):
            counts = Counter()
            for toks in corpora:
                for i in range(len(toks) - 1):
                    counts[(toks[i], toks[i + 1])] += 1
            if not counts:
                break
            best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
            (l, r), c = best
            if c < 2:
                break
            out.append((rank, l, r, c))
            merged_corpora = []
            for toks in corpora:
                acc = []
                for x in toks:
                    if acc and acc[-1] == l and x == r:
                        acc[-1] = l + r
                    else:
                        acc.append(x)
                merged_corpora.append(acc)
            corpora = merged_corpora
        return out

    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    assert bpe_learn(df, n_merges=n_merges) == model(docs, n_merges)


@given(seed=st.integers(0, 2**31 - 1))
@settings(max_examples=6, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_bpe_apply_matches_python_model(spark, seed):
    """bpe_apply with explicit rules against a python replica — same
    greedy fold per rule in rank order, same merged sequences."""
    import hashlib
    import random
    import re

    from hadoop_prototype_spark.operators.textstats import bpe_apply

    rng = random.Random(seed)
    alphabet = ["a", "b", "c"]
    docs = [
        (i, " ".join(rng.choice(alphabet) for _ in range(rng.randint(1, 12))))
        for i in range(rng.randint(1, 6))
    ]
    merges = [(1, "a", "b", 9), (2, "ab", "c", 9), (3, "c", "c", 9)]

    def fold(toks, l, r):
        acc = []
        for x in toks:
            if acc and acc[-1] == l and x == r:
                acc[-1] = l + r
            else:
                acc.append(x)
        return acc

    want = {}
    for d, t in docs:
        toks = re.split(r"\s+", t)
        merged = toks
        for _, l, r, _ in merges:
            merged = fold(merged, l, r)
        want[d] = (
            len(toks),
            len(merged),
            hashlib.md5(" ".join(merged).encode()).hexdigest(),
        )

    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = {
        r.doc_id: (r.n_tokens_before, r.n_tokens_after, r.tokens_md5)
        for r in bpe_apply(df, merges=merges).collect()
    }
    assert got == want


@given(seed=st.integers(0, 2**31 - 1))
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_winsorize_matches_python_model(spark, seed):
    """winsorize against a transparent python replica of the histogram-
    pruned exact order statistic (min v with |{x ≤ v}| ≥ ceil(q·n)) and
    the clamp semantics."""
    import math
    import random

    from hadoop_prototype_spark.operators.sketch import winsorize

    rng = random.Random(seed)
    n = rng.randint(3, 60)
    vals = [round(rng.uniform(0.0, 100.0), 3) for _ in range(n)]
    lo_q, hi_q = 0.1, 0.9

    def order_stat(q):
        s = sorted(vals)
        return s[max(0, math.ceil(q * n) - 1)]

    lo_v, hi_v = order_stat(lo_q), order_stat(hi_q)
    want = {
        i: (min(max(v, lo_v), hi_v), v < lo_v, v > hi_v)
        for i, v in enumerate(vals)
    }

    df = spark.createDataFrame(list(enumerate(vals)), "event_id bigint, value double")
    got = {
        r.event_id: (r.value_winsorized, r.clipped_low, r.clipped_high)
        for r in winsorize(df, lo_q=lo_q, hi_q=hi_q).collect()
    }
    assert got == want


@given(seed=st.integers(0, 2**31 - 1))
@settings(max_examples=6, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_quality_tiers_match_python_model(spark, seed):
    """quality_tiers against a python replica: same quality blend (IEEE
    doubles, same fold order), same 256-bin histogram, same strictly-
    below cumulative, same integer tier boundaries."""
    import math
    import random
    import re
    from collections import Counter

    from hadoop_prototype_spark.operators.textstats import STOPWORDS, quality_tiers

    rng = random.Random(seed)
    words = ["alpha", "beta", "the", "a", "of", "gamma", "delta"]
    docs = [
        (
            i,
            " ".join(rng.choice(words) for _ in range(rng.randint(1, 40))),
            rng.choice(["en", "de"]),
        )
        for i in range(rng.randint(2, 25))
    ]
    bins = 256

    def quality(t):
        ws = re.split(r"\s+", t)
        nw = float(len(ws))
        n_stop = sum(1 for w in ws if w in STOPWORDS)
        punct = 0.0  # alphabet has no punctuation; n_chars > 0 always
        return min(nw / 100.0, 1.0) * 0.3 + (1.0 - punct) * 0.4 + (n_stop / nw) * 0.3

    def qbin(v):
        return min(bins - 1, max(0, int(math.floor((v - 0.0) / (1.0 / bins)))))

    per_grp_bins = {}
    for i, t, g in docs:
        per_grp_bins.setdefault(g, Counter())[qbin(quality(t))] += 1
    want = {}
    for i, t, g in docs:
        b = qbin(quality(t))
        hist = per_grp_bins[g]
        total = sum(hist.values())
        cum_below = sum(c for bb, c in hist.items() if bb < b)
        tier = (
            "tail" if cum_below * 3 < total
            else ("middle" if cum_below * 3 < total * 2 else "head")
        )
        want[i] = tier

    df = spark.createDataFrame(docs, "doc_id bigint, text string, lang string")
    got = {r.doc_id: r.tier for r in quality_tiers(df).collect()}
    assert got == want
