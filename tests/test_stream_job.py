"""stream_job: the StreamJob CLI surface (StreamJob.java:80, opts :438-530)
wired end to end over all four -io modes."""

from __future__ import annotations

import sys

import pytest
from pyspark.sql import functions as F

from hadoop_prototype_spark.functions.udf_surface import stream_job

# sums $2 per contiguous $1 — correct only over grouped+sorted input, so a
# right answer proves the reducer contract (same script as the queries)
AWK_SUM = (
    "awk -F'\\t' '"
    "$1 != k { if (n) print k \"\\t\" s; k = $1; s = 0; n = 1 } "
    "{ s += $2 } "
    "END { if (n) print k \"\\t\" s }'"
)


@pytest.fixture()
def words(spark):
    rows = [("apple", 1)] * 5 + [("pear", 1)] * 3 + [("fig", 1)] * 2
    return spark.createDataFrame(rows, ["word", "one"]).repartition(4)


def test_text_full_pipeline(words):
    """-mapper cat -combiner awk -reducer awk: combiner partials then final
    sums must equal the plain group-count."""
    out = stream_job(words, mapper="/bin/cat", combiner=AWK_SUM, reducer=AWK_SUM)
    got = {(r.key, int(r.value)) for r in out.collect()}
    assert got == {("apple", 5), ("pear", 3), ("fig", 2)}


def test_text_map_only(words):
    """reducer=None → map-only job: no shuffle, mapper output is job output."""
    out = stream_job(words, mapper="/bin/cat")
    assert out.count() == 10  # nothing aggregated
    assert stream_job(words, mapper="/bin/cat", reducer=AWK_SUM, num_reduce_tasks=0).count() == 10


def test_combiner_requires_reducer(words):
    with pytest.raises(ValueError, match="-combiner requires -reducer"):
        stream_job(words, combiner=AWK_SUM)
    with pytest.raises(ValueError, match="-io"):
        stream_job(words, io="keyvalue")


def _tb_child(tmp_path, body: str) -> str:
    script = tmp_path / "child.py"
    script.write_text(
        "import sys\n"
        "sys.path.insert(0, '/root/repo')\n"
        "from hadoop_prototype_spark.functions.typedbytes import tb_read_pairs, tb_encode_pair\n"
        "out = sys.stdout.buffer\n" + body
    )
    return f"{sys.executable} {script}"


def test_typedbytes_reduce(words, tmp_path):
    """-io typedbytes with a python sum-on-key-change reducer: native int
    values cross the pipe (no stringification), grouped and sorted."""
    reducer = _tb_child(
        tmp_path,
        "k = None; s = 0; seen = False\n"
        "for key, v in tb_read_pairs(sys.stdin.buffer):\n"
        "    if key != k:\n"
        "        if seen: out.write(tb_encode_pair(k, s))\n"
        "        k, s, seen = key, 0, True\n"
        "    s += v\n"
        "if seen: out.write(tb_encode_pair(k, s))\n",
    )
    out = stream_job(
        words, reducer=reducer, io="typedbytes",
        reduce_output_schema="key string, value long",
    )
    got = {(r.key, r.value) for r in out.collect()}
    assert got == {("apple", 5), ("pear", 3), ("fig", 2)}


def test_typedbytes_combiner_plus_reducer(words, tmp_path):
    sum_child = _tb_child(
        tmp_path,
        "k = None; s = 0; seen = False\n"
        "for key, v in tb_read_pairs(sys.stdin.buffer):\n"
        "    if key != k:\n"
        "        if seen: out.write(tb_encode_pair(k, s))\n"
        "        k, s, seen = key, 0, True\n"
        "    s += v\n"
        "if seen: out.write(tb_encode_pair(k, s))\n",
    )
    out = stream_job(
        words, combiner=sum_child, reducer=sum_child, io="typedbytes",
        reduce_output_schema="key string, value long",
    )
    got = {(r.key, r.value) for r in out.collect()}
    assert got == {("apple", 5), ("pear", 3), ("fig", 2)}


def test_keyonlytext_modes(words):
    """-io keyonlytext (IdentifierResolver.java:38, KeyOnlyTextInputWriter
    /-OutputReader): the script sees BARE key lines — value dropped, no
    trailing separator — and every stdout line becomes the single key
    column (NullWritable value)."""
    # wire check: an awk field count proves the value column never crossed
    probe = stream_job(words, mapper="awk -F'\\t' '{print NF \"_\" $1}'", io="keyonlytext")
    assert probe.columns == ["key"]
    assert {r.key for r in probe.collect()} == {"1_apple", "1_pear", "1_fig"}

    # reduce: uniq over key-grouped sorted keys = distinct keys
    out = stream_job(words, reducer="uniq", io="keyonlytext")
    assert out.columns == ["key"]
    assert sorted(r.key for r in out.collect()) == ["apple", "fig", "pear"]

    # combiner + reducer (uniq is idempotent/associative, the combiner bar)
    out3 = stream_job(words, combiner="uniq", reducer="uniq", io="keyonlytext")
    assert sorted(r.key for r in out3.collect()) == ["apple", "fig", "pear"]

    # identity mapper, map-only: the wire contract still applies — value
    # dropped, single key column (regression: used to pass through (k, v))
    ident = stream_job(words, io="keyonlytext", num_reduce_tasks=0)
    assert ident.columns == ["key"]
    assert sorted(r.key for r in ident.collect()) == sorted(
        ["apple"] * 5 + ["fig"] * 2 + ["pear"] * 3
    )


def test_rawbytes_grouped_identity(spark):
    """-io rawbytes reducer=cat: byte-exact pairs survive shuffle+sort+pipe,
    including bytes that would corrupt the text line protocol."""
    payload = [(b"k\t1", b"\xff\x00va"), (b"k\t1", b"\x00"), (b"a\nb", b"")]
    df = spark.createDataFrame(payload, "key binary, value binary").repartition(3)
    out = stream_job(df, reducer="cat", io="rawbytes")
    got = sorted((bytes(r.key), bytes(r.value)) for r in out.collect())
    assert got == sorted(payload)
    # grouping contract: equal keys landed contiguous on one partition —
    # verified by cat preserving them; a keyed count proves nothing split
    counts = out.groupBy("key").count().collect()
    assert {bytes(r.key): r["count"] for r in counts} == {b"k\t1": 2, b"a\nb": 1}
