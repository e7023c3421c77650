"""typedbytes / rawbytes wire-format and pipe tests (SURVEY.md §2.10;
hadoop-streaming io/IdentifierResolver.java:35-38, TypedBytesInput.java).

The byte-level pins are hand-written from the published format — NOT via
the encoder — so encoder and decoder cannot share a misreading.
"""

from __future__ import annotations

import io
import struct
import sys

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hadoop_prototype_spark.functions.typedbytes import (
    pipe_rawbytes,
    pipe_typedbytes,
    raw_encode_pair,
    raw_read_pairs,
    tb_encode,
    tb_encode_pair,
    tb_read,
    tb_read_pairs,
)


# --- hand-pinned wire bytes -------------------------------------------------

PINNED = [
    (b"abc", b"\x00\x00\x00\x00\x03abc"),
    (True, b"\x02\x01"),
    (False, b"\x02\x00"),
    (5, b"\x03\x00\x00\x00\x05"),
    (-1, b"\x03\xff\xff\xff\xff"),
    (2**40, b"\x04\x00\x00\x01\x00\x00\x00\x00\x00"),
    (1.5, b"\x06" + struct.pack(">d", 1.5)),
    ("ab", b"\x07\x00\x00\x00\x02ab"),
    ("é", b"\x07\x00\x00\x00\x02\xc3\xa9"),
    ([1, "a"], b"\x08\x00\x00\x00\x02" + b"\x03\x00\x00\x00\x01" + b"\x07\x00\x00\x00\x01a"),
    ({"k": 7}, b"\x0a\x00\x00\x00\x01" + b"\x07\x00\x00\x00\x01k" + b"\x03\x00\x00\x00\x07"),
]


@pytest.mark.parametrize("obj,wire", PINNED)
def test_encode_pinned(obj, wire):
    assert tb_encode(obj) == wire


@pytest.mark.parametrize("obj,wire", PINNED)
def test_decode_pinned(obj, wire):
    assert tb_read(io.BytesIO(wire)) == obj


def test_decode_only_codes():
    # codes the decoder must accept that the encoder never emits
    assert tb_read(io.BytesIO(b"\x01\x2a")) == 42  # byte
    assert tb_read(io.BytesIO(b"\x05" + struct.pack(">f", 2.0))) == 2.0  # float32
    # type-9 list with 255 terminator
    wire = b"\x09" + b"\x03\x00\x00\x00\x01" + b"\x03\x00\x00\x00\x02" + b"\xff"
    assert tb_read(io.BytesIO(wire)) == [1, 2]
    # application-specific 50..200 → opaque bytes
    assert tb_read(io.BytesIO(b"\x96\x00\x00\x00\x02hi")) == b"hi"


def test_truncated_raises():
    with pytest.raises(EOFError):
        tb_read(io.BytesIO(b"\x07\x00\x00\x00\x05ab"))
    with pytest.raises(EOFError):
        list(tb_read_pairs(io.BytesIO(tb_encode("key"))))  # key without value


# --- property round trip -----------------------------------------------------

scalars = st.one_of(
    st.booleans(),
    st.integers(min_value=-(2**63), max_value=2**63 - 1),
    st.floats(allow_nan=False),
    st.text(max_size=20),
    st.binary(max_size=20),
)
values = st.recursive(
    scalars,
    lambda inner: st.one_of(
        st.lists(inner, max_size=4),
        st.dictionaries(st.text(max_size=5), inner, max_size=4),
    ),
    max_leaves=10,
)


@settings(max_examples=200, deadline=None)
@given(values, values)
def test_pair_roundtrip(k, v):
    stream = io.BytesIO(tb_encode_pair(k, v) + tb_encode_pair(v, k))
    got = list(tb_read_pairs(stream))
    assert got == [(k, v), (v, k)]


@settings(max_examples=50, deadline=None)
@given(st.binary(max_size=50), st.binary(max_size=50))
def test_rawbytes_roundtrip(k, v):
    assert list(raw_read_pairs(io.BytesIO(raw_encode_pair(k, v)))) == [(k, v)]


# --- pipes -------------------------------------------------------------------


def test_pipe_typedbytes_cat_identity(spark):
    """/bin/cat echoes the frames untouched: framing survives the pipe."""
    df = spark.createDataFrame([("a", 1), ("b", 2), ("c", 3)], ["key", "value"])
    out = pipe_typedbytes(df, "cat", "key string, value int")
    assert sorted((r.key, r.value) for r in out.collect()) == [("a", 1), ("b", 2), ("c", 3)]


def test_pipe_rawbytes_cat_identity(spark):
    payload = [(b"k\x00\t1", b"\xff\xfe\x00binary"), (b"", b"empty-key")]
    df = spark.createDataFrame(payload, "key binary, value binary")
    out = pipe_rawbytes(df, "cat")
    assert sorted((bytes(r.key), bytes(r.value)) for r in out.collect()) == sorted(payload)


def test_pipe_typedbytes_null_key_raises_not_hangs(spark):
    """A null key is unencodable (typedbytes has no null type). The feeder
    must close the child's stdin on the failure path too — otherwise the
    child never sees EOF and the task hangs in read_pairs forever instead of
    surfacing the TypeError (PipeMapRed.java:45 kills the child on feed
    failure)."""
    df = spark.createDataFrame([("a", 1), (None, 2)], "key string, value int")
    with pytest.raises(Exception, match="typedbytes cannot encode"):
        pipe_typedbytes(df, "cat", "key string, value int").collect()


def test_pipe_typedbytes_python_child(spark, tmp_path):
    """A real child transformation: (word, n) → (word, n*10) in typedbytes —
    the -io typedbytes mapper contract end to end."""
    script = tmp_path / "child.py"
    script.write_text(
        "import sys\n"
        f"sys.path.insert(0, {repr('/root/repo')})\n"
        "from hadoop_prototype_spark.functions.typedbytes import tb_read_pairs, tb_encode_pair\n"
        "out = sys.stdout.buffer\n"
        "for k, v in tb_read_pairs(sys.stdin.buffer):\n"
        "    out.write(tb_encode_pair(k, v * 10))\n"
    )
    df = spark.createDataFrame([("x", 1), ("y", 2)], ["key", "value"])
    out = pipe_typedbytes(df, f"{sys.executable} {script}", "key string, value int")
    assert sorted((r.key, r.value) for r in out.collect()) == [("x", 10), ("y", 20)]
