"""typedbytes / rawbytes streaming serializations (SURVEY.md §2.10).

Reference: Hadoop Streaming's ``-io`` option selects how key/value pairs
cross the pipe to the child process (hadoop-tools/hadoop-streaming/.../io/
IdentifierResolver.java:35-38 registers text / rawbytes / typedbytes /
keyonlytext). The typedbytes wire format (TypedBytesInput.java /
TypedBytesOutput.java, same tree) is a 1-byte type code then payload,
big-endian:

    0 bytes(len32+raw)  1 byte  2 bool  3 int32  4 int64  5 float32
    6 float64  7 utf8-string(len32+raw)  8 vector(count32+elems)
    9 list(elems … 255-terminator)  10 map(count32 + k/v elems)
    50–200 application-specific bytes(len32+raw)

rawbytes is just ``len32 + raw`` per key and per value.

These exist for byte-fidelity with reference streaming jobs that pass
binary data (the text line protocol corrupts it). The pipes here spawn one
child per partition — the PipeMapper contract — with a feeder thread so
child stdout is consumed while stdin is written (no deadlock on large
partitions). Rows stream through; nothing is buffered per partition beyond
the OS pipe buffers, so partition size is unbounded.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator
from typing import BinaryIO

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# --- typedbytes encode ------------------------------------------------------

_INT32_MIN, _INT32_MAX = -(2**31), 2**31 - 1


def tb_encode(obj) -> bytes:
    """One value → typedbytes. bool before int: bool is an int subclass."""
    if isinstance(obj, bool):
        return b"\x02" + (b"\x01" if obj else b"\x00")
    if isinstance(obj, (bytes, bytearray)):
        return b"\x00" + struct.pack(">i", len(obj)) + bytes(obj)
    if isinstance(obj, int):
        if _INT32_MIN <= obj <= _INT32_MAX:
            return b"\x03" + struct.pack(">i", obj)
        return b"\x04" + struct.pack(">q", obj)
    if isinstance(obj, float):
        return b"\x06" + struct.pack(">d", obj)
    if isinstance(obj, str):
        raw = obj.encode("utf-8")
        return b"\x07" + struct.pack(">i", len(raw)) + raw
    if isinstance(obj, (list, tuple)):
        return b"\x08" + struct.pack(">i", len(obj)) + b"".join(tb_encode(x) for x in obj)
    if isinstance(obj, dict):
        out = [b"\x0a", struct.pack(">i", len(obj))]
        for k, v in obj.items():
            out.append(tb_encode(k))
            out.append(tb_encode(v))
        return b"".join(out)
    raise TypeError(f"typedbytes cannot encode {type(obj).__name__} (no null/other types in the format)")


def tb_encode_pair(key, value) -> bytes:
    return tb_encode(key) + tb_encode(value)


# --- typedbytes decode ------------------------------------------------------


def _read_exact(stream: BinaryIO, n: int) -> bytes:
    buf = stream.read(n)
    while len(buf) < n:
        more = stream.read(n - len(buf))
        if not more:
            raise EOFError("truncated typedbytes stream")
        buf += more
    return buf


def tb_read(stream: BinaryIO):
    """One value from the stream; EOFError on clean end-of-stream."""
    code_b = stream.read(1)
    if not code_b:
        raise EOFError
    code = code_b[0]
    if code == 0:
        (n,) = struct.unpack(">i", _read_exact(stream, 4))
        return _read_exact(stream, n)
    if code == 1:
        return _read_exact(stream, 1)[0]
    if code == 2:
        return _read_exact(stream, 1) != b"\x00"
    if code == 3:
        return struct.unpack(">i", _read_exact(stream, 4))[0]
    if code == 4:
        return struct.unpack(">q", _read_exact(stream, 8))[0]
    if code == 5:
        return struct.unpack(">f", _read_exact(stream, 4))[0]
    if code == 6:
        return struct.unpack(">d", _read_exact(stream, 8))[0]
    if code == 7:
        (n,) = struct.unpack(">i", _read_exact(stream, 4))
        return _read_exact(stream, n).decode("utf-8")
    if code == 8:
        (n,) = struct.unpack(">i", _read_exact(stream, 4))
        return [tb_read(stream) for _ in range(n)]
    if code == 9:
        out = []
        while True:
            try:
                out.append(tb_read(stream))
            except _ListEnd:
                return out
    if code == 10:
        (n,) = struct.unpack(">i", _read_exact(stream, 4))
        return {tb_read(stream): tb_read(stream) for _ in range(n)}
    if 50 <= code <= 200:  # application-specific: opaque bytes
        (n,) = struct.unpack(">i", _read_exact(stream, 4))
        return _read_exact(stream, n)
    if code == 255:
        raise _ListEnd
    raise ValueError(f"unknown typedbytes type code {code}")


class _ListEnd(Exception):
    """Internal: the 255 terminator of a type-9 list."""


def tb_read_pairs(stream: BinaryIO) -> Iterator[tuple]:
    """(key, value) pairs until clean EOF; truncated pairs raise."""
    while True:
        try:
            key = tb_read(stream)
        except EOFError:
            return
        yield key, tb_read(stream)


# --- rawbytes ---------------------------------------------------------------


def raw_encode_pair(key: bytes, value: bytes) -> bytes:
    return struct.pack(">i", len(key)) + key + struct.pack(">i", len(value)) + value


def raw_read_pairs(stream: BinaryIO) -> Iterator[tuple[bytes, bytes]]:
    while True:
        head = stream.read(4)
        if not head:
            return
        if len(head) < 4:
            raise EOFError("truncated rawbytes stream")
        (n,) = struct.unpack(">i", head)
        key = _read_exact(stream, n)
        (m,) = struct.unpack(">i", _read_exact(stream, 4))
        yield key, _read_exact(stream, m)


# --- binary pipe over a DataFrame -------------------------------------------


def _pipe_partition(rows, command: str, encode_pair, read_pairs):
    """One child per partition, feeder thread on stdin, decode stdout."""
    import shlex
    import subprocess
    import threading

    rows = iter(rows)
    try:
        first = next(rows)
    except StopIteration:
        return  # empty partition: don't fork a child for nothing
    import itertools

    rows = itertools.chain([first], rows)
    proc = subprocess.Popen(shlex.split(command), stdin=subprocess.PIPE, stdout=subprocess.PIPE)
    feed_err: list[BaseException] = []

    def feed() -> None:
        # stdin MUST close on every path: if encode_pair raises and the pipe
        # stays open, the child never sees EOF and read_pairs(proc.stdout)
        # blocks forever — the task hangs instead of surfacing feed_err
        # (reference contract: PipeMapRed.java:45 kills the child on feed
        # failure).
        try:
            for r in rows:
                proc.stdin.write(encode_pair(r[0], r[1]))
        except BrokenPipeError:
            pass
        except BaseException as e:  # surfaced after the child exits
            feed_err.append(e)
        finally:
            try:
                proc.stdin.close()
            except BrokenPipeError:
                pass

    t = threading.Thread(target=feed, daemon=True)
    t.start()
    yield from read_pairs(proc.stdout)
    t.join()
    ret = proc.wait()
    if feed_err:
        raise feed_err[0]
    if ret != 0:
        raise RuntimeError(f"streaming child {command!r} exited {ret}")


def pipe_typedbytes(df: DataFrame, command: str, output_schema: str = "key string, value string") -> DataFrame:
    """``-io typedbytes`` pipe: (key, value) rows cross to the child as
    typedbytes pairs and its typedbytes output becomes a DataFrame with
    output_schema. Column types pass through natively (int/float/str/bytes/
    array/map), unlike the text protocol's stringify-everything."""
    from ..operators.partition import fan_out

    kv = fan_out(df)

    def run(it):
        yield from _pipe_partition(it, command, tb_encode_pair, tb_read_pairs)

    return df.sparkSession.createDataFrame(kv.rdd.mapPartitions(run), output_schema)


def _grouped_binary(
    df: DataFrame,
    command: str,
    encode,
    encode_pair,
    read_pairs,
    schema: str,
    num_partitions: int | None = None,
    combiner: str | None = None,
) -> DataFrame:
    """Reducer contract over a binary io mode: (optional) map-side sorted
    combiner pipe, then shuffle with every key on one partition, sorted
    within it by ENCODED key bytes (equal objects encode equal, and byte
    order is a total order even over mixed-type keys), then one reducer
    child per partition — PipeReducer.java:40 with -io typedbytes/rawbytes.
    """
    import zlib

    from ..operators.partition import fan_out

    kv = fan_out(df)
    pairs = kv.rdd.map(lambda r: (r[0], r[1]))
    if combiner is not None:
        def comb(it):
            yield from _pipe_partition(
                sorted(it, key=lambda t: encode(t[0])), combiner, encode_pair, read_pairs
            )

        pairs = pairs.mapPartitions(comb)
    n = num_partitions or pairs.getNumPartitions()
    shuffled = pairs.repartitionAndSortWithinPartitions(
        numPartitions=n,
        partitionFunc=lambda k: zlib.crc32(encode(k)),  # env-independent, like _crc32_key
        keyfunc=encode,
    )

    def run(it):
        yield from _pipe_partition(it, command, encode_pair, read_pairs)

    return df.sparkSession.createDataFrame(shuffled.mapPartitions(run), schema)


def pipe_grouped_typedbytes(
    df: DataFrame,
    command: str,
    output_schema: str = "key string, value string",
    num_partitions: int | None = None,
    combiner: str | None = None,
) -> DataFrame:
    """typedbytes reducer stage: each child sees its keys grouped and
    sorted, pairs framed as typedbytes."""
    return _grouped_binary(
        df, command, tb_encode, tb_encode_pair, tb_read_pairs, output_schema,
        num_partitions, combiner,
    )


def pipe_grouped_rawbytes(
    df: DataFrame,
    command: str,
    num_partitions: int | None = None,
    combiner: str | None = None,
) -> DataFrame:
    """rawbytes reducer stage: opaque byte keys grouped byte-exactly."""
    cols = df.columns
    cast = df.select(
        F.col(cols[0]).cast("binary").alias("k"), F.col(cols[1]).cast("binary").alias("v")
    )
    return _grouped_binary(
        cast, command, bytes, raw_encode_pair, raw_read_pairs,
        "key binary, value binary", num_partitions, combiner,
    )


def pipe_rawbytes(df: DataFrame, command: str) -> DataFrame:
    """``-io rawbytes`` pipe: length-prefixed opaque bytes in and out —
    byte-exact transport for binary payloads. Output df(key, value) binary."""
    from ..operators.partition import fan_out

    cols = df.columns
    kv = fan_out(
        df.select(F.col(cols[0]).cast("binary").alias("k"), F.col(cols[1]).cast("binary").alias("v"))
    )

    def run(it):
        yield from _pipe_partition(it, command, raw_encode_pair, raw_read_pairs)

    return df.sparkSession.createDataFrame(kv.rdd.mapPartitions(run), "key binary, value binary")
