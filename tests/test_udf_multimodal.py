"""UDF surface (pipe / mapInPandas / grouped reduce), counters, multimodal."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from hadoop_prototype_spark.functions.counters import with_counters
from hadoop_prototype_spark.functions.udf_surface import grouped_reduce, map_in_pandas, pipe_lines
from hadoop_prototype_spark.operators.multimodal import (
    extract_image_features,
    sample_frames,
    synthesize_media,
)
from hadoop_prototype_spark.sources.tables import load_table


def test_pipe_lines_executable(spark):
    """Hadoop Streaming contract: external executable over the line protocol."""
    df = spark.createDataFrame([("a", "1"), ("b", "2")], ["k", "v"])
    out = pipe_lines(df, "tr 'a-z' 'A-Z'")
    rows = sorted((r.key, r.value) for r in out.collect())
    assert rows == [("A", "1"), ("B", "2")]


def test_map_in_pandas_batches(spark):
    df = spark.range(1000).select(F.col("id"))

    def double_it(batches):
        for pdf in batches:
            yield pd.DataFrame({"id": pdf["id"], "doubled": pdf["id"] * 2})

    out = map_in_pandas(df, double_it, "id long, doubled long")
    assert out.filter(F.col("doubled") != F.col("id") * 2).count() == 0
    assert out.count() == 1000


def test_grouped_reduce_sorted_iterator(spark):
    """The reducer sees values sorted within the group (Reducer.java:58-82)."""
    df = spark.createDataFrame(
        [("a", 3), ("a", 1), ("a", 2), ("b", 9), ("b", 7)], ["k", "v"]
    )

    def first_after_sort(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"k": [pdf["k"].iloc[0]], "first_v": [pdf["v"].iloc[0]]})

    out = grouped_reduce(df, ["k"], ["v"], first_after_sort, "k string, first_v long")
    assert {r.k: r.first_v for r in out.collect()} == {"a": 1, "b": 7}


def test_counters_observe(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    counted, obs = with_counters(
        li, {"records": F.count(F.lit(1)), "total_qty": F.sum("l_quantity")}
    )
    n = counted.count()
    assert obs.get["records"] == n
    assert obs.get["total_qty"] > 0


def test_multimodal_plumbing(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    media = synthesize_media(docs, "doc_id", "text")
    assert [f.name for f in media.schema] == ["media_id", "kind", "payload", "meta"]

    feats = extract_image_features(media.limit(50))
    rows = feats.collect()
    assert len(rows) == 50
    assert all(len(r.feature) == 8 for r in rows)

    frames = sample_frames(media.limit(10), every_n=2, max_frames=3)
    pdf = frames.toPandas()
    assert set(pdf.columns) == {"media_id", "frame_index", "frame_payload"}
    assert pdf.groupby("media_id").size().max() <= 3
    # payload columns stay binary through the arrow boundary
    assert isinstance(pdf["frame_payload"].iloc[0], (bytes, bytearray))


def test_pipe_grouped_reducer_contract(spark):
    """The streaming REDUCER stage (PipeReducer.java:40): the script sees
    every line of a key contiguously and key-sorted, so a sum-on-key-change
    awk reducer gets exact totals."""
    from hadoop_prototype_spark.functions.udf_surface import pipe_grouped

    rows = [("b", 1), ("a", 2), ("b", 3), ("a", 4), ("c", 5)] * 10
    df = spark.createDataFrame(rows, ["k", "v"])
    awk = (
        "awk -F'\\t' '"
        "$1 != k { if (n) print k \"\\t\" s; k = $1; s = 0; n = 1 } "
        "{ s += $2 } "
        "END { if (n) print k \"\\t\" s }'"
    )
    out = pipe_grouped(df, awk)
    got = {r.key: int(r.value) for r in out.collect()}
    assert got == {"a": 60, "b": 40, "c": 50}


def test_pipe_combined_two_stage_contract(spark):
    """The -combiner stage (PipeCombiner.java:26): the combiner runs over
    each map partition's key-sorted lines BEFORE the shuffle, the reducer
    over the shuffled partial sums — totals must equal a plain group sum
    for any partitioning (sum is associative)."""
    from hadoop_prototype_spark.functions.udf_surface import pipe_combined

    rows = [("b", 1), ("a", 2), ("b", 3), ("a", 4), ("c", 5)] * 10
    df = spark.createDataFrame(rows, ["k", "v"]).repartition(7)  # many map partitions
    awk = (
        "awk -F'\\t' '"
        "$1 != k { if (n) print k \"\\t\" s; k = $1; s = 0; n = 1 } "
        "{ s += $2 } "
        "END { if (n) print k \"\\t\" s }'"
    )
    out = pipe_combined(df, awk, awk)
    got = {r.key: int(r.value) for r in out.collect()}
    assert got == {"a": 60, "b": 40, "c": 50}


def test_documents_text_is_ascii_and_non_null():
    """Fixture invariant the multimodal oracles depend on: the byte-position
    SQL twins (image_features_oracle_sql / sample_frames_oracle_sql) equate
    CHAR positions with BYTE positions, which only holds for ASCII text.
    Pin it at both gate scale factors so a fixture regeneration cannot
    silently invalidate the oracles."""
    import pyarrow.parquet as pq

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        texts = pq.read_table(f"{sf}/documents.parquet", columns=["text"])["text"]
        py = texts.to_pylist()
        assert all(t is not None for t in py), f"{sf}: NULL text"
        assert all(t.isascii() for t in py), f"{sf}: non-ASCII text breaks byte-pos oracles"


# --- Python UDTF surface -----------------------------------------------------


def test_udtf_tokenize_matches_codegen_twin(spark):
    """The UDTF (slow-path, 1→N rows from Python) must agree exactly with
    the codegen explode+split twin — API-surface parity, same answer."""
    from pyspark.sql import functions as F

    from hadoop_prototype_spark.functions.udtf_surface import register_udtfs

    register_udtfs(spark)
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "  x  y "), (3, None), (4, "single")], ["doc_id", "text"]
    )
    docs.createOrReplaceTempView("udtf_docs")
    got = sorted(
        (r.doc_id, r.pos, r.token)
        for r in spark.sql(
            "SELECT d.doc_id, t.pos, t.token FROM udtf_docs d, LATERAL tokenize(d.text) t"
        ).collect()
    )
    twin = sorted(
        (r.doc_id, r.pos, r.token)
        for r in docs.filter(F.col("text").isNotNull())
        .select(
            "doc_id",
            F.posexplode(F.split(F.trim("text"), r"\s+")).alias("pos", "token"),
        )
        .filter(F.col("token") != "")
        .collect()
    )
    assert got == twin
    assert (1, 0, "a") in got and (2, 0, "x") in got


def test_udtf_parse_kv_and_fields(spark):
    from hadoop_prototype_spark.functions.udtf_surface import register_udtfs

    register_udtfs(spark)
    spark.createDataFrame(
        [("k1\tv1",), ("k2\tv2a\tv2b",), ("noval",)], ["line"]
    ).createOrReplaceTempView("udtf_lines")
    kv = sorted(
        (r.key, r.value)
        for r in spark.sql(
            "SELECT t.* FROM udtf_lines l, LATERAL parse_kv(l.line) t"
        ).collect()
    )
    assert kv == [("k1", "v1"), ("k2", "v2a\tv2b"), ("noval", "")]
    fields = spark.sql(
        "SELECT t.* FROM udtf_lines l, LATERAL explode_fields(l.line) t WHERE l.line LIKE 'k2%'"
    ).collect()
    assert sorted((r.field, r.idx) for r in fields) == [("k2", 0), ("v2a", 1), ("v2b", 2)]


def test_sniff_media_format_real_headers(spark):
    """Hand-built REAL container headers: the sniffer must identify each
    format from magic bytes and read PNG dims / WAV sample rate from the
    actual header layout — no media libraries involved."""
    import struct

    from hadoop_prototype_spark.operators.multimodal import sniff_media_format

    png = (
        b"\x89PNG\r\n\x1a\n"                       # signature (8)
        + struct.pack(">I", 13) + b"IHDR"           # IHDR length+type (8)
        + struct.pack(">II", 640, 480)              # width, height BE
        + b"\x08\x02\x00\x00\x00"
    )
    wav = (
        b"RIFF" + struct.pack("<I", 36) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16)
        + struct.pack("<HH", 1, 1)                  # PCM, mono
        + struct.pack("<I", 44100)                  # sample rate LE @ byte 25
        + struct.pack("<IHH", 88200, 2, 16)
    )
    jpeg = b"\xff\xd8\xff\xe0" + b"\x00" * 16
    gif = b"GIF89a" + b"\x00" * 16
    junk = b"plain text bytes"
    # real-world WAV with a JUNK chunk BEFORE fmt (common from DAW exports):
    # still 'wav', but the fixed-offset rate field is some other chunk's
    # bytes — must come back NULL, not a confidently wrong number
    wav_junk = (
        b"RIFF" + struct.pack("<I", 64) + b"WAVE"
        + b"JUNK" + struct.pack("<I", 28) + b"\x00" * 28
        + b"fmt " + struct.pack("<I", 16)
        + struct.pack("<HH", 1, 1)
        + struct.pack("<I", 44100)
        + struct.pack("<IHH", 88200, 2, 16)
    )

    df = spark.createDataFrame(
        [(1, png), (2, wav), (3, jpeg), (4, gif), (5, junk), (6, wav_junk)],
        "media_id bigint, payload binary",
    )
    out = {r.media_id: r for r in sniff_media_format(df).collect()}
    assert out[1].format == "png" and (out[1].width, out[1].height) == (640, 480)
    assert out[2].format == "wav" and out[2].sample_rate == 44100
    assert out[3].format == "jpeg" and out[3].width is None
    assert out[4].format == "gif"
    assert out[5].format == "unknown" and out[5].sample_rate is None
    assert out[6].format == "wav" and out[6].sample_rate is None


# --- real PNG decode ---------------------------------------------------------

def _encode_png(pixels, filters, color_type=None):
    """Independent reference PNG encoder (test-side twin of decode_png):
    pure-Python integer filter math straight from the spec, one chosen
    filter type per scanline — so the decoder's numpy path is checked
    against a second implementation, not against itself."""
    import struct
    import zlib

    h = len(pixels)
    w = len(pixels[0])
    ch = len(pixels[0][0])
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[ch] if color_type is None else color_type

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    raw = bytearray()
    prev = [0] * (w * ch)
    for r in range(h):
        cur = [v for px in pixels[r] for v in px]
        f = filters[r]
        raw.append(f)
        for i in range(w * ch):
            a = cur[i - ch] if i >= ch else 0
            b = prev[i]
            c = prev[i - ch] if i >= ch else 0
            if f == 0:
                x = cur[i]
            elif f == 1:
                x = cur[i] - a
            elif f == 2:
                x = cur[i] - b
            elif f == 3:
                x = cur[i] - ((a + b) >> 1)
            else:
                pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                x = cur[i] - pred
            raw.append(x % 256)
        prev = cur
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def _test_pixels(h, w, ch, seed):
    """Deterministic, filter-stressing pixel field (no RNG in tests)."""
    return [
        [
            tuple((seed + 37 * r + 11 * c + 7 * k + r * c) % 256 for k in range(ch))
            for c in range(w)
        ]
        for r in range(h)
    ]


def test_decode_png_reverses_every_filter_and_color_type():
    """Round-trip through the independent encoder: every defined filter
    type (0..4) on every supported channel count decodes to the exact
    source pixels — the round-9 verdict #5 'real kernel' pin."""
    import numpy as np

    from hadoop_prototype_spark.operators.multimodal import decode_png

    for ch in (1, 2, 3, 4):
        for f in (0, 1, 2, 3, 4):
            px = _test_pixels(5, 7, ch, seed=f + 10 * ch)
            payload = _encode_png(px, filters=[f] * 5)
            got = decode_png(payload)
            assert got.shape == (5, 7, ch)
            assert got.tolist() == [[list(p) for p in row] for row in px], (ch, f)
    # mixed filters within one image (what real encoders emit)
    px = _test_pixels(5, 7, 3, seed=99)
    got = decode_png(_encode_png(px, filters=[0, 1, 2, 3, 4]))
    assert got.tolist() == [[list(p) for p in row] for row in px]


def test_decode_png_rejects_unsupported_shapes():
    import pytest

    from hadoop_prototype_spark.operators.multimodal import decode_png

    px = _test_pixels(2, 2, 1, seed=1)
    with pytest.raises(NotImplementedError, match="color_type=3"):
        decode_png(_encode_png(px, filters=[0, 0], color_type=3))
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"\xff\xd8not a png")


def test_png_pixel_stats_end_to_end(spark):
    """Spark e2e: a media table of real PNG payloads (all five filters,
    1/3/4 channels) through png_pixel_stats — exact integer sums, per-
    channel sums, and header agreement with sniff_media_format."""
    import numpy as np

    from hadoop_prototype_spark.operators.multimodal import (
        png_pixel_stats,
        sniff_media_format,
    )

    specs = [(1, 1), (2, 3), (3, 4)]  # (media_id, channels)
    payloads, want = [], {}
    for mid, ch in specs:
        px = _test_pixels(6, 5, ch, seed=mid)
        payloads.append((mid, bytearray(_encode_png(px, filters=[0, 1, 2, 3, 4, 2]))))
        arr = np.array(px, dtype=np.int64)
        want[mid] = (
            5, 6, ch,
            int(arr.sum()),
            int(arr.min()),
            int(arr.max()),
            [int(s) for s in arr.reshape(-1, ch).sum(axis=0)],
        )
    # one non-PNG payload: skipped, not failed
    payloads.append((99, bytearray(b"\xff\xd8jpeg-ish")))
    media = spark.createDataFrame(payloads, "media_id bigint, payload binary")
    rows = {r.media_id: r for r in png_pixel_stats(media).collect()}
    assert sorted(rows) == [1, 2, 3]
    for mid, (w, h, ch, total, lo, hi, csums) in want.items():
        r = rows[mid]
        assert (r.width, r.height, r.channels) == (w, h, ch)
        assert (r.px_sum, r.px_min, r.px_max) == (total, lo, hi)
        assert r.mean_px == total / (w * h * ch)
        assert list(r.channel_sums) == csums
    # the sniffer reads the same geometry straight from the header
    sniffed = {r.media_id: r for r in sniff_media_format(media).collect()}
    for mid, _ in specs:
        assert sniffed[mid].format == "png"
        assert (sniffed[mid].width, sniffed[mid].height) == (5, 6)


def test_library_encoder_roundtrip_and_cross_decode():
    """encode_png (vectorized library encoder) round-trips through
    decode_png for every filter/channel combo, and its decoded output
    matches the independent test encoder's for the same pixels."""
    import numpy as np

    from hadoop_prototype_spark.operators.multimodal import decode_png, encode_png

    for ch in (1, 2, 3, 4):
        for f in (0, 1, 2, 3, 4):
            px = _test_pixels(6, 4, ch, seed=3 * f + ch)
            arr = np.array(px, dtype=np.uint8)
            assert np.array_equal(decode_png(encode_png(arr, f)), arr), (ch, f)
            ref = decode_png(_encode_png(px, filters=[f] * 6))
            assert np.array_equal(ref, arr), (ch, f)


def test_png_roundtrip_stats_exercises_all_filters(spark):
    """The registered query's operator: ids 0..4 hit filter types 0..4;
    stats equal the raw text-byte folds for each."""
    import numpy as np

    from hadoop_prototype_spark.operators.multimodal import png_roundtrip_stats

    rows = [(i, f"doc {i} " + "x" * (20 + 13 * i)) for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r.media_id: r for r in png_roundtrip_stats(df).collect()}
    for i, t in rows:
        b = t.encode()[:64]
        tile = np.zeros(64, dtype=np.int64)
        tile[: len(b)] = np.frombuffer(b, dtype=np.uint8)
        r = got[i]
        assert (r.px_sum, r.px_min, r.px_max) == (
            int(tile.sum()), int(tile.min()), int(tile.max())
        ), i
        assert r.mean_px == tile.sum() / 64


def test_wav_codec_roundtrip_and_junk_chunk():
    """decode_wav reverses encode_wav exactly (16-bit stereo included);
    a JUNK chunk before fmt (real-world WAVs) parses fine; 8-bit PCM
    widens by the (x-128)*256 convention; compressed formats raise."""
    import struct

    import numpy as np
    import pytest

    from hadoop_prototype_spark.operators.multimodal import decode_wav, encode_wav

    s = np.array([[0, 100], [-32768, 32767], [5, -5]], dtype=np.int16)
    payload = encode_wav(s, sample_rate=44100)
    dec, rate = decode_wav(payload)
    assert rate == 44100 and np.array_equal(dec, s)

    # splice a JUNK chunk between WAVE and fmt (odd length → word align)
    head, rest = payload[:12], payload[12:]
    junk = b"JUNK" + struct.pack("<I", 3) + b"xyz\x00"
    spliced = b"RIFF" + struct.pack("<I", len(rest) + len(junk) + 4) + head[8:12] + junk + rest
    dec2, rate2 = decode_wav(spliced)
    assert rate2 == 44100 and np.array_equal(dec2, s)

    # 8-bit PCM: hand-build (fmt bits=16->8, bytes are unsigned)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    data = bytes([0, 128, 255])
    body = b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt + b"data" + struct.pack("<I", 3) + data
    wav8 = b"RIFF" + struct.pack("<I", len(body)) + body
    dec3, _ = decode_wav(wav8)
    assert dec3.flatten().tolist() == [(0 - 128) * 256, 0, (255 - 128) * 256]

    # float PCM (format 3) must fail loudly
    fmtf = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
    bodyf = b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmtf + b"data" + struct.pack("<I", 0)
    with pytest.raises(NotImplementedError):
        decode_wav(b"RIFF" + struct.pack("<I", len(bodyf)) + bodyf)
