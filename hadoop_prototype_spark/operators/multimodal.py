"""Multimodal column plumbing (training-data pipeline extension).

Image/audio/video payloads are opaque `binary` columns + typed metadata
structs; decode/feature-extraction runs as Arrow-batched Pandas functions
over mapInPandas. PNG decode is REAL (stdlib zlib + the spec's five
scanline filters — ``decode_png`` / ``png_pixel_stats`` below); JPEG and
video decode remain honestly STUBBED (their codecs need media libraries
this environment does not have — clearly marked below). Everything
Spark-side is real either way: schemas, batch iteration, partition
sizing, and the UDF signatures match what a full decoder drops into.

The stub math is chosen to be exactly representable (integer byte sums over
a power-of-two divisor), so the oracle gate can verify the whole Arrow
batch path bit-for-bit against pure SQL — a real decoder loses that, but
gains nothing from approximate checking anyway.

Scale notes:
- binary payloads ride in parquet alongside metadata: scans prune to the
  metadata columns unless the payload is selected (column pruning keeps
  "count images wider than X" payload-free).
- mapInPandas streams Arrow batches — bound batch bytes via
  spark.sql.execution.arrow.maxRecordsPerBatch when payloads are large.
- repartition before decode so each task holds (batch × payload) that fits
  executor memory; decode is CPU-bound → size partitions to cores.
- kernels are BATCH-vectorized (numpy over the whole Arrow batch), never
  per-row pandas iteration — with a real decoder the per-row overhead of
  iterrows() would sit on top of every decode call.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id bigint, kind string, payload binary, "
    "meta struct<width: int, height: int, sample_rate: int, n_frames: int>"
)

IMAGE_FEATURES_SCHEMA = "media_id bigint, width int, height int, feature array<float>"
FRAME_SAMPLE_SCHEMA = "media_id bigint, frame_index int, frame_payload binary"

# stub "image" geometry: an 8x8 single-channel tile from the first 64 bytes
_TILE = 8
_TILE_BYTES = _TILE * _TILE
# power-of-two divisor: byte-column sums are ≤ 8*255 = 2040, so sum/2048 is
# exactly representable in float32 AND reproducible by any engine that can
# sum integers — the oracle computes the identical value in SQL
_FEATURE_DIVISOR = 2048.0


def synthesize_media(df: DataFrame, id_col: str, payload_from: str) -> DataFrame:
    """Build a deterministic fake media table from any table: payload =
    utf-8 bytes of a text column (stands in for encoded image bytes)."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.col(payload_from), "utf-8").alias("payload"),
        F.struct(
            (F.length(F.col(payload_from)) % 1920).cast("int").alias("width"),
            (F.length(F.col(payload_from)) % 1080).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def _decode_images_stub(payloads: np.ndarray) -> np.ndarray:
    """STUB batch decode kernel → (n, 64) uint8. A real deployment replaces
    this body with e.g. PIL.Image.open over each payload; this environment
    has no media libraries, so it derives a deterministic fake 'pixel'
    matrix from the first 64 payload bytes (zero-padded). The surrounding
    Spark plumbing (Arrow batching, schema, partitioning) is identical
    either way."""
    mat = np.zeros((len(payloads), _TILE_BYTES), dtype=np.uint8)
    for k, p in enumerate(payloads):  # per-payload frombuffer; no pandas rows
        b = bytes(p)[:_TILE_BYTES]
        mat[k, : len(b)] = np.frombuffer(b, dtype=np.uint8)
    return mat


def extract_image_features(media: DataFrame, batch_rows: int = 256) -> DataFrame:
    """Decode + featurize images via mapInPandas (Arrow batches).

    Feature[j] = (Σ_i pixel[i, j]) / 2048 as float32 — column sums of the
    8x8 stub tile, vectorized over the whole batch in one numpy reduction.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = _decode_images_stub(pdf["payload"].to_numpy())
            sums = mat.reshape(-1, _TILE, _TILE).sum(axis=1, dtype=np.int64)
            feats = (sums.astype(np.float32) / np.float32(_FEATURE_DIVISOR)).tolist()
            meta = pdf["meta"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "width": np.array([m["width"] for m in meta], dtype=np.int32),
                    "height": np.array([m["height"] for m in meta], dtype=np.int32),
                    "feature": feats,
                }
            )

    from .partition import fan_out

    # decode is CPU-bound per row — widen narrow inputs before the UDF
    return fan_out(media.filter(F.col("kind") == "image")).mapInPandas(
        run, IMAGE_FEATURES_SCHEMA
    )


def image_features_oracle_sql(table: str = "documents", id_col: str = "doc_id",
                              text_col: str = "text") -> str:
    """DuckDB SQL twin of synthesize_media → extract_image_features over an
    ASCII text table: byte p of the payload is ord(substr(text, p, 1)), 0
    past end-of-text; feature columns are exact integer sums / 2048."""

    def byte(pos: int) -> str:  # 1-based char position
        return (
            f"CASE WHEN length({text_col}) >= {pos} "
            f"THEN ord(substr({text_col}, {pos}, 1)) ELSE 0 END"
        )

    feats = []
    for j in range(_TILE):
        s = " + ".join(byte(i * _TILE + j + 1) for i in range(_TILE))
        feats.append(
            f"CAST(CAST({s} AS DOUBLE) / {_FEATURE_DIVISOR} AS FLOAT) AS f{j}"
        )
    return (
        f"SELECT CAST({id_col} AS BIGINT) AS media_id, "
        f"CAST(length({text_col}) % 1920 AS INT) AS width, "
        f"CAST(length({text_col}) % 1080 AS INT) AS height, "
        + ", ".join(feats)
        + f" FROM {table}"
    )


RESIZED_SCHEMA = "media_id bigint, out_size int, resized array<float>"


def resize_images(media: DataFrame, factor: int = 2, batch_rows: int = 256) -> DataFrame:
    """Batch image resize via mapInPandas — the downsample step of a
    training-data pipeline (thumbnail / fixed-res normalization).

    Stub kernel: mean-pool the 8x8 stub tile by ``factor`` (a real
    deployment swaps in PIL/cv2 interpolation over the decoded image; the
    Arrow batching, schema, and vectorized pooling shape are identical).
    Pool sums are ≤ factor²·255 over a power-of-two divisor, so every
    output is exactly representable in float32 and the whole resize path
    hash-checks against a pure-SQL oracle.
    """
    if _TILE % factor:
        raise ValueError(f"factor {factor} must divide tile size {_TILE}")
    out = _TILE // factor

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = _decode_images_stub(pdf["payload"].to_numpy())
            tiles = mat.reshape(-1, _TILE, _TILE)
            # one vectorized mean-pool over the whole Arrow batch
            pooled = (
                tiles.reshape(-1, out, factor, out, factor)
                .sum(axis=(2, 4), dtype=np.int64)
                .astype(np.float32)
                / np.float32(factor * factor)
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "out_size": np.full(len(pdf), out, dtype=np.int32),
                    "resized": pooled.reshape(-1, out * out).tolist(),
                }
            )

    from .partition import fan_out

    return fan_out(media.filter(F.col("kind") == "image")).mapInPandas(
        run, RESIZED_SCHEMA
    )


def resize_images_oracle_sql(table: str = "documents", id_col: str = "doc_id",
                             text_col: str = "text", factor: int = 2) -> str:
    """DuckDB SQL twin of synthesize_media → resize_images: pooled cell
    (r, c) is the exact integer sum of the factor×factor byte block divided
    by factor² (payload byte p = ord(substr(text, p, 1)), 0 past end)."""
    out = _TILE // factor

    def byte(pos: int) -> str:  # 1-based char position
        return (
            f"CASE WHEN length({text_col}) >= {pos} "
            f"THEN ord(substr({text_col}, {pos}, 1)) ELSE 0 END"
        )

    cells = []
    for r in range(out):
        for c in range(out):
            terms = [
                byte((r * factor + dr) * _TILE + (c * factor + dc) + 1)
                for dr in range(factor)
                for dc in range(factor)
            ]
            cells.append(
                f"CAST(CAST({' + '.join(terms)} AS DOUBLE) / {float(factor * factor)!r} "
                f"AS FLOAT) AS f{r * out + c}"
            )
    return (
        f"SELECT CAST({id_col} AS BIGINT) AS media_id, "
        f"CAST({out} AS INT) AS out_size, " + ", ".join(cells) + f" FROM {table}"
    )


def sample_frames(media: DataFrame, every_n: int = 2, max_frames: int = 4) -> DataFrame:
    """Frame sampling for video payloads: emits (media_id, frame_index,
    frame_payload) rows — an UNPIVOT-shaped mapInPandas (1 row → N rows).

    Frame extraction is stubbed (16-byte slices of the payload at stride
    every_n); a real decoder (pyav/ffmpeg) drops into the same loop.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids: list[int] = []
            out_idx: list[int] = []
            out_payload: list[bytes] = []
            # zip over raw arrays — no per-row pandas Series construction
            for mid, payload in zip(pdf["media_id"].to_numpy(), pdf["payload"]):
                p = bytes(payload)
                for i in range(0, min(max_frames * every_n, max(len(p), 1)), every_n):
                    out_ids.append(int(mid))
                    out_idx.append(i)
                    out_payload.append(p[i : i + 16])
            if not out_ids:
                continue
            yield pd.DataFrame(
                {"media_id": out_ids, "frame_index": out_idx, "frame_payload": out_payload}
            )

    return media.mapInPandas(run, FRAME_SAMPLE_SCHEMA)


def sample_frames_oracle_sql(table: str = "documents", id_col: str = "doc_id",
                             text_col: str = "text", every_n: int = 2,
                             max_frames: int = 4) -> str:
    """DuckDB SQL twin of synthesize_media → sample_frames over an ASCII
    text table: frame indexes are range(0, min(max_frames*every_n,
    max(len,1)), every_n); each frame is the 16-char slice at that offset."""
    stop = f"least({max_frames * every_n}, greatest(length({text_col}), 1))"
    return f"""
    SELECT CAST({id_col} AS BIGINT) AS media_id,
           CAST(t.i AS INT) AS frame_index,
           substr({text_col}, CAST(t.i AS INT) + 1, 16) AS frame_text
    FROM {table}, unnest(range(0, {stop}, {every_n})) AS t(i)
    """


# --- real PNG decode (stdlib-only) ------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # gray, rgb, gray+alpha, rgba

PNG_STATS_SCHEMA = (
    "media_id bigint, width int, height int, channels int, "
    "px_sum bigint, px_min int, px_max int, mean_px double, "
    "channel_sums array<bigint>"
)


_PNG_CTYPE_OF_CH = {1: 0, 2: 4, 3: 2, 4: 6}


def encode_png(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """Minimal REAL PNG encoder (stdlib zlib) — the write half of
    decode_png: 8-bit gray / gray+alpha / RGB / RGBA, one spec filter
    type applied to every scanline. Unlike decoding, filtering is fully
    vectorizable: the predictors (left/up/upper-left) reference the RAW
    image, so each filter is a couple of numpy shifts. Used for
    thumbnails/debug dumps and by the z_png_roundtrip_stats query, which
    pushes real pixel data through BOTH codecs in-engine."""
    import struct
    import zlib

    if arr.dtype != np.uint8 or arr.ndim != 3:
        raise ValueError("encode_png wants (h, w, ch) uint8")
    h, w, ch = arr.shape
    if ch not in _PNG_CTYPE_OF_CH:
        raise ValueError(f"unsupported channel count {ch}")
    if filter_type not in (0, 1, 2, 3, 4):
        raise ValueError(f"PNG filter type {filter_type} is undefined")
    flat = arr.reshape(h, w * ch).astype(np.int32)
    left = np.zeros_like(flat)
    left[:, ch:] = flat[:, :-ch]
    up = np.zeros_like(flat)
    up[1:] = flat[:-1]
    ul = np.zeros_like(flat)
    ul[1:, ch:] = flat[:-1, :-ch]
    if filter_type == 0:
        out = flat
    elif filter_type == 1:
        out = flat - left
    elif filter_type == 2:
        out = flat - up
    elif filter_type == 3:
        out = flat - ((left + up) >> 1)
    else:  # Paeth
        pa = np.abs(up - ul)
        pb = np.abs(left - ul)
        pc = np.abs(left + up - 2 * ul)
        pred = np.where(
            (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, ul)
        )
        out = flat - pred
    raw = bytearray()
    for r in range(h):
        raw.append(filter_type)
        raw += (out[r] & 255).astype(np.uint8).tobytes()

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, _PNG_CTYPE_OF_CH[ch], 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> np.ndarray:
    """REAL PNG decode — no media library, just the public spec: zlib
    (stdlib) inflates the concatenated IDAT stream, then the five defined
    scanline filters (None/Sub/Up/Average/Paeth, PNG spec §9) are
    reversed. Returns (height, width, channels) uint8.

    Supported: 8-bit depth, color types 0/2/4/6, non-interlaced — the
    shapes encoders actually emit for training corpora. Palette (type 3),
    16-bit, and Adam7 raise NotImplementedError so unsupported inputs
    fail loudly instead of decoding wrong. Filters Sub/Average/Paeth
    carry a byte-serial dependency, so those scanlines run a Python loop
    (a production deployment swaps in a C decoder; this kernel is for
    correctness and fixture-scale features)."""
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload (bad signature)")
    pos, idat = 8, bytearray()
    w = h = ctype = None
    while pos + 8 <= len(payload):
        ln = int.from_bytes(payload[pos : pos + 4], "big")
        typ = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + ln]
        if typ == b"IHDR":
            w = int.from_bytes(data[0:4], "big")
            h = int.from_bytes(data[4:8], "big")
            depth, ctype, interlace = data[8], data[9], data[12]
            if depth != 8 or ctype not in _PNG_CHANNELS or interlace:
                raise NotImplementedError(
                    f"PNG depth={depth} color_type={ctype} "
                    f"interlace={interlace} not supported (8-bit 0/2/4/6 "
                    f"non-interlaced only)"
                )
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
        pos += 12 + ln
    if w is None:
        raise ValueError("PNG has no IHDR chunk")
    raw = zlib.decompress(bytes(idat))
    ch = _PNG_CHANNELS[ctype]
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError(
            f"PNG scanline data is {len(raw)} bytes, expected {h * (stride + 1)}"
        )
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    p = 0
    for row in range(h):
        f = raw[p]
        line = np.frombuffer(raw[p + 1 : p + 1 + stride], dtype=np.uint8).astype(
            np.int32
        )
        p += 1 + stride
        if f == 0:
            cur = line
        elif f == 2:  # Up — no in-row dependency, vectorized
            cur = (line + prev) & 255
        elif f in (1, 3, 4):
            cur = np.zeros(stride, dtype=np.int32)
            for i in range(stride):
                a = int(cur[i - ch]) if i >= ch else 0
                b = int(prev[i])
                if f == 1:  # Sub
                    v = line[i] + a
                elif f == 3:  # Average
                    v = line[i] + ((a + b) >> 1)
                else:  # Paeth
                    c = int(prev[i - ch]) if i >= ch else 0
                    pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    v = line[i] + pred
                cur[i] = v & 255
        else:
            raise ValueError(f"PNG filter type {f} is undefined")
        out[row] = cur.astype(np.uint8)
        prev = cur
    return out.reshape(h, w, ch)


def png_pixel_stats(
    media: DataFrame, payload_col: str = "payload", id_col: str = "media_id"
) -> DataFrame:
    """Per-image pixel statistics from REAL PNG decode, over mapInPandas:
    (width, height, channels, exact integer pixel sum / min / max, mean,
    per-channel sums). Non-PNG payloads are skipped (routing by content
    type is sniff_media_format's job); unsupported PNG shapes raise —
    fail-loud, same contract as everything else in the validate family.

    All emitted numbers derive from exact integer sums (mean = a single
    double division), so results are independent of batch boundaries and
    partitioning."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, chs = [], [], [], []
            sums, mins, maxs, means, csums = [], [], [], [], []
            for mid, payload in zip(pdf[id_col].to_numpy(), pdf[payload_col]):
                p = bytes(payload)
                if p[:8] != _PNG_SIG:
                    continue
                arr = decode_png(p)
                h, w, ch = arr.shape
                total = int(arr.sum(dtype=np.int64))
                n = h * w * ch
                ids.append(int(mid))
                ws.append(w)
                hs.append(h)
                chs.append(ch)
                sums.append(total)
                mins.append(int(arr.min()) if n else 0)
                maxs.append(int(arr.max()) if n else 0)
                means.append(total / n if n else 0.0)
                csums.append(
                    [int(s) for s in arr.reshape(-1, ch).sum(axis=0, dtype=np.int64)]
                )
            if not ids:
                continue
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "width": np.array(ws, dtype=np.int32),
                    "height": np.array(hs, dtype=np.int32),
                    "channels": np.array(chs, dtype=np.int32),
                    "px_sum": np.array(sums, dtype=np.int64),
                    "px_min": np.array(mins, dtype=np.int32),
                    "px_max": np.array(maxs, dtype=np.int32),
                    "mean_px": np.array(means, dtype=np.float64),
                    "channel_sums": csums,
                }
            )

    return media.mapInPandas(run, PNG_STATS_SCHEMA)


PNG_ROUNDTRIP_SCHEMA = (
    "media_id bigint, width int, height int, channels int, "
    "px_sum bigint, px_min int, px_max int, mean_px double"
)


def _ascii_tile_bytes(mid, t) -> bytes:
    """First ``_TILE_BYTES`` bytes of a doc's text under the roundtrip
    fixture's ASCII contract, validated LOUDLY: the DuckDB oracle twin
    indexes CHARACTER code points (ord(substr(text, p, 1))) while the
    kernel slices UTF-8 BYTES — equal only for ASCII, and the oracle folds
    NULL to 0 while str(None) is the literal "None". A drifted fixture
    must fail here with the offending doc id, not as an opaque parity
    hash mismatch downstream."""
    if t is None:
        raise ValueError(
            f"doc {mid}: NULL text violates the roundtrip fixture's "
            "ASCII/non-null contract"
        )
    b = str(t).encode("utf-8")[:_TILE_BYTES]
    if not b.isascii():
        raise ValueError(
            f"doc {mid}: non-ASCII byte in the first {_TILE_BYTES} text "
            "bytes — the byte-sliced kernel and the character-indexed "
            "oracle would diverge"
        )
    return b


def png_roundtrip_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Engine-side PNG codec round-trip with an oracle-checkable output:
    each doc's first 64 text bytes (ASCII fixture contract, the
    image_features convention) become an 8×8 gray tile, ENCODED to a real
    PNG with filter type = id % 5 — all five spec filters exercised
    across the corpus — and DECODED back by decode_png. The emitted stats
    are a pure function of the text bytes, so DuckDB hash-checks the
    whole zlib+filter path without any media library: any codec bug
    (filter math, scanline framing, chunk layout) breaks the parity gate.
    mean_px = px_sum / 64 — an exact power-of-two division, identical in
    both engines."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids, sums, mins, maxs = [], [], [], []
            for mid, t in zip(pdf[id_col].to_numpy(), pdf[text_col]):
                b = _ascii_tile_bytes(mid, t)
                tile = np.zeros(_TILE_BYTES, dtype=np.uint8)
                tile[: len(b)] = np.frombuffer(b, dtype=np.uint8)
                payload = encode_png(
                    tile.reshape(_TILE, _TILE, 1), filter_type=int(mid) % 5
                )
                dec = decode_png(payload)
                ids.append(int(mid))
                sums.append(int(dec.sum(dtype=np.int64)))
                mins.append(int(dec.min()))
                maxs.append(int(dec.max()))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "width": np.full(len(ids), _TILE, dtype=np.int32),
                    "height": np.full(len(ids), _TILE, dtype=np.int32),
                    "channels": np.ones(len(ids), dtype=np.int32),
                    "px_sum": np.array(sums, dtype=np.int64),
                    "px_min": np.array(mins, dtype=np.int32),
                    "px_max": np.array(maxs, dtype=np.int32),
                    "mean_px": np.array(sums, dtype=np.float64) / float(_TILE_BYTES),
                }
            )

    return df.select(id_col, text_col).mapInPandas(run, PNG_ROUNDTRIP_SCHEMA)


def png_roundtrip_stats_oracle_sql(
    table: str = "documents", id_col: str = "doc_id", text_col: str = "text"
) -> str:
    """DuckDB twin of png_roundtrip_stats: byte p of the tile is
    ord(substr(text, p, 1)), 0 past end-of-text; stats are exact integer
    folds over the 64 tile bytes (the codec round-trip is lossless, so
    the oracle needs no PNG model — that IS the check)."""

    def byte(pos: int) -> str:  # 1-based char position
        return (
            f"CASE WHEN length({text_col}) >= {pos} "
            f"THEN ord(substr({text_col}, {pos}, 1)) ELSE 0 END"
        )

    terms = [byte(p) for p in range(1, _TILE_BYTES + 1)]
    total = " + ".join(terms)
    return f"""
    SELECT CAST({id_col} AS BIGINT) AS media_id,
           CAST({_TILE} AS INT) AS width,
           CAST({_TILE} AS INT) AS height,
           CAST(1 AS INT) AS channels,
           CAST({total} AS BIGINT) AS px_sum,
           CAST(least({", ".join(terms)}) AS INT) AS px_min,
           CAST(greatest({", ".join(terms)}) AS INT) AS px_max,
           CAST({total} AS DOUBLE) / {float(_TILE_BYTES)!r} AS mean_px
    FROM {table}
    """


# --- real WAV decode (stdlib-only) ------------------------------------------


def encode_wav(
    samples: np.ndarray, sample_rate: int = 8000
) -> bytes:
    """Minimal REAL WAV encoder: PCM16, (n, channels) int16 → RIFF/WAVE
    with a canonical fmt chunk. The write half of decode_wav."""
    import struct

    if samples.dtype != np.int16 or samples.ndim != 2:
        raise ValueError("encode_wav wants (n, channels) int16")
    n, ch = samples.shape
    data = samples.astype("<i2").tobytes()
    byte_rate = sample_rate * ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, byte_rate, ch * 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """REAL WAV decode — RIFF chunk walk (fmt may come after JUNK/LIST
    chunks; chunks are word-aligned), PCM 16-bit or unsigned 8-bit.
    Returns ((n, channels) int16, sample_rate); 8-bit input is widened
    to int16 ((x-128)·256, the standard mapping). Compressed codecs
    (float, ADPCM, mp3-in-wav) raise NotImplementedError — fail-loud,
    same contract as decode_png."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload (bad RIFF/WAVE header)")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        ln = struct.unpack("<I", payload[pos + 4 : pos + 8])[0]
        body = payload[pos + 8 : pos + 8 + ln]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + ln + (ln & 1)  # chunks are 2-byte aligned
    if fmt is None or data is None:
        raise ValueError("WAV has no fmt/data chunk")
    audio_format, ch, rate, _br, _ba, bits = fmt
    if audio_format != 1 or bits not in (8, 16):
        raise NotImplementedError(
            f"WAV format={audio_format} bits={bits} not supported "
            f"(PCM 8/16-bit only)"
        )
    if bits == 16:
        arr = np.frombuffer(data[: len(data) // (2 * ch) * 2 * ch], dtype="<i2")
        out = arr.astype(np.int16).reshape(-1, ch)
    else:
        arr = np.frombuffer(data[: len(data) // ch * ch], dtype=np.uint8)
        out = ((arr.astype(np.int16) - 128) * 256).reshape(-1, ch)
    return out, int(rate)


WAV_ROUNDTRIP_SCHEMA = (
    "media_id bigint, sample_rate int, n_channels int, n_samples bigint, "
    "amp_sum bigint, amp_max int, mean_amp double"
)


def wav_roundtrip_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Engine-side WAV codec round-trip, the audio twin of
    png_roundtrip_stats: each doc's first 64 text bytes become PCM16
    samples ((byte−128)·256 — the 8-bit widening convention), encoded to
    a real RIFF/WAVE payload and decoded back by decode_wav; amplitude
    stats are a pure function of the text bytes, so DuckDB hash-checks
    the header/framing/PCM path end to end. mean_amp = amp_sum /
    n_samples (exact-int division in double — identical both engines)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids, ns, sums, maxs, means = [], [], [], [], []
            for mid, t in zip(pdf[id_col].to_numpy(), pdf[text_col]):
                b = _ascii_tile_bytes(mid, t)
                tile = np.zeros(_TILE_BYTES, dtype=np.int16)
                tile[: len(b)] = np.frombuffer(b, dtype=np.uint8).astype(np.int16)
                samples = ((tile - 128) * 256).astype(np.int16).reshape(-1, 1)
                dec, rate = decode_wav(encode_wav(samples, sample_rate=8000))
                amp = np.abs(dec.astype(np.int64))
                n = int(dec.shape[0])
                total = int(amp.sum())
                ids.append(int(mid))
                ns.append(n)
                sums.append(total)
                maxs.append(int(amp.max()))
                means.append(total / n)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "sample_rate": np.full(len(ids), 8000, dtype=np.int32),
                    "n_channels": np.ones(len(ids), dtype=np.int32),
                    "n_samples": np.array(ns, dtype=np.int64),
                    "amp_sum": np.array(sums, dtype=np.int64),
                    "amp_max": np.array(maxs, dtype=np.int32),
                    "mean_amp": np.array(means, dtype=np.float64),
                }
            )

    return df.select(id_col, text_col).mapInPandas(run, WAV_ROUNDTRIP_SCHEMA)


def wav_roundtrip_stats_oracle_sql(
    table: str = "documents", id_col: str = "doc_id", text_col: str = "text"
) -> str:
    """DuckDB twin of wav_roundtrip_stats: sample p = (byte_p − 128)·256,
    byte 0 past end-of-text; amplitude folds are exact integers."""

    def amp(pos: int) -> str:  # |(byte-128)*256| as an exact int expr
        b = (
            f"CASE WHEN length({text_col}) >= {pos} "
            f"THEN ord(substr({text_col}, {pos}, 1)) ELSE 0 END"
        )
        return f"abs(({b} - 128) * 256)"

    terms = [amp(p) for p in range(1, _TILE_BYTES + 1)]
    total = " + ".join(terms)
    return f"""
    SELECT CAST({id_col} AS BIGINT) AS media_id,
           CAST(8000 AS INT) AS sample_rate,
           CAST(1 AS INT) AS n_channels,
           CAST({_TILE_BYTES} AS BIGINT) AS n_samples,
           CAST({total} AS BIGINT) AS amp_sum,
           CAST(greatest({", ".join(terms)}) AS INT) AS amp_max,
           CAST({total} AS DOUBLE) / {float(_TILE_BYTES)!r} AS mean_amp
    FROM {table}
    """


def sniff_media_format(media: DataFrame, payload_col: str = "payload",
                       id_col: str = "media_id") -> DataFrame:
    """Container-format triage WITHOUT decoding — a REAL kernel (unlike
    the stubbed pixel decode, this needs no media libraries): the format
    from the leading magic bytes, plus the header fields that live at
    fixed offsets — PNG width/height (IHDR, big-endian u32 at bytes
    17-24) and WAV sample rate (fmt chunk, little-endian u32 at bytes
    25-28). The sample rate is only emitted when the first chunk after
    the RIFF/WAVE header actually IS 'fmt ' (bytes 13-16): real WAVs with
    a JUNK/LIST chunk before fmt keep format='wav' but get a NULL rate —
    honest triage beats a confidently wrong number read from whatever
    chunk happens to sit there.

    The 100 TB ingestion-triage stage: routing/filtering petabytes of
    scraped media by actual content type (extensions lie) before any
    expensive decode. Pure codegen byte arithmetic — substring on the
    binary column + hex/conv — so it runs JVM-side at scan speed and the
    payload bytes never leave the executor."""
    p = payload_col

    def be32(off: int) -> str:  # big-endian u32 at 1-based byte offset
        return f"CAST(conv(hex(substring({p}, {off}, 4)), 16, 10) AS BIGINT)"

    def byte(off: int) -> str:
        return f"CAST(conv(hex(substring({p}, {off}, 1)), 16, 10) AS BIGINT)"

    fmt = f"""
        CASE
          WHEN substring({p}, 1, 8) = X'89504E470D0A1A0A' THEN 'png'
          WHEN substring({p}, 1, 2) = X'FFD8' THEN 'jpeg'
          WHEN substring({p}, 1, 6) IN (X'474946383761', X'474946383961') THEN 'gif'
          WHEN substring({p}, 1, 4) = X'52494646' AND substring({p}, 9, 4) = X'57415645'
              THEN 'wav'
          ELSE 'unknown'
        END
    """
    return media.selectExpr(
        id_col,
        f"({fmt}) AS format",
        f"CASE WHEN ({fmt}) = 'png' THEN CAST({be32(17)} AS INT) END AS width",
        f"CASE WHEN ({fmt}) = 'png' THEN CAST({be32(21)} AS INT) END AS height",
        f"CASE WHEN ({fmt}) = 'wav' AND substring({p}, 13, 4) = X'666D7420'"
        f" THEN CAST({byte(25)} + 256 * {byte(26)}"
        f" + 65536 * {byte(27)} + 16777216 * {byte(28)} AS INT) END AS sample_rate",
    )
