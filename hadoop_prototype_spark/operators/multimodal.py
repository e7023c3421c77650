"""Multimodal column plumbing (training-data pipeline extension).

Image/audio/video payloads are opaque `binary` columns + typed metadata
structs; decode/feature-extraction runs as Arrow-batched Pandas functions
over mapInPandas. The decode kernels themselves are STUBBED here (no media
libraries in this environment — clearly marked below); everything Spark-side
is real: schemas, batch iteration, partition sizing, and the UDF signatures
match what a real decoder drops into.

Scale notes:
- binary payloads ride in parquet alongside metadata: scans prune to the
  metadata columns unless the payload is selected (column pruning keeps
  "count images wider than X" payload-free).
- mapInPandas streams Arrow batches — bound batch bytes via
  spark.sql.execution.arrow.maxRecordsPerBatch when payloads are large.
- repartition before decode so each task holds (batch × payload) that fits
  executor memory; decode is CPU-bound → size partitions to cores.
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


def _decode_image_stub(payload: bytes) -> np.ndarray:
    """STUB decode kernel. A real deployment replaces this body with e.g.
    PIL.Image.open(io.BytesIO(payload)); this environment has no media
    libraries, so it derives a deterministic fake 'pixel' array from the
    payload bytes — the Spark-side plumbing (batching, schema, partitioning)
    is identical either way."""
    arr = np.frombuffer(payload[:64].ljust(64, b"\0"), dtype=np.uint8)
    return arr.reshape(8, 8).astype(np.float32)


def extract_image_features(media: DataFrame, batch_rows: int = 256) -> DataFrame:
    """Decode + featurize images via mapInPandas (Arrow batches).

    Feature = flattened 8x8 'pixel' mean-pooled — stub math, real dataflow.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, widths, heights, ids = [], [], [], []
            for _, row in pdf.iterrows():
                img = _decode_image_stub(row["payload"])
                feats.append((img / 255.0).mean(axis=0).tolist())
                widths.append(int(row["meta"]["width"]))
                heights.append(int(row["meta"]["height"]))
                ids.append(int(row["media_id"]))
            yield pd.DataFrame(
                {"media_id": ids, "width": widths, "height": heights, "feature": feats}
            )

    from .partition import fan_out

    # decode is CPU-bound per row — widen narrow inputs before the UDF
    return fan_out(media.filter(F.col("kind") == "image")).mapInPandas(
        run, IMAGE_FEATURES_SCHEMA
    )


def sample_frames(media: DataFrame, every_n: int = 2, max_frames: int = 4) -> DataFrame:
    """Frame sampling for video payloads: emits (media_id, frame_index,
    frame_payload) rows — an UNPIVOT-shaped mapInPandas (1 row → N rows).

    Frame extraction is stubbed (slices of the payload); a real decoder
    (pyav/ffmpeg) drops into the same loop.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_idx, out_payload = [], [], []
            for _, row in pdf.iterrows():
                payload = row["payload"]
                for i in range(0, min(max_frames * every_n, max(len(payload), 1)), every_n):
                    out_ids.append(int(row["media_id"]))
                    out_idx.append(i)
                    out_payload.append(payload[i : i + 16])
            yield pd.DataFrame(
                {"media_id": out_ids, "frame_index": out_idx, "frame_payload": out_payload}
            )

    return media.mapInPandas(run, FRAME_SAMPLE_SCHEMA)
