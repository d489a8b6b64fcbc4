"""Multimodal column operators: image/audio/video as opaque binary columns
with typed metadata.

A 100 TB training-data pipeline carries media as `binary` columns next to
typed metadata structs; decode/feature-extraction runs as Arrow-batched
Pandas UDFs on executors. The image/audio libraries are NOT in this
container, so the decode kernels are deterministic fakes behind the real
Spark plumbing (schema, mapInPandas batch shape, partitioning) — swap
`_decode_image_batch` for a PIL/libvips call and nothing else changes.

Payload convention for the fake decoder: bytes[0:4] = width (little-endian
uint32), bytes[4:8] = height; the rest is "pixel data".
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from automem_spark.plans.parallelism import ensure_parallelism

IMAGE_META_SCHEMA = "id bigint, width int, height int, n_bytes bigint, sha256 string"
FEATURE_DIM = 16


def _decode_image_batch(payloads: pd.Series) -> pd.DataFrame:
    """Deterministic fake decode. A real build replaces this body with e.g.
    PIL.Image.open(io.BytesIO(b)) — the Spark-side contract is unchanged."""
    rows = []
    for b in payloads:
        b = bytes(b or b"")
        if len(b) >= 8:
            width, height = struct.unpack("<II", b[:8])
        else:
            width, height = 0, 0
        rows.append((width, height, len(b), hashlib.sha256(b).hexdigest()))
    return pd.DataFrame(rows, columns=["width", "height", "n_bytes", "sha256"])


def decode_images(df: DataFrame, *, id_col: str = "id", payload_col: str = "payload") -> DataFrame:
    """Image metadata extraction over mapInPandas (Arrow batches; one Python
    roundtrip per batch, not per row)."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = _decode_image_batch(pdf[payload_col])
            meta.insert(0, "id", pdf[id_col].values)
            yield meta

    return ensure_parallelism(df.select(id_col, payload_col)).mapInPandas(
        run, schema=IMAGE_META_SCHEMA
    )


def extract_features(
    df: DataFrame, *, id_col: str = "id", payload_col: str = "payload", dim: int = FEATURE_DIM
) -> DataFrame:
    """Feature embedding per media payload (deterministic fake: SHA-256 bytes
    mapped to [0,1) floats). Real build: a vision/audio encoder batched over
    the same mapInPandas contract."""
    schema = f"id bigint, features array<double>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for b in pdf[payload_col]:
                digest = hashlib.sha256(bytes(b or b"")).digest()
                # repeat digest to cover dim*4 bytes, map uint32 -> [0,1)
                raw = (digest * ((dim * 4) // len(digest) + 1))[: dim * 4]
                arr = np.frombuffer(raw, dtype="<u4").astype(np.float64) / 2**32
                feats.append(arr.tolist())
            yield pd.DataFrame({"id": pdf[id_col].values, "features": feats})

    return ensure_parallelism(df.select(id_col, payload_col)).mapInPandas(run, schema=schema)


def sample_frames(
    df: DataFrame,
    *,
    id_col: str = "id",
    payload_col: str = "payload",
    frame_bytes: int = 64,
    every_nth: int = 2,
) -> DataFrame:
    """Video frame sampling: split the payload into fixed-size frames and
    keep every Nth (real build: pyav/ffmpeg keyframe extraction). Pure
    column expressions — the chunking needs no Python at all."""
    n_frames = F.ceil(F.length(payload_col) / frame_bytes).cast("int")
    idx = F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)))
    sampled = F.filter(idx, lambda i: i % every_nth == 0)
    frames = F.transform(
        sampled,
        lambda i: F.struct(
            i.alias("frame_no"),
            F.substring(F.col(payload_col), i * frame_bytes + 1, frame_bytes).alias("frame"),
        ),
    )
    return df.select(
        F.col(id_col).alias("id"),
        F.explode(frames).alias("f"),
    ).select("id", F.col("f.frame_no").alias("frame_no"), F.col("f.frame").alias("frame"))


def fake_media_table(documents: DataFrame) -> DataFrame:
    """Build a synthetic media table from documents: payload = 8-byte fake
    header (width/height derived from doc_id) + utf-8 text bytes."""
    width = (F.col("doc_id") % 640 + 16).cast("int")
    height = (F.col("doc_id") % 480 + 16).cast("int")
    header = F.concat(
        _le_uint32(width), _le_uint32(height), F.encode(F.col("text"), "UTF-8")
    )
    return documents.select(
        F.col("doc_id").alias("id"),
        header.alias("payload"),
        F.struct(
            F.lit("image/fake").alias("mime"),
            width.alias("width"),
            height.alias("height"),
        ).alias("media_meta"),
    )


def _le_uint32(col):
    """4 little-endian bytes of an int column, as binary (hex -> unhex per
    byte keeps it pure column expressions)."""
    def byte(c):
        return F.unhex(F.lpad(F.hex(c.cast("bigint")), 2, "0"))

    b0 = col % 256
    b1 = F.floor(col / 256).cast("int") % 256
    b2 = F.floor(col / 65536).cast("int") % 256
    b3 = F.floor(col / 16777216).cast("int") % 256
    return F.concat(byte(b0), byte(b1), byte(b2), byte(b3))


def resize_images(
    df: DataFrame,
    *,
    id_col: str = "id",
    payload_col: str = "payload",
    max_width: int = 256,
    max_height: int = 256,
) -> DataFrame:
    """Aspect-preserving downscale to fit (max_width, max_height); images
    already inside the box pass through untouched. Deterministic fake
    kernel: the output payload re-encodes the header with the scaled
    dimensions and keeps the leading floor(body_len * scale²) body bytes
    (pixel count scales with the area) — a real build swaps the body for
    PIL/libvips `resize` and the Spark contract (Arrow batches in,
    binary column out) is unchanged.

    Output: (id, width, height, payload, n_bytes) — the post-resize
    metadata is recomputed from the actual output payload, so a decode of
    the result round-trips.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(b or b"")
                if len(b) >= 8:
                    w, h = struct.unpack("<II", b[:8])
                else:
                    w, h = 0, 0
                scale = min(
                    max_width / w if w else 1.0,
                    max_height / h if h else 1.0,
                    1.0,
                )
                nw, nh = int(w * scale), int(h * scale)
                body = b[8:]
                nbody = body[: int(len(body) * scale * scale)]
                payload = struct.pack("<II", nw, nh) + nbody
                out.append((int(i), nw, nh, payload, len(payload)))
            yield pd.DataFrame(
                out, columns=["id", "width", "height", "payload", "n_bytes"]
            )

    return ensure_parallelism(df.select(id_col, payload_col)).mapInPandas(
        run, schema="id bigint, width int, height int, payload binary, n_bytes bigint"
    )
