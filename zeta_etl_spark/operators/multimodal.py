"""Multimodal column operators: opaque binary payloads (image/audio/video)
with typed metadata, processed through Arrow-batched ``mapInPandas``.

Beyond-reference scale operators (BASELINE.json north star).  The container
has no image/audio codecs, so the decode step is a deterministic fake (md5-
keyed pseudo-decode) behind ``decoder=``; the Spark-side plumbing — schema,
batch shape, partitioning, UDF signatures — is real and tested, and swapping
in Pillow/librosa is a one-line change at the marked seam.

Scale design (100 TB of media):
- payloads stay in ``binary`` columns; metadata is columnar so filters prune
  row groups before any byte of media is read (projection pushdown means a
  metadata-only query never touches the blob column).
- ``mapInPandas`` streams Arrow record batches through Python once per
  partition — no per-row pickling; batch size is bounded by
  ``spark.sql.execution.arrow.maxRecordsPerBatch``.
- feature extraction emits fixed-width arrays so downstream similarity ops
  (operators/vectors.py) apply unchanged.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id bigint, kind string, width int, height int, duration_ms int, "
    "format string, payload binary"
)

FEATURE_DIM = 8


def fake_decode(payload: bytes) -> list[float]:
    """Deterministic stand-in for a real decoder: 8 pseudo-features derived
    from the md5 digest.  REAL-DECODER SEAM: replace with e.g.
    ``PIL.Image.open(io.BytesIO(payload))`` + embedding model."""
    if payload is None:
        return [0.0] * FEATURE_DIM
    digest = hashlib.md5(payload).digest()
    return [b / 255.0 for b in digest[:FEATURE_DIM]]


def extract_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    decoder: Callable[[bytes], list[float]] = fake_decode,
) -> DataFrame:
    """media rows → (id, n_bytes, feature array) via Arrow-batched mapInPandas."""
    out_schema = f"{id_col} bigint, n_bytes bigint, features array<double>"

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bytes": pdf[payload_col].map(
                        lambda p: len(p) if p is not None else 0
                    ),
                    "features": pdf[payload_col].map(decoder),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(_batches, out_schema)


def frame_sample(
    df: DataFrame,
    every_ms: int = 1000,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """Video-style frame sampling: one output row per sampled frame offset.
    Frame decode is stubbed (offset + payload digest); the explode shape and
    per-frame schema are the real contract."""
    out_schema = f"{id_col} bigint, frame_ms bigint, frame_key string"

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                dur = int(r["duration_ms"] or 0)
                digest = hashlib.md5(r[payload_col] or b"").hexdigest()
                for off in range(0, max(dur, 1), every_ms):
                    rows.append(
                        (r[id_col], off, f"{digest[:12]}:{off}")
                    )
            yield pd.DataFrame(rows, columns=[id_col, "frame_ms", "frame_key"])

    return df.select(id_col, "duration_ms", payload_col).mapInPandas(
        _batches, out_schema
    )


def media_metadata_stats(df: DataFrame) -> DataFrame:
    """Pure-columnar metadata rollup — must never deserialize payloads
    (verify with .explain(): the payload column is absent from ReadSchema)."""
    return df.groupBy("kind", "format").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.length("payload").cast("bigint")).alias("total_bytes"),
        F.avg("duration_ms").alias("avg_duration_ms"),
    )
