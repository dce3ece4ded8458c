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

    Two-stage shape: the offset grid is exploded JVM-side
    (``sequence(0, duration-1, every_ms)``, whole-stage codegen — the row
    multiplication never touches Python), then the per-frame decode runs
    through one vectorized ``mapInPandas`` stage.  The decode here is a
    stub (payload digest + offset); REAL-DECODER SEAM: replace the
    ``_digest`` map with per-offset frame extraction (e.g. pyav seek).
    No ``iterrows`` — columnar pandas ops only."""
    out_schema = f"{id_col} bigint, frame_ms bigint, frame_key string"

    frames = df.select(
        id_col,
        payload_col,
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(
                    F.coalesce(F.col("duration_ms"), F.lit(0)) - 1, F.lit(0)
                ),
                F.lit(every_ms),
            )
        ).alias("frame_ms"),
    )

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            digests = pdf[payload_col].map(
                lambda p: hashlib.md5(p if p is not None else b"").hexdigest()[:12]
            )
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "frame_ms": pdf["frame_ms"].astype("int64"),
                    "frame_key": digests + ":" + pdf["frame_ms"].astype(str),
                }
            )

    return frames.mapInPandas(_batches, out_schema)


def stamp_ingest_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Ingest-time metadata stamping: the payload byte count becomes a
    columnar field so every downstream metadata query prunes the blob column
    entirely.  Run this ONCE where media enters the lake; after that,
    ``length(payload)`` never appears in an analytical plan."""
    return df.withColumn(
        "n_bytes", F.coalesce(F.length(payload_col).cast("bigint"), F.lit(0))
    )


def media_metadata_stats(df: DataFrame) -> DataFrame:
    """Pure-columnar metadata rollup over ingest-stamped metadata.  The
    payload column is never referenced — at 100 TB of media the scan reads
    kilobytes of metadata, not the blobs (asserted by
    tests/test_multimodal.py::test_metadata_stats_prune_payload via
    ReadSchema)."""
    if "n_bytes" not in df.columns:
        raise ValueError(
            "media_metadata_stats requires the ingest-stamped 'n_bytes' "
            "column (see stamp_ingest_metadata); aggregating "
            "length(payload) here would read every blob byte"
        )
    return df.groupBy("kind", "format").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("n_bytes").alias("total_bytes"),
        F.avg("duration_ms").alias("avg_duration_ms"),
    )
