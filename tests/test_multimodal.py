"""Multimodal plumbing tests: binary payload schema, Arrow-batched decode
stub, frame sampling explode shape, metadata-only pruning."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from zeta_etl_spark.operators.multimodal import (
    FEATURE_DIM,
    extract_features,
    fake_decode,
    frame_sample,
    media_metadata_stats,
    stamp_ingest_metadata,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        Row(media_id=1, kind="image", width=64, height=64, duration_ms=0,
            format="png", payload=b"\x89PNG fake bytes 1"),
        Row(media_id=2, kind="image", width=32, height=32, duration_ms=0,
            format="png", payload=b"\x89PNG fake bytes 2"),
        Row(media_id=3, kind="video", width=640, height=480, duration_ms=3500,
            format="mp4", payload=b"\x00\x00ftyp fake video"),
        Row(media_id=4, kind="audio", width=0, height=0, duration_ms=2000,
            format="wav", payload=None),
    ]
    return spark.createDataFrame(rows)


def test_feature_extraction_shape_and_determinism(spark, media):
    out = extract_features(media).collect()
    assert len(out) == 4
    by_id = {r["media_id"]: r for r in out}
    assert all(len(r["features"]) == FEATURE_DIM for r in out)
    # deterministic: same payload → same features, twice
    again = {r["media_id"]: r for r in extract_features(media).collect()}
    assert by_id[1]["features"] == again[1]["features"]
    assert by_id[1]["features"] == fake_decode(b"\x89PNG fake bytes 1")
    # null payload handled
    assert by_id[4]["n_bytes"] == 0


def test_frame_sampling(spark, media):
    frames = frame_sample(media, every_ms=1000).collect()
    per_id = {}
    for r in frames:
        per_id.setdefault(r["media_id"], []).append(r["frame_ms"])
    # 3500ms video at 1000ms cadence → frames at 0,1000,2000,3000
    assert sorted(per_id[3]) == [0, 1000, 2000, 3000]
    # zero-duration image → single frame at 0
    assert per_id[1] == [0]


def test_metadata_stats_prune_payload(spark, media, tmp_path):
    path = str(tmp_path / "media")
    stamp_ingest_metadata(media).write.parquet(path)
    df = spark.read.parquet(path)
    stats = media_metadata_stats(df)
    rows = {(r["kind"], r["format"]): r for r in stats.collect()}
    assert rows[("image", "png")]["n_items"] == 2
    # stamped byte counts match the real payload lengths
    assert rows[("image", "png")]["total_bytes"] == 2 * len(b"\x89PNG fake bytes 1")
    assert rows[("audio", "wav")]["total_bytes"] == 0  # null payload → 0
    # THE pruning claim: the blob column never reaches the parquet scan
    plan = stats._jdf.queryExecution().executedPlan().toString()
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "payload" not in read_schema
    assert "n_bytes" in read_schema


def test_metadata_stats_requires_stamped_column(spark, media):
    with pytest.raises(ValueError, match="n_bytes"):
        media_metadata_stats(media)


def test_frame_sample_plan_explodes_jvm_side(spark, media):
    # the offset-grid multiplication must be a JVM Generate(explode(sequence)),
    # not Python row loops: Generate appears BELOW the Arrow eval in the plan
    frames = frame_sample(media, every_ms=1000)
    plan = frames._jdf.queryExecution().executedPlan().toString()
    assert "Generate explode(sequence" in plan
