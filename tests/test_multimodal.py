"""Multimodal plumbing: binary columns + typed metadata through mapInPandas
(decode stubbed — the container has no codecs; the Spark-side schema,
partitioning, UDF signature and batch shapes are the real thing)."""

from __future__ import annotations

from pyspark.sql import functions as F

from blink_reloaded_spark.operators.multimodal import (
    extract_media_features,
    media_fixture,
    sample_frames,
)


def test_metadata_and_features(spark):
    media = media_fixture(spark, 30)
    feats = extract_media_features(media).cache()
    assert feats.count() == 30
    row = feats.where("media_id = 3").collect()[0]
    assert row["kind"] == "image" and row["width"] == 80
    assert len(row["feature"]) == 8
    assert abs(sum(row["feature"]) - 1.0) < 1e-3  # normalized histogram
    # deterministic across runs
    again = extract_media_features(media_fixture(spark, 30))
    assert sorted(map(tuple, feats.drop("feature").collect())) == sorted(
        map(tuple, again.drop("feature").collect())
    )


def test_corrupt_blobs_dropped(spark):
    media = media_fixture(spark, 5).union(
        spark.createDataFrame([(99, bytearray(b"junkjunk"))], "media_id long, blob binary")
    )
    feats = extract_media_features(media)
    ids = {r["media_id"] for r in feats.collect()}
    assert 99 not in ids and len(ids) == 5


def test_frame_sampling(spark):
    media = media_fixture(spark, 12)
    frames = sample_frames(media, every_n=2).cache()
    # videos/audio (8 frames) -> indices 0,2,4,6; images (1 frame) -> idx 0
    per = frames.groupBy("media_id").count().collect()
    counts = {r["media_id"]: r["count"] for r in per}
    for mid, c in counts.items():
        assert c in (1, 4)
    assert frames.where(F.length("frame_bytes") <= 0).count() == 0
