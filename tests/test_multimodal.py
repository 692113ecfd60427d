"""Multimodal operator tests: Spark plumbing (schemas, flat-map shape,
determinism across runs) and the codec-boundary contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ocr_spark.operators import multimodal as MM


@pytest.fixture(scope="module")
def payloads(spark):
    docs = spark.createDataFrame(
        [(i, f"document body {i}") for i in range(24)], ["doc_id", "text"]
    )
    return docs.select(
        "doc_id",
        F.unhex(F.sha2(F.col("text"), 256)).alias("payload"),
        (16 + F.col("doc_id") % 17).cast("int").alias("width"),
        (16 + F.col("doc_id") % 13).cast("int").alias("height"),
        F.lit("fake-rgb").alias("codec"),
    )


def test_image_metadata_schema_and_rows(payloads):
    out = MM.image_metadata(payloads)
    assert [f.name for f in out.schema.fields] == [
        "doc_id", "modality", "width", "height", "channels", "codec"]
    rows = {r["doc_id"]: r for r in out.collect()}
    assert len(rows) == 24
    assert rows[3]["width"] == 19 and rows[3]["height"] == 19
    assert rows[0]["modality"] == "image" and rows[0]["channels"] == 3


def test_image_features_deterministic(payloads):
    a = {r["doc_id"]: r for r in MM.image_features(payloads).collect()}
    b = {r["doc_id"]: r for r in MM.image_features(payloads.repartition(7)).collect()}
    assert a.keys() == b.keys()
    for k in a:
        assert a[k] == b[k]  # partitioning must not change any value
    assert all(len(r["phash"]) == 16 for r in a.values())
    assert len({r["phash"] for r in a.values()}) > 1  # payload-sensitive


def test_image_resize_checksum_stable(payloads):
    out = {r["doc_id"]: r for r in MM.image_resize(payloads, 8, 8).collect()}
    assert all(r["out_width"] == 8 and r["out_height"] == 8 for r in out.values())
    assert all(r["out_bytes"] == 8 * 8 * 3 for r in out.values())
    again = {r["doc_id"]: r["checksum"] for r in MM.image_resize(payloads, 8, 8).collect()}
    assert {k: v["checksum"] for k, v in out.items()} == again


def test_video_frame_sample_flatmap(payloads):
    vids = payloads.withColumns({
        "n_frames": (5 + F.col("doc_id") % 20).cast("int"),
        "codec": F.lit("fake-video"),
    })
    rows = MM.video_frame_sample(vids, every_n=5).collect()
    import math
    expected = sum(math.ceil((5 + i % 20) / 5) for i in range(24))
    assert len(rows) == expected
    assert all(r["frame_index"] % 5 == 0 for r in rows)


def test_audio_features(spark):
    aud = spark.createDataFrame(
        [(i, f"clip {i}") for i in range(10)], ["doc_id", "text"]
    ).select(
        "doc_id",
        F.unhex(F.sha2(F.col("text"), 256)).alias("payload"),
        F.lit(2000).cast("int").alias("n_samples"),
        F.lit("fake-pcm").alias("codec"),
    )
    rows = MM.audio_features(aud).collect()
    assert len(rows) == 10
    assert all(r["n_samples"] == 2000 and r["rms"] > 0 for r in rows)


def test_unknown_codec_raises(payloads):
    bad = payloads.withColumn("codec", F.lit("jpeg"))
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        MM.image_features(bad).collect()


def test_image_features_degenerate_dims(spark):
    """1-pixel-wide/tall and sub-8x8 images are legal: the missing gradient
    axis contributes 0.0 and empty phash blocks contribute 0 bits."""
    docs = spark.createDataFrame(
        [(0, 1, 1), (1, 1, 16), (2, 16, 1), (3, 4, 4)],
        ["doc_id", "width", "height"],
    )
    tiny = docs.select(
        "doc_id",
        F.unhex(F.sha2(F.col("doc_id").cast("string"), 256)).alias("payload"),
        F.col("width").cast("int"),
        F.col("height").cast("int"),
        F.lit("fake-rgb").alias("codec"),
    )
    rows = {r["doc_id"]: r for r in MM.image_features(tiny).collect()}
    assert len(rows) == 4
    assert rows[0]["edge_energy"] == 0.0          # no gradient on either axis
    assert rows[1]["edge_energy"] >= 0.0 and rows[2]["edge_energy"] >= 0.0
    for r in rows.values():
        assert len(r["phash"]) == 16
        assert r["mean_luma"] >= 0.0
