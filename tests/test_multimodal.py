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


def test_real_codec_dispatch():
    """Codec boundary dispatch: wav decodes for real via stdlib wave;
    Pillow/soundfile codecs either decode (lib present) or raise a
    NotImplementedError naming the missing library — never fall through
    to the fake."""
    import io
    import wave as wave_mod

    import numpy as np

    # real 16-bit mono WAV, 100 samples of a known ramp
    samples = np.arange(-50, 50, dtype="<i2")
    buf = io.BytesIO()
    with wave_mod.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(samples.tobytes())
    pcm = MM._decode_pcm(buf.getvalue(), 7, "wav")   # hint ignored for real
    assert pcm.tolist() == list(range(-50, 50))

    # stereo: channel 0 wins
    buf2 = io.BytesIO()
    inter = np.empty(20, dtype="<i2")
    inter[0::2] = np.arange(10)          # L
    inter[1::2] = 999                    # R
    with wave_mod.open(buf2, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(inter.tobytes())
    assert MM._decode_pcm(buf2.getvalue(), 0, "wav").tolist() == list(range(10))

    # optional-library codecs: decode or a clear error, never the fake
    try:
        from PIL import Image  # noqa: F401
        have_pil = True
    except ImportError:
        have_pil = False
    if not have_pil:
        with pytest.raises(NotImplementedError, match="Pillow"):
            MM._decode_rgb(b"\x89PNG fake bytes", 4, 4, "png")
    else:
        import io as _io

        from PIL import Image
        img = Image.new("RGB", (3, 2), (10, 20, 30))
        out = _io.BytesIO()
        img.save(out, format="PNG")
        arr = MM._decode_rgb(out.getvalue(), 0, 0, "png")
        assert arr.shape == (2, 3, 3) and arr[0, 0].tolist() == [10, 20, 30]

    try:
        import soundfile  # noqa: F401
        have_sf = True
    except ImportError:
        have_sf = False
    if not have_sf:
        with pytest.raises(NotImplementedError, match="soundfile"):
            MM._decode_pcm(b"fLaC fake", 0, "flac")

    # unknown codecs still fail loudly
    with pytest.raises(NotImplementedError, match="codec"):
        MM._decode_rgb(b"x", 4, 4, "tiff")
