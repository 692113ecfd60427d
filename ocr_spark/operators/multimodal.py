"""Multimodal column operators: image / audio / video payloads as opaque
``binary`` columns with typed metadata, processed in Arrow-batched
``mapInPandas`` stages.

The Spark-side plumbing — schemas, batch iteration, partitioning, zero
per-row Python — is real and tested. The codec boundary is isolated in
``_decode_rgb`` / ``_decode_pcm``: real deployments drop in Pillow /
libsndfile / pyav there; this container has none of them, so the decoders
implement a deterministic byte-derived fake (documented below) and raise
``NotImplementedError`` for codecs the fake cannot model. Everything above
the codec boundary (resize math, feature extraction, frame sampling,
batching) is the production code path.

Cross-engine verifiability: the fake seed is ``sha256(payload.hex())`` —
hashing the lowercase-hex TEXT of the bytes rather than the raw bytes — so
engines whose sha256 is string-only (DuckDB) can reproduce every value, and
all float outputs are derived from exact integer sums with a fixed final
expression (identical IEEE 754 double result in any engine). Luma is carried
as integer milliluma ``L = 299*R + 587*G + 114*B`` (i.e. 1000x the 0.299 /
0.587 / 0.114 Rec.601 weights).

Scale notes (100 TB):
- payload bytes never leave the Arrow stage that consumes them — each
  operator projects them away in its output schema (column-pruning
  discipline, SURVEY.md §4.2);
- operators are per-row maps: no shuffle; upstream hash(url) salting
  spreads hot hosts; ``spark.sql.execution.arrow.maxRecordsPerBatch``
  bounds batch memory for fat payloads.
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

IMAGE_META_SCHEMA = (
    "doc_id long, modality string, width int, height int, channels int, codec string"
)
IMAGE_FEATURES_SCHEMA = (
    "doc_id long, width int, height int, mean_luma double, std_luma double, "
    "edge_energy double, phash string"
)
RESIZE_SCHEMA = "doc_id long, out_width int, out_height int, out_bytes int, checksum string"
FRAME_SAMPLE_SCHEMA = "doc_id long, frame_index int, frame_phash string"
AUDIO_FEATURES_SCHEMA = (
    "doc_id long, n_samples int, rms double, zero_crossings int, clip_ratio double"
)

_SUPPORTED_CODECS = {"fake-rgb", "fake-pcm", "fake-video"}
_REAL_IMAGE_CODECS = {"png", "jpeg", "jpg", "bmp", "gif", "webp"}
_REAL_AUDIO_CODECS = {"flac", "ogg", "mp3"}


def _require_codec(codec: str) -> None:
    if codec not in _SUPPORTED_CODECS:
        raise NotImplementedError(
            f"codec {codec!r}: real decoders (Pillow/libsndfile/pyav) are not "
            f"available in this environment; supported here: {sorted(_SUPPORTED_CODECS)}"
        )


def _seed(data: bytes) -> bytes:
    """Hex-armored seed: sha256 over the lowercase-hex text of the bytes.
    String-only-sha256 engines (DuckDB) reproduce this as
    ``sha256(to_hex-chain)``, which the value-level oracles rely on."""
    return hashlib.sha256(data.hex().encode("ascii")).digest()


def _decode_rgb(payload: bytes, width: int, height: int, codec: str = "fake-rgb") -> np.ndarray:
    """Codec boundary. Real image codecs dispatch to Pillow when it is
    importable (production containers; the decoded size wins over the
    width/height hints) and raise NotImplementedError naming the missing
    library otherwise. The deterministic fake — seed bytes tiled into an
    HxWx3 uint8 array, sha256-derived so any byte change perturbs every
    pixel — remains the oracle-checkable path."""
    if codec in _REAL_IMAGE_CODECS:
        try:
            from PIL import Image  # noqa: PLC0415 — worker-side optional dep
        except ImportError as e:
            raise NotImplementedError(
                f"codec {codec!r} needs Pillow, which is not installed: {e}"
            ) from e
        import io

        img = Image.open(io.BytesIO(payload)).convert("RGB")
        return np.asarray(img, dtype=np.uint8).copy()
    _require_codec(codec)
    need = width * height * 3
    seed = _seed(payload)
    reps = need // len(seed) + 1
    buf = (seed * reps)[:need]
    return np.frombuffer(buf, dtype=np.uint8).reshape(height, width, 3).copy()


def _decode_pcm(payload: bytes, n_samples: int, codec: str = "fake-pcm") -> np.ndarray:
    """Codec boundary for audio. ``wav`` decodes for real via the stdlib
    ``wave`` module (16-bit PCM, channel 0 of multi-channel); compressed
    codecs dispatch to soundfile when importable and raise
    NotImplementedError naming the missing library otherwise. The
    deterministic fake — little-endian int16 PCM derived from the seed
    bytes — remains the oracle-checkable path. Real decodes return the
    container's actual sample count; the ``n_samples`` hint only sizes the
    fake."""
    if codec == "wav":
        import io
        import wave

        with wave.open(io.BytesIO(payload), "rb") as w:
            if w.getsampwidth() != 2:
                raise NotImplementedError(
                    f"wav: only 16-bit PCM supported, got {8 * w.getsampwidth()}-bit"
                )
            nch = w.getnchannels()
            frames = w.readframes(w.getnframes())
        arr = np.frombuffer(frames, dtype="<i2").astype(np.int64)
        return arr[::nch] if nch > 1 else arr
    if codec in _REAL_AUDIO_CODECS:
        try:
            import soundfile  # noqa: PLC0415 — worker-side optional dep
        except ImportError as e:
            raise NotImplementedError(
                f"codec {codec!r} needs soundfile, which is not installed: {e}"
            ) from e
        import io

        data, _sr = soundfile.read(io.BytesIO(payload), dtype="int16", always_2d=True)
        return data[:, 0].astype(np.int64)
    _require_codec(codec)
    seed = _seed(payload)
    reps = (n_samples * 2) // len(seed) + 1
    buf = (seed * reps)[: n_samples * 2]
    return np.frombuffer(buf, dtype="<i2").astype(np.int64)


def _milliluma(img: np.ndarray) -> np.ndarray:
    """Integer milliluma: 1000x Rec.601 luma, exact in int64."""
    i = img.astype(np.int64)
    return 299 * i[..., 0] + 587 * i[..., 1] + 114 * i[..., 2]


def _phash8(lum: np.ndarray) -> str:
    """8x8 average-hash over block sums of integer milliluma: bit(i,j) is
    ``block_mean > global_mean``, evaluated as the exact integer comparison
    ``block_sum * n_pixels > total_sum * block_size`` (no float rounding, so
    any engine reproduces the hash bit-for-bit). Dims smaller than 8 are
    legal: the grid then contains empty blocks, whose comparison
    ``0 * n > total * 0`` is False, i.e. they contribute 0 bits."""
    h, w = lum.shape
    n = h * w
    total = int(lum.sum())
    ys = (np.arange(9) * h) // 8
    xs = (np.arange(9) * w) // 8
    val = 0
    for i in range(8):
        for j in range(8):
            block = lum[ys[i]:ys[i + 1], xs[j]:xs[j + 1]]
            bit = int(block.sum()) * n > total * block.size
            val = (val << 1) | int(bit)
    return f"{val:016x}"


def image_metadata(df: DataFrame) -> DataFrame:
    """(doc_id, payload binary, width, height, codec) -> typed metadata row.
    Payload bytes are dropped from the output schema."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            yield pd.DataFrame({
                "doc_id": b["doc_id"],
                "modality": "image",
                "width": b["width"].astype("int32"),
                "height": b["height"].astype("int32"),
                "channels": np.int32(3),
                "codec": b["codec"],
            })

    return df.select("doc_id", "payload", "width", "height", "codec").mapInPandas(
        gen, IMAGE_META_SCHEMA
    )


def image_features(df: DataFrame) -> DataFrame:
    """Decode -> luma stats + gradient edge energy + 8x8 perceptual hash.

    All three doubles are a fixed final expression over exact int64 sums
    (``SL``, ``SL2``, edge-diff sums), mirrored verbatim by the DuckDB
    oracle, so the values are bit-identical cross-engine."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for doc_id, payload, w, h, codec in zip(
                b["doc_id"], b["payload"], b["width"], b["height"], b["codec"]
            ):
                w, h = int(w), int(h)
                lum = _milliluma(_decode_rgb(bytes(payload), w, h, codec))
                n = w * h
                sl = int(lum.sum())
                sl2 = int((lum * lum).sum())
                sdx = int(np.abs(np.diff(lum, axis=1)).sum()) if w > 1 else 0
                sdy = int(np.abs(np.diff(lum, axis=0)).sum()) if h > 1 else 0
                m = sl / n / 1000.0
                var = sl2 / n / 1000000.0 - m * m
                # 1-pixel-wide/tall images have no gradient along that
                # axis: contribute 0.0 for it instead of dividing by zero.
                edge = (sdx / (h * (w - 1)) / 1000.0 if w > 1 else 0.0) \
                    + (sdy / ((h - 1) * w) / 1000.0 if h > 1 else 0.0)
                rows.append((
                    int(doc_id), w, h,
                    m,
                    math.sqrt(max(var, 0.0)),
                    edge,
                    _phash8(lum),
                ))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "width", "height", "mean_luma", "std_luma",
                "edge_energy", "phash",
            ])

    return df.select("doc_id", "payload", "width", "height", "codec").mapInPandas(
        gen, IMAGE_FEATURES_SCHEMA
    )


def image_resize(df: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize (pure numpy index math — the real path for a
    production resize kernel); emits size + checksum, not the bitmap. The
    checksum is hex-armored (sha256 of the hex text of the resized bytes)
    for the same cross-engine reason as the seed."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for doc_id, payload, w, h, codec in zip(
                b["doc_id"], b["payload"], b["width"], b["height"], b["codec"]
            ):
                img = _decode_rgb(bytes(payload), int(w), int(h), codec)
                yi = (np.arange(out_h) * img.shape[0]) // out_h
                xi = (np.arange(out_w) * img.shape[1]) // out_w
                out = img[yi][:, xi]
                digest = hashlib.sha256(out.tobytes().hex().encode("ascii"))
                rows.append((int(doc_id), out_w, out_h, out.nbytes,
                             digest.hexdigest()[:16]))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "out_width", "out_height", "out_bytes", "checksum",
            ])

    return df.select("doc_id", "payload", "width", "height", "codec").mapInPandas(
        gen, RESIZE_SCHEMA
    )


def video_frame_sample(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Sample every Nth frame of a (fake-)video payload; one output row per
    sampled frame (a flat-map: mapInPandas output is not 1:1 with input).
    Frame fi decodes from ``payload || fi_le32`` so each frame differs."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for doc_id, payload, w, h, n_frames, codec in zip(
                b["doc_id"], b["payload"], b["width"], b["height"],
                b["n_frames"], b["codec"],
            ):
                _require_codec(codec)
                for fi in range(0, int(n_frames), every_n):
                    frame = _decode_rgb(bytes(payload) + fi.to_bytes(4, "little"),
                                        int(w), int(h), "fake-rgb")
                    rows.append((int(doc_id), fi, _phash8(_milliluma(frame))))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_index", "frame_phash"])

    return df.select("doc_id", "payload", "width", "height", "n_frames", "codec").mapInPandas(
        gen, FRAME_SAMPLE_SCHEMA
    )


def audio_features(df: DataFrame) -> DataFrame:
    """PCM decode -> RMS, zero-crossing count, clipping ratio. RMS and clip
    ratio are fixed final expressions over exact integer sums (see
    image_features) so the oracle reproduces them bit-for-bit."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for doc_id, payload, n_samples, codec in zip(
                b["doc_id"], b["payload"], b["n_samples"], b["codec"]
            ):
                pcm = _decode_pcm(bytes(payload), int(n_samples), codec)
                # fakes return exactly n_samples; real containers win
                n = len(pcm)
                sv2 = int((pcm * pcm).sum())
                zc = int(np.sum((pcm[1:] < 0) != (pcm[:-1] < 0)))
                n_clip = int(np.sum(np.abs(pcm) >= 32767))
                rows.append((int(doc_id), n, math.sqrt(sv2 / n), zc, n_clip / n))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "n_samples", "rms", "zero_crossings", "clip_ratio",
            ])

    return df.select("doc_id", "payload", "n_samples", "codec").mapInPandas(
        gen, AUDIO_FEATURES_SCHEMA
    )
