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


def _require_codec(codec: str) -> None:
    if codec not in _SUPPORTED_CODECS:
        raise NotImplementedError(
            f"codec {codec!r}: real decoders (Pillow/libsndfile/pyav) are not "
            f"available in this environment; supported here: {sorted(_SUPPORTED_CODECS)}"
        )


def _decode_rgb(payload: bytes, width: int, height: int, codec: str = "fake-rgb") -> np.ndarray:
    """Codec boundary. Deterministic fake: the payload bytes are tiled into
    an HxWx3 uint8 array (sha256-extended so any byte change perturbs every
    pixel). Swap with a real decoder in production."""
    _require_codec(codec)
    need = width * height * 3
    seed = hashlib.sha256(payload).digest()
    reps = need // len(seed) + 1
    buf = (seed * reps)[:need]
    return np.frombuffer(buf, dtype=np.uint8).reshape(height, width, 3).copy()


def _decode_pcm(payload: bytes, n_samples: int, codec: str = "fake-pcm") -> np.ndarray:
    """Codec boundary for audio: deterministic int16 PCM derived from the
    payload bytes."""
    _require_codec(codec)
    seed = hashlib.sha256(payload).digest()
    reps = (n_samples * 2) // len(seed) + 1
    buf = (seed * reps)[: n_samples * 2]
    return np.frombuffer(buf, dtype="<i2").astype(np.int64)


def _luma(img: np.ndarray) -> np.ndarray:
    return 0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]


def _phash8(gray: np.ndarray) -> str:
    """8x8 average-hash over a block-mean downsample — deterministic,
    library-free perceptual fingerprint."""
    h, w = gray.shape
    ys = (np.arange(9) * h) // 8
    xs = (np.arange(9) * w) // 8
    cells = np.empty((8, 8))
    for i in range(8):
        for j in range(8):
            block = gray[ys[i]:max(ys[i + 1], ys[i] + 1), xs[j]:max(xs[j + 1], xs[j] + 1)]
            cells[i, j] = block.mean()
    bits = (cells > cells.mean()).flatten()
    val = 0
    for b in bits:
        val = (val << 1) | int(b)
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
    """Decode -> luma stats + gradient edge energy + 8x8 perceptual hash."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for doc_id, payload, w, h, codec in zip(
                b["doc_id"], b["payload"], b["width"], b["height"], b["codec"]
            ):
                img = _decode_rgb(bytes(payload), int(w), int(h), codec)
                g = _luma(img)
                gx = np.abs(np.diff(g, axis=1)).mean() if g.shape[1] > 1 else 0.0
                gy = np.abs(np.diff(g, axis=0)).mean() if g.shape[0] > 1 else 0.0
                rows.append((int(doc_id), int(w), int(h), float(g.mean()),
                             float(g.std()), float(gx + gy), _phash8(g)))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "width", "height", "mean_luma", "std_luma",
                "edge_energy", "phash",
            ])

    return df.select("doc_id", "payload", "width", "height", "codec").mapInPandas(
        gen, IMAGE_FEATURES_SCHEMA
    )


def image_resize(df: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize (pure numpy index math — the real path for a
    production resize kernel); emits size + checksum, not the bitmap."""
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
                rows.append((int(doc_id), out_w, out_h, out.nbytes,
                             hashlib.sha256(out.tobytes()).hexdigest()[:16]))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "out_width", "out_height", "out_bytes", "checksum",
            ])

    return df.select("doc_id", "payload", "width", "height", "codec").mapInPandas(
        gen, RESIZE_SCHEMA
    )


def video_frame_sample(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Sample every Nth frame of a (fake-)video payload; one output row per
    sampled frame (a flat-map: mapInPandas output is not 1:1 with input)."""
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
                    rows.append((int(doc_id), fi, _phash8(_luma(frame))))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_index", "frame_phash"])

    return df.select("doc_id", "payload", "width", "height", "n_frames", "codec").mapInPandas(
        gen, FRAME_SAMPLE_SCHEMA
    )


def audio_features(df: DataFrame) -> DataFrame:
    """PCM decode -> RMS, zero-crossing count, clipping ratio."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for doc_id, payload, n_samples, codec in zip(
                b["doc_id"], b["payload"], b["n_samples"], b["codec"]
            ):
                pcm = _decode_pcm(bytes(payload), int(n_samples), codec)
                rms = float(np.sqrt(np.mean(pcm.astype(np.float64) ** 2)))
                zc = int(np.sum(np.signbit(pcm[1:]) != np.signbit(pcm[:-1])))
                clip = float(np.mean(np.abs(pcm) >= 32767))
                rows.append((int(doc_id), int(n_samples), rms, zc, clip))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "n_samples", "rms", "zero_crossings", "clip_ratio",
            ])

    return df.select("doc_id", "payload", "n_samples", "codec").mapInPandas(
        gen, AUDIO_FEATURES_SCHEMA
    )
