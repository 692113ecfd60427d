"""Stage B: from-scratch batched character recognizer over rasterized payloads.

Rebuild of the reference's OCR stage (ocr/engine.py:24-161, which delegates to
the third-party PaddleOCR model): sliding-window glyph segmentation by column
projection, template scoring via one batched matrix multiply, softmax decode
with per-character confidence, and a confidence threshold analog of
min_word_confidence (reference config.yaml:88).

All weights are compile-time constants (the glyph templates) — zero RNG, zero
clock — so recognition is byte-reproducible across runs and parallelism
levels. The batch entry point stacks segments from MANY images into a single
matmul: this is the vectorized Arrow-batch inference path the north star
requires (no per-row Python in the Spark plan; one numpy call per batch).
"""

from __future__ import annotations

import numpy as np

from ocr_spark import config as C
from ocr_spark.extraction.glyphs import GLYPH_H, GLYPH_W, template_matrix

_TEMPLATES, _ALPHABET = template_matrix()
_SOFTMAX_TEMP = 1.0  # scores span [-35, 35]; each pixel of disagreement costs 2

# Renderer geometry (must match ocr_spark.fixtures.corpus.render_payload).
INK = 0          # black ink on
BG = 255         # white background
COL_SPACE = 1    # blank columns between glyphs
SPACE_COLS = 5   # blank columns rendered for a ' ' character


def _segment_columns(img: np.ndarray) -> list[tuple[int, int, bool]]:
    """Split a binarized line image into glyph spans by column projection.

    Returns (start, end, preceded_by_space) spans. Glyphs may carry up to two
    blank edge columns of their own, so inter-glyph gaps reach 4 columns; a
    word space (SPACE_COLS blank columns + spacing) yields gaps of >= 7.
    Gap >= 5 therefore marks a space.
    """
    ink = (img < 128).any(axis=0)
    spans: list[tuple[int, int, bool]] = []
    x = 0
    w = img.shape[1]
    gap = 0
    while x < w:
        if not ink[x]:
            gap += 1
            x += 1
            continue
        start = x
        while x < w and ink[x]:
            x += 1
        spans.append((start, x, gap >= COL_SPACE + 4 and bool(spans)))
        gap = 0
    return spans


def _pad_to_glyph(seg: np.ndarray) -> np.ndarray:
    """Center-pad/crop an ink segment to GLYPH_H x GLYPH_W."""
    h, w = seg.shape
    out = np.zeros((GLYPH_H, GLYPH_W), dtype=np.float32)
    hh, ww = min(h, GLYPH_H), min(w, GLYPH_W)
    out[:hh, :ww] = seg[:hh, :ww]
    return out


def recognize_batch(images: list[np.ndarray | None]) -> list[tuple[str, float, list[float]]]:
    """Recognize a batch of grayscale payload images.

    Segments every image, stacks ALL glyph segments into one matrix, scores
    them against every template in a single matmul, then reassembles per-image
    text. Returns (text, mean_confidence, per_char_confidences) per image.
    """
    seg_vecs: list[np.ndarray] = []
    seg_meta: list[tuple[int, bool]] = []  # (image index, preceded_by_space)

    for idx, img in enumerate(images):
        if img is None or img.size == 0:
            continue
        arr = np.asarray(img)
        if arr.ndim != 2:
            arr = arr.reshape(-1, arr.shape[-1])
        for start, end, spaced in _segment_columns(arr):
            seg = (arr[:, start:end] < 128).astype(np.float32)
            seg_vecs.append(_pad_to_glyph(seg).ravel() * 2.0 - 1.0)
            seg_meta.append((idx, spaced))

    results: list[tuple[str, float, list[float]]] = [("", 0.0, []) for _ in images]
    if not seg_vecs:
        return results

    X = np.stack(seg_vecs)                      # (n_segments, 35)
    scores = X @ _TEMPLATES.T                   # one batched matmul
    scaled = scores / _SOFTMAX_TEMP
    scaled -= scaled.max(axis=1, keepdims=True)
    ex = np.exp(scaled)
    probs = ex / ex.sum(axis=1, keepdims=True)
    best = scores.argmax(axis=1)
    confs = probs[np.arange(len(best)), best]

    texts: dict[int, list[str]] = {}
    charconf: dict[int, list[float]] = {}
    for (idx, spaced), b, cf in zip(seg_meta, best, confs):
        parts = texts.setdefault(idx, [])
        if spaced:
            parts.append(" ")
        if cf >= C.RECOGNIZER_MIN_CONF:
            parts.append(_ALPHABET[b])
            charconf.setdefault(idx, []).append(float(cf))

    for idx in texts:
        cc = charconf.get(idx, [])
        mean_conf = float(np.mean(cc)) if cc else 0.0
        results[idx] = ("".join(texts[idx]).strip(), mean_conf, cc)
    return results


def decode_payload(blob: bytes | None) -> np.ndarray | None:
    """Decode the fixture payload wire format: height (2 bytes BE) + raw u8 pixels."""
    if not blob or len(blob) < 3:
        return None
    h = int.from_bytes(blob[:2], "big")
    body = np.frombuffer(blob[2:], dtype=np.uint8)
    if h <= 0 or body.size % h:
        return None
    return body.reshape(h, body.size // h)
