"""Deterministic 5x7 monospaced glyph bitmaps.

Shared alphabet for the fixture renderer (ocr_spark.fixtures.corpus) and the
stage-B recognizer (ocr_spark.extraction.recognizer). Bitmaps are constants —
no fonts, no RNG — so rendering and recognition are bit-reproducible.
"""

from __future__ import annotations

import numpy as np

GLYPH_H = 7
GLYPH_W = 5

# fmt: off
_RAW = {
    "A": ["  #  ", " # # ", "#   #", "#   #", "#####", "#   #", "#   #"],
    "B": ["#### ", "#   #", "#   #", "#### ", "#   #", "#   #", "#### "],
    "C": [" ####", "#    ", "#    ", "#    ", "#    ", "#    ", " ####"],
    "D": ["#### ", "#   #", "#   #", "#   #", "#   #", "#   #", "#### "],
    "E": ["#####", "#    ", "#    ", "#### ", "#    ", "#    ", "#####"],
    "F": ["#####", "#    ", "#    ", "#### ", "#    ", "#    ", "#    "],
    "G": [" ####", "#    ", "#    ", "# ###", "#   #", "#   #", " ####"],
    "H": ["#   #", "#   #", "#   #", "#####", "#   #", "#   #", "#   #"],
    "I": ["#####", "  #  ", "  #  ", "  #  ", "  #  ", "  #  ", "#####"],
    "J": ["    #", "    #", "    #", "    #", "    #", "#   #", " ### "],
    "K": ["#   #", "#  # ", "# #  ", "##   ", "# #  ", "#  # ", "#   #"],
    "L": ["#    ", "#    ", "#    ", "#    ", "#    ", "#    ", "#####"],
    "M": ["#   #", "## ##", "# # #", "# # #", "#   #", "#   #", "#   #"],
    "N": ["#   #", "##  #", "##  #", "# # #", "#  ##", "#  ##", "#   #"],
    "O": [" ### ", "#   #", "#   #", "#   #", "#   #", "#   #", " ### "],
    "P": ["#### ", "#   #", "#   #", "#### ", "#    ", "#    ", "#    "],
    "Q": [" ### ", "#   #", "#   #", "#   #", "# # #", "#  # ", " ## #"],
    "R": ["#### ", "#   #", "#   #", "#### ", "# #  ", "#  # ", "#   #"],
    "S": [" ####", "#    ", "#    ", " ### ", "    #", "    #", "#### "],
    "T": ["#####", "  #  ", "  #  ", "  #  ", "  #  ", "  #  ", "  #  "],
    "U": ["#   #", "#   #", "#   #", "#   #", "#   #", "#   #", " ### "],
    "V": ["#   #", "#   #", "#   #", "#   #", " # # ", " # # ", "  #  "],
    "W": ["#   #", "#   #", "#   #", "# # #", "# # #", "## ##", "#   #"],
    "X": ["#   #", " # # ", " # # ", "  #  ", " # # ", " # # ", "#   #"],
    "Y": ["#   #", " # # ", " # # ", "  #  ", "  #  ", "  #  ", "  #  "],
    "Z": ["#####", "    #", "   # ", "  #  ", " #   ", "#    ", "#####"],
    "0": [" ### ", "#   #", "#  ##", "# # #", "##  #", "#   #", " ### "],
    "1": ["  #  ", " ##  ", "  #  ", "  #  ", "  #  ", "  #  ", " ### "],
    "2": [" ### ", "#   #", "    #", "   # ", "  #  ", " #   ", "#####"],
    "3": [" ### ", "#   #", "    #", "  ## ", "    #", "#   #", " ### "],
    "4": ["   # ", "  ## ", " # # ", "#  # ", "#####", "   # ", "   # "],
    "5": ["#####", "#    ", "#### ", "    #", "    #", "#   #", " ### "],
    "6": [" ### ", "#    ", "#    ", "#### ", "#   #", "#   #", " ### "],
    "7": ["#####", "    #", "   # ", "  #  ", "  #  ", "  #  ", "  #  "],
    "8": [" ### ", "#   #", "#   #", " ### ", "#   #", "#   #", " ### "],
    "9": [" ### ", "#   #", "#   #", " ####", "    #", "    #", " ### "],
    "/": ["    #", "    #", "   # ", "  #  ", " #   ", "#    ", "#    "],
    "-": ["     ", "     ", "     ", "#####", "     ", "     ", "     "],
    ".": ["     ", "     ", "     ", "     ", "     ", " ##  ", " ##  "],
    ":": ["     ", " ##  ", " ##  ", "     ", " ##  ", " ##  ", "     "],
}
# fmt: on

ALPHABET = "".join(sorted(_RAW))


def glyph_array(ch: str) -> np.ndarray:
    """Return the GLYPH_H x GLYPH_W {0,1} ink mask for one character."""
    rows = _RAW[ch]
    return np.array([[1 if c == "#" else 0 for c in row] for row in rows], dtype=np.uint8)


def crop_to_ink(g: np.ndarray) -> np.ndarray:
    """Left-align a glyph by dropping blank leading/trailing columns, padded
    back to GLYPH_W. Column-projection segmentation crops segments to their
    ink extent, so templates must be aligned the same way."""
    cols = g.any(axis=0)
    if not cols.any():
        return g
    idx = np.flatnonzero(cols)
    cropped = g[:, idx[0] : idx[-1] + 1]
    out = np.zeros((GLYPH_H, GLYPH_W), dtype=g.dtype)
    out[:, : cropped.shape[1]] = cropped
    return out


def template_matrix() -> tuple[np.ndarray, str]:
    """All glyph templates as a (n_glyphs, GLYPH_H*GLYPH_W) {-1,+1} matrix.

    Templates are ink-cropped and left-aligned (matching segment extraction).
    +1 where ink, -1 where background: the dot product with a {-1,+1}-encoded
    segment equals (pixels agreeing) - (pixels disagreeing), maximized by the
    true glyph.
    """
    mats = np.stack([crop_to_ink(glyph_array(c)).astype(np.int8) for c in ALPHABET])
    flat = mats.reshape(len(ALPHABET), -1).astype(np.float32)
    return flat * 2.0 - 1.0, ALPHABET
