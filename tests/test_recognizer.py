"""Stage B unit tests — glyph template sanity, segmentation, batched decode."""

from __future__ import annotations

import numpy as np

from ocr_spark.extraction.glyphs import ALPHABET, crop_to_ink, glyph_array, template_matrix
from ocr_spark.extraction.recognizer import decode_payload, recognize_batch
from ocr_spark.fixtures.corpus import make_page, render_payload


def test_templates_unique():
    T, alphabet = template_matrix()
    assert len(alphabet) == len(set(alphabet))
    flat = {tuple(row) for row in T}
    assert len(flat) == len(alphabet)


def test_no_internal_blank_columns():
    for c in ALPHABET:
        g = crop_to_ink(glyph_array(c))
        cols = g.any(axis=0)
        idx = np.flatnonzero(cols)
        assert cols[idx[0] : idx[-1] + 1].all(), repr(c)


def test_round_trip_strings():
    texts = ["MH-12-AB-1234", "VID 1234 5678 9012 3456", "ABCDE1234F",
             "0123456789", "THE QUICK BROWN FOX 42", "A.B:C-D/E"]
    imgs = [decode_payload(render_payload(t)) for t in texts]
    for t, (out, conf, confs) in zip(texts, recognize_batch(imgs)):
        assert out == t
        assert conf >= 0.60
        assert len(confs) == len(t.replace(" ", ""))


def test_corpus_payload_round_trip():
    done = 0
    for i in range(400):
        p = make_page(i)
        if p["payload_text"] is None:
            continue
        out, conf, _ = recognize_batch([decode_payload(render_payload(p["payload_text"]))])[0]
        assert out == p["payload_text"], f"doc {i}"
        done += 1
    assert done > 30


def test_empty_and_none_payloads():
    results = recognize_batch([None, decode_payload(b""), decode_payload(render_payload("AB"))])
    assert results[0] == ("", 0.0, [])
    assert results[1] == ("", 0.0, [])
    assert results[2][0] == "AB"


def test_batched_equals_single():
    texts = ["PAN REF 123456", "FIT UPTO 01/02/2024", "XYZ"]
    imgs = [decode_payload(render_payload(t)) for t in texts]
    batched = recognize_batch(imgs)
    singles = [recognize_batch([im])[0] for im in imgs]
    assert batched == singles
