"""Edge-case tests for the round-3v operator batch: deskew estimation,
OCR confusion mining, and key-value extraction from box layout."""

from __future__ import annotations

import __spark_entry__ as E

SF = "/root/testdata/sf0.001"


def _expected_slope(doc: int) -> int:
    # replicate the fixture's integer-floored line and take its exact
    # least-squares slope (identical for every line of the doc)
    xs = [50 + j * 120 for j in range(5)]
    ys = [100 + (j * 120 * (doc % 7)) // 1000 for j in range(5)]
    n = 5
    num = n * sum(x * y for x, y in zip(xs, ys)) - sum(xs) * sum(ys)
    den = n * sum(x * x for x in xs) - sum(xs) ** 2
    return (1000000 * num) // den


def test_deskew_slope_tracks_planted_tilt(spark):
    rows = {r["doc_id"]: r.asDict() for r in
            E.queries()["deskew_estimate"](spark, SF).collect()}
    for doc, r in rows.items():
        assert r["slope_micro"] == _expected_slope(doc)
        assert r["n_lines"] == 3
    # the tilt family is actually exercised: not all docs are flat
    assert any(r["slope_micro"] > 0 for r in rows.values())


def test_ocr_confusions_planted_pairs_dominate(spark):
    rows = {r["confusion"]: r["cnt"] for r in
            E.queries()["ocr_confusions"](spark, SF).collect()}
    assert set(rows) <= {"a>o", "e>c", "l>1", "o>0"}
    assert all(c > 0 for c in rows.values())


def test_kv_from_boxes_pairs_label_with_right_neighbor(spark):
    rows = E.queries()["kv_from_boxes"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r["field"].startswith("field")
        assert r["value"].startswith("value")
        assert r["field"][-1] == r["value"][-1]  # same slot index
        assert r["gap_px"] == 200


def test_kv_from_boxes_four_pairs_per_doc(spark):
    from collections import Counter

    rows = E.queries()["kv_from_boxes"](spark, SF).collect()
    per_doc = Counter(r["doc_id"] for r in rows)
    assert set(per_doc.values()) == {4}
