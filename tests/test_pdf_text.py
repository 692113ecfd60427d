"""Tests for the PDF text-layer extractor and reading-order
reconstruction (extraction/pdf_text.py)."""

from __future__ import annotations

from ocr_spark.extraction.pdf_text import pdf_text_extract, reading_order

SF = "/root/testdata/sf0.001"


def _extract(spark, pdf):
    df = spark.createDataFrame([(1, pdf)], ["doc_id", "pdf"])
    return pdf_text_extract(df, "doc_id", "pdf").collect()[0]


def test_pdf_tj_literal_and_lines(spark):
    r = _extract(spark, "BT (Hello World) Tj 0 -14 Td (Line two) Tj ET")
    assert r["text"] == "Hello World Line two"
    assert r["n_runs"] == 2 and r["rejected"] == 0


def test_pdf_tj_array_kerning_word_gap(spark):
    # kern <= -180 inserts a space; milder kerns do not
    r = _extract(spark, "BT [(He)(llo)-250(Wor)-50(ld)] TJ ET")
    assert r["text"] == "Hello World"


def test_pdf_escaped_parens_unescape(spark):
    r = _extract(spark, r"BT (a \(b\) c) Tj ET")
    assert r["text"] == "a (b) c"


def test_pdf_hex_string_rejects_to_ocr_path(spark):
    r = _extract(spark, "BT <48656C6C6F> Tj ET")
    assert r["rejected"] == 1 and r["text"] is None


def test_pdf_octal_escape_rejects(spark):
    r = _extract(spark, r"BT (caf\351 x) Tj ET")
    assert r["rejected"] == 1


def test_pdf_hex_inside_tj_array_rejects(spark):
    # round-3 advice: [<hex>] TJ slipped past the Tj-only guard and its
    # hex digits parsed as kern numbers — silently dropped text
    r = _extract(spark, "BT [(He)<6c6c6f>-250(x)] TJ ET")
    assert r["rejected"] == 1 and r["text"] is None


def test_pdf_short_octal_escapes_reject(spark):
    # 1-2 digit octal escapes are legal PDF too (\5, \53)
    for s in (r"BT (a\5b) Tj ET", r"BT (a\53b) Tj ET"):
        r = _extract(spark, s)
        assert r["rejected"] == 1, s


def test_pdf_no_text_ops_is_empty_not_null(spark):
    r = _extract(spark, "%PDF-1.4 nothing here")
    assert r["text"] == "" and r["n_blocks"] == 0


def _order(spark, rows, **kw):
    df = spark.createDataFrame(rows, ["doc_id", "x", "y", "w"])
    return reading_order(df, "doc_id", "x", "y", "w", **kw).collect()[0]


def test_reading_order_two_columns_not_interleaved(spark):
    # two columns: left (x=50,130) and right (x=500,580), two rows each
    rows = [(1, 50, 40, "L1"), (1, 130, 40, "L2"),
            (1, 50, 60, "L3"), (1, 130, 60, "L4"),
            (1, 500, 40, "R1"), (1, 580, 40, "R2"),
            (1, 500, 60, "R3"), (1, 580, 60, "R4")]
    r = _order(spark, rows)
    assert r["n_cols"] == 2
    # full left column before any right-column word
    assert r["ordered_text"] == "L1 L2 L3 L4 R1 R2 R3 R4"


def test_reading_order_single_column_is_y_then_x(spark):
    rows = [(1, 130, 40, "b"), (1, 50, 40, "a"), (1, 50, 60, "c")]
    r = _order(spark, rows)
    assert r["n_cols"] == 1
    assert r["ordered_text"] == "a b c"


def test_reading_order_gap_threshold(spark):
    # a 150-px gap stays single-column at min_gap=200, splits at 100
    rows = [(1, 50, 40, "a"), (1, 200, 40, "b"), (1, 50, 60, "c")]
    assert _order(spark, rows, min_gap=200)["n_cols"] == 1
    assert _order(spark, rows, min_gap=100)["n_cols"] == 2


from ocr_spark.extraction.pdf_text import (  # noqa: E402
    ocr_vote,
    table_from_boxes,
)


def test_table_two_words_per_cell_merge(spark):
    # two words inside one x-band (x jitter < gap) must share a cell
    rows = [(1, 60, 40, "aa"), (1, 90, 40, "bb"), (1, 300, 40, "cc")]
    df = spark.createDataFrame(rows, ["doc_id", "x", "y", "w"])
    r = table_from_boxes(df, "doc_id", "x", "y", "w").collect()[0]
    assert r["n_rows"] == 1 and r["n_cols"] == 2
    assert r["grid"] == "aa bb|cc"


def test_table_grid_row_major(spark):
    rows = [(1, 50, 40, "r0c0"), (1, 300, 40, "r0c1"),
            (1, 50, 100, "r1c0"), (1, 300, 100, "r1c1")]
    df = spark.createDataFrame(rows, ["doc_id", "x", "y", "w"])
    r = table_from_boxes(df, "doc_id", "x", "y", "w").collect()[0]
    assert r["grid"] == "r0c0|r0c1||r1c0|r1c1"


def test_ocr_vote_tie_goes_to_engine_a(spark):
    df = spark.createDataFrame(
        [(1, ["x"], [50], ["y"], [50])],
        ["doc_id", "wa", "ca", "wb", "cb"])
    r = ocr_vote(df, "doc_id", "wa", "ca", "wb", "cb").collect()[0]
    assert r["merged"] == "x" and r["n_from_b"] == 0


def test_ocr_vote_higher_confidence_wins(spark):
    df = spark.createDataFrame(
        [(1, ["thc", "cat"], [40, 90], ["the", "cot"], [80, 10])],
        ["doc_id", "wa", "ca", "wb", "cb"])
    r = ocr_vote(df, "doc_id", "wa", "ca", "wb", "cb").collect()[0]
    assert r["merged"] == "the cat" and r["n_from_b"] == 1
