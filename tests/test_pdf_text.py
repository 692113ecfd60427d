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
