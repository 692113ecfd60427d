"""Tests for recrawl line-diff churn and the invisible-character audit."""

from __future__ import annotations

import os

from ocr_spark.queries import QUERIES


def _write_docs(spark, d, rows):
    spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    ).write.parquet(os.path.join(d, "documents.parquet"))


class TestRecrawlLineDiff:
    def test_three_churn_classes(self, spark, tmp_path):
        # doc_ids < 97 each define one url; classes by doc_id % 3
        _write_docs(spark, str(tmp_path),
                    [(i, "t", "en", "s", 1) for i in (0, 1, 2)])
        out = {r["url"]: r.asDict()
               for r in QUERIES["recrawl_line_diff"](
                   spark, str(tmp_path)).collect()}
        # %3==0: identical -> no churn
        assert out[0]["n_added"] == 0 and out[0]["n_removed"] == 0
        assert out[0]["churn_bp"] == 0
        # %3==1: one line replaced -> 1 added + 1 removed over 4 = 5000bp
        assert out[1]["n_added"] == 1 and out[1]["n_removed"] == 1
        assert out[1]["churn_bp"] == 5000
        # %3==2: gamma removed, delta+extra added -> 2 added 1 removed
        assert out[2]["n_added"] == 2 and out[2]["n_removed"] == 1
        assert out[2]["churn_bp"] == 7500


class TestInvisibleCharsAudit:
    def test_planted_classes_and_clean_docs(self, spark, tmp_path):
        _write_docs(spark, str(tmp_path),
                    [(0, "clean text", "en", "s", 1),     # %5==0 -> bidi pair
                     (1, "clean text", "en", "s", 1),     # %5==1 -> zw + BOM
                     (2, "clean text", "en", "s", 1)])    # clean
        out = {r["doc_id"]: r.asDict()
               for r in QUERIES["invisible_chars_audit"](
                   spark, str(tmp_path)).collect()}
        assert out[0]["n_bidi"] == 2 and out[0]["n_zero_width"] == 0
        assert out[0]["flagged"] == 1
        assert out[1]["n_bidi"] == 0 and out[1]["n_zero_width"] == 2
        assert out[1]["flagged"] == 1
        assert out[2]["flagged"] == 0
        # sanitized length drops exactly the invisible chars
        assert out[0]["clean_len"] == len("clean text") + len(" live")
