"""Edge-case tests for the round-4 operator batch: keep-first paragraph
dedup, SoftDeDup reweighting, and PDF Info-dict metadata."""

from __future__ import annotations

import pytest

from ocr_spark.extraction.pdf_text import pdf_info_metadata
from ocr_spark.functions.curation import paragraph_dedup, soft_dedup_weights


def _rows(df, key):
    return {r[key]: r.asDict() for r in df.collect()}


class TestParagraphDedup:
    def test_keeps_first_occurrence_only(self, spark):
        df = spark.createDataFrame(
            [
                (1, "shared para\nunique one"),
                (2, "shared para\nunique two"),
                (3, "SHARED PARA  \nunique three"),  # normalizes equal
            ],
            ["doc_id", "text"],
        )
        out = _rows(paragraph_dedup(df, "doc_id", "text"), "doc")
        assert out[1]["clean_text"] == "shared para\nunique one"
        assert out[1]["n_dropped"] == 0
        # later copies (including case/space variants) drop
        assert out[2]["clean_text"] == "unique two"
        assert out[2]["n_dropped"] == 1
        assert out[3]["clean_text"] == "unique three"
        assert out[3]["n_dropped"] == 1

    def test_first_within_doc_wins_by_position(self, spark):
        df = spark.createDataFrame(
            [(1, "a\nb\na")], ["doc_id", "text"])
        out = _rows(paragraph_dedup(df, "doc_id", "text"), "doc")
        # the pos-0 'a' survives, the pos-2 duplicate drops
        assert out[1]["clean_text"] == "a\nb"
        assert out[1]["n_paras"] == 3 and out[1]["n_dropped"] == 1

    def test_blank_paragraphs_always_survive(self, spark):
        df = spark.createDataFrame(
            [(1, "x\n\ny"), (2, "x\n\nz")], ["doc_id", "text"])
        out = _rows(paragraph_dedup(df, "doc_id", "text"), "doc")
        assert out[1]["clean_text"] == "x\n\ny"
        assert out[2]["clean_text"] == "\nz"  # blank kept, 'x' deduped

    def test_all_dropped_doc_comes_back_empty(self, spark):
        df = spark.createDataFrame(
            [(1, "only"), (2, "only")], ["doc_id", "text"])
        out = _rows(paragraph_dedup(df, "doc_id", "text"), "doc")
        assert out[1]["clean_text"] == "only"
        assert out[2]["clean_text"] == "" and out[2]["n_dropped"] == 1

    def test_partition_invariance(self, spark):
        rows = [(i, f"common\nbody {i % 7}") for i in range(40)]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        a = paragraph_dedup(df.repartition(1), "doc_id", "text")
        b = paragraph_dedup(df.repartition(13), "doc_id", "text")
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


class TestSoftDedupWeights:
    def test_weights_are_inverse_cluster_size(self, spark):
        df = spark.createDataFrame(
            [(1, "dup"), (2, "dup"), (3, "dup"), (4, "uniq")],
            ["doc_id", "text"],
        )
        out = _rows(soft_dedup_weights(df, "doc_id", "text"), "doc")
        assert out[1]["cluster_size"] == 3
        assert out[1]["weight_micro"] == 333333  # floor, not round
        assert out[4]["weight_micro"] == 1000000

    def test_normalization_folds_case_and_trim(self, spark):
        df = spark.createDataFrame(
            [(1, "Same Text"), (2, "  same text ")], ["doc_id", "text"])
        out = _rows(soft_dedup_weights(df, "doc_id", "text"), "doc")
        assert out[1]["cluster_size"] == 2 == out[2]["cluster_size"]

    def test_every_doc_survives(self, spark):
        df = spark.createDataFrame(
            [(i, "same") for i in range(10)], ["doc_id", "text"])
        out = soft_dedup_weights(df, "doc_id", "text")
        assert out.count() == 10
        assert out.agg({"weight_micro": "sum"}).first()[0] == 10 * 100000


class TestPdfInfoMetadata:
    def _parse(self, spark, pdf):
        df = spark.createDataFrame([(1, pdf)], ["doc_id", "pdf"])
        return pdf_info_metadata(df, "doc_id", "pdf").first().asDict()

    def test_full_dict(self, spark):
        r = self._parse(
            spark,
            "%PDF-1.4 << /Title (Report 9) /Author (Bot)"
            " /Producer (tool 1.0) /CreationDate (D:20240115093045) >>")
        assert r["has_info"] == 1
        assert r["title"] == "Report 9" and r["author"] == "Bot"
        assert r["producer"] == "tool 1.0"
        assert r["created"] == "2024-01-15 09:30:45"

    def test_escaped_parens_in_title(self, spark):
        r = self._parse(spark, r"<< /Title (Esc \(draft\) v2) >>")
        assert r["title"] == "Esc (draft) v2"

    def test_prefix_truncated_date_pads(self, spark):
        r = self._parse(spark, "<< /CreationDate (D:2022) >>")
        assert r["created"] == "2022-01-01 00:00:00"
        r = self._parse(spark, "<< /CreationDate (D:20231201) >>")
        assert r["created"] == "2023-12-01 00:00:00"

    def test_timezone_suffix_ignored(self, spark):
        r = self._parse(
            spark, "<< /CreationDate (D:20240301120000+05'30') >>")
        assert r["created"] == "2024-03-01 12:00:00"

    def test_missing_fields_are_null_and_no_dict(self, spark):
        r = self._parse(spark, "<< /Author (Anon) >>")
        assert r["title"] is None and r["created"] is None
        assert r["author"] == "Anon"
        r = self._parse(spark, "%PDF-1.4 no info dict")
        assert r["has_info"] == 0
        assert r["title"] is None and r["author"] is None
        assert r["producer"] is None and r["created"] is None
