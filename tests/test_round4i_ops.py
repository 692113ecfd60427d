"""Unit tests for the round-4 web-extraction batch: html_lists,
meta_refresh, srcset_best, and the truncation_detect query."""

from __future__ import annotations

import os

from ocr_spark.functions.curation import html_lists, meta_refresh, srcset_best
from ocr_spark.queries import QUERIES


def _df(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "html"])


class TestHtmlLists:
    def test_counts_and_first_item(self, spark):
        out = {r["doc"]: r.asDict() for r in html_lists(_df(spark, [
            (1, "<ul><li>alpha</li><li>beta</li></ul><ol><li>one</li></ol>"),
            (2, '<UL class="nav"><LI> spaced </LI></UL>'),
            (3, "no lists"),
            (4, "<ol><li><b>bold</b> tail</li><li>plain</li></ol>"),
        ]), "doc_id", "html").collect()}
        assert out[1]["n_ul"] == 1 and out[1]["n_ol"] == 1
        assert out[1]["n_items"] == 3
        assert out[1]["first_item"] == "alpha"
        assert out[1]["sum_item_chars"] == len("alpha") + len("beta") + 3
        # uppercase tags match; item text trimmed
        assert out[2]["n_ul"] == 1 and out[2]["first_item"] == "spaced"
        assert out[3]["n_items"] == 0 and out[3]["first_item"] is None
        assert out[3]["sum_item_chars"] == 0
        # markup-first item contributes empty text -> NULL first_item
        assert out[4]["n_items"] == 2 and out[4]["first_item"] is None


class TestMetaRefresh:
    def test_variants(self, spark):
        out = {r["doc"]: r.asDict() for r in meta_refresh(_df(spark, [
            (1, '<meta http-equiv="refresh" content="5; url=https://a/b">'),
            (2, '<META CONTENT="0;URL=https://r/x" HTTP-EQUIV="Refresh">'),
            (3, '<meta http-equiv="refresh" content="30">'),
            (4, '<meta name="viewport" content="width=1">'),
        ]), "doc_id", "html").collect()}
        assert out[1] == {"doc": 1, "has_refresh": 1, "refresh_delay_s": 5,
                          "refresh_target": "https://a/b"}
        # reversed attribute order + uppercase
        assert out[2]["refresh_delay_s"] == 0
        assert out[2]["refresh_target"] == "https://r/x"
        # delay-only refresh: NULL target, still flagged
        assert out[3] == {"doc": 3, "has_refresh": 1, "refresh_delay_s": 30,
                          "refresh_target": None}
        assert out[4] == {"doc": 4, "has_refresh": 0, "refresh_delay_s": None,
                          "refresh_target": None}


class TestSrcsetBest:
    def test_width_argmax_and_density_skip(self, spark):
        out = {r["doc"]: r.asDict() for r in srcset_best(_df(spark, [
            (1, '<img srcset="a.jpg 480w, b.jpg 800w">'),
            (2, '<img srcset="c.jpg 320w">'),
            (3, '<img src="plain.jpg">'),
            (4, '<img srcset="d.jpg 1x, e.jpg 2x">'),      # density-only
            (5, '<IMG SRCSET="f.jpg 100w, g.jpg 1600w, h.jpg 2x">'),
        ]), "doc_id", "html").collect()}
        assert set(out) == {1, 2, 5}   # 3 (no srcset) and 4 drop out
        assert out[1]["best_url"] == "b.jpg" and out[1]["best_width"] == 800
        assert out[1]["n_candidates"] == 2
        assert out[2]["best_url"] == "c.jpg"
        # mixed descriptors: only the two width candidates count
        assert out[5]["n_candidates"] == 2
        assert out[5]["best_url"] == "g.jpg" and out[5]["best_width"] == 1600


class TestTruncationDetect:
    def test_all_branches(self, spark, tmp_path):
        d = str(tmp_path)
        spark.createDataFrame(
            [(i, "Body text") for i in range(5)], ["doc_id", "text"]
        ).write.parquet(os.path.join(d, "documents.parquet"))
        out = {r["doc"]: r.asDict()
               for r in QUERIES["truncation_detect"](spark, d).collect()}
        # doc 0: ' truncated mid sent' -> no terminal -> truncated
        assert out[0]["terminal"] == 0 and out[0]["truncated"] == 1
        # doc 1: ' done...' -> terminal AND ellipsis -> truncated
        assert out[1]["terminal"] == 1 and out[1]["ellipsis"] == 1
        assert out[1]["truncated"] == 1
        # doc 2: ' finished.' -> clean ending
        assert out[2] == {"doc": 2, "terminal": 1, "ellipsis": 0,
                          "dangling": 0, "truncated": 0}
        # doc 3: ' stop!' -> clean
        assert out[3]["truncated"] == 0
        # doc 4: ' sent to the' -> dangling function word
        assert out[4]["dangling"] == 1 and out[4]["truncated"] == 1
