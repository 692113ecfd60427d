"""Unit tests for round-4 batch: sparse TF-IDF dot-product top-k."""

from __future__ import annotations

import os

from ocr_spark.queries import QUERIES


class TestSparseDotTopk:
    def test_shared_rare_terms_rank_first(self, spark, tmp_path):
        d = str(tmp_path)
        docs = [
            # 'the' appears in EVERY doc (idf 0); doc 0 shares the rare
            # 'zyzzyva' with doc 20 and nothing informative with doc 21
            (0, "the zyzzyva report", "en", "s", 1),
            (20, "the zyzzyva appeared", "en", "s", 1),
            (21, "the the the common text", "en", "s", 1),
            (22, "the unrelated words", "en", "s", 1),
        ]
        spark.createDataFrame(
            docs, ["doc_id", "text", "lang", "source", "n_chars"]
        ).write.parquet(os.path.join(d, "documents.parquet"))
        out = [r.asDict() for r in
               QUERIES["sparse_dot_topk"](spark, d).collect()
               if r["qdoc"] == 0]
        ranked = sorted(out, key=lambda r: r["rank"])
        # doc 20 (rare-term overlap) beats the stop-word-only overlaps
        assert ranked[0]["ndoc"] == 20
        assert ranked[0]["dot"] > 0
        # stop-word-only neighbors carry exactly zero weight
        assert all(r["dot"] == 0 for r in ranked[1:])
        # self never appears as its own neighbor
        assert all(r["ndoc"] != 0 for r in out)

    def test_idf_zero_for_ubiquitous_terms(self, spark, tmp_path):
        d = str(tmp_path)
        # 'the' appears in EVERY doc -> idf = ln(1) = 0 -> dot via
        # 'the' alone is 0
        docs = [
            (0, "the alpha", "en", "s", 1),
            (11, "the beta", "en", "s", 1),
            (12, "the gamma", "en", "s", 1),
        ]
        spark.createDataFrame(
            docs, ["doc_id", "text", "lang", "source", "n_chars"]
        ).write.parquet(os.path.join(d, "documents.parquet"))
        out = [r.asDict() for r in
               QUERIES["sparse_dot_topk"](spark, d).collect()
               if r["qdoc"] == 0]
        assert len(out) == 2
        assert all(r["dot"] == 0 for r in out)
