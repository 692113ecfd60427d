"""Unit tests for round-4 batch: Naive Bayes language classifier."""

from __future__ import annotations

import os

from ocr_spark.queries import QUERIES


class TestNaiveBayesLang:
    def test_separable_vocab_and_confusable_doc(self, spark, tmp_path):
        d = str(tmp_path)
        # train docs: id % 5 != 0; test docs: id % 5 == 0
        docs = [
            # aa trains on foo/bar
            (1, "foo foo bar", "aa", "s", 11),
            (2, "foo bar bar", "aa", "s", 11),
            (3, "foo foo foo", "aa", "s", 11),
            # bb trains on baz/qux
            (6, "baz qux baz", "bb", "s", 11),
            (7, "qux qux baz", "bb", "s", 11),
            # test: clearly aa
            (0, "foo bar foo", "aa", "s", 11),
            # test: clearly bb
            (5, "baz baz qux", "bb", "s", 11),
            # test: labeled aa but written in bb vocabulary -> the
            # classifier (correctly) calls it bb, scoring a miss
            (10, "baz qux", "aa", "s", 7),
        ]
        spark.createDataFrame(
            docs, ["doc_id", "text", "lang", "source", "n_chars"]
        ).write.parquet(os.path.join(d, "documents.parquet"))
        out = {r["true_lang"]: r.asDict()
               for r in QUERIES["naive_bayes_lang"](spark, d).collect()}
        assert out["aa"]["n_test"] == 2
        assert out["aa"]["n_correct"] == 1
        assert out["aa"]["acc_bp"] == 5000
        assert out["bb"]["n_test"] == 1
        assert out["bb"]["n_correct"] == 1
        assert out["bb"]["acc_bp"] == 10000
