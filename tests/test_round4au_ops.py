"""Unit tests for round-4 batch: RAKE keyphrase extraction."""

from __future__ import annotations

import os

from ocr_spark.queries import QUERIES


def _write_docs(spark, tmp_path, texts):
    d = str(tmp_path)
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        ["doc_id", "text", "lang", "source", "n_chars"],
    ).write.parquet(os.path.join(d, "documents.parquet"))
    return d


class TestRakeKeyphrases:
    def test_multiword_phrase_outscores_common_word(self, spark, tmp_path):
        # 'deep learning systems' appears as one stopword-free run;
        # 'data' appears alone everywhere (high freq, low degree).
        texts = [
            "deep learning systems are improving with data.",
            "deep learning systems and data grow, and data grows.",
            "data is everywhere.",
        ]
        d = _write_docs(spark, tmp_path, texts)
        out = {r["phrase"]: r.asDict()
               for r in QUERIES["rake_keyphrases"](spark, d).collect()}
        assert "deep learning systems" in out
        assert out["deep learning systems"]["n_occ"] == 2
        # every member word has freq 2, degree 6 -> 3*3000 = 9000 milli
        assert out["deep learning systems"]["score_milli"] == 9000
        # 'data' as a token: occurrences 'data', 'data grow',
        # 'data grows', 'data' -> freq 4, deg 1+2+2+1 = 6 -> the lone
        # 'data' phrase scores 6000/4 = 1500 milli
        assert out["data"]["score_milli"] == 1500

    def test_stopwords_and_punctuation_split_phrases(self, spark, tmp_path):
        texts = ["the quick fox and the lazy dog. quick fox!"]
        d = _write_docs(spark, tmp_path, texts)
        out = {r["phrase"]: r.asDict()
               for r in QUERIES["rake_keyphrases"](spark, d).collect()}
        # 'and'/'the' never appear inside any candidate
        assert all(" and " not in p and not p.startswith("the ")
                   and p not in ("the", "and") for p in out)
        assert out["quick fox"]["n_occ"] == 2
        assert "lazy dog" in out

    def test_long_runs_are_dropped(self, spark, tmp_path):
        # a 5-word stopword-free run exceeds the 4-token cap
        texts = ["alpha beta gamma delta epsilon", "zeta eta"]
        d = _write_docs(spark, tmp_path, texts)
        out = {r["phrase"] for r in
               QUERIES["rake_keyphrases"](spark, d).collect()}
        assert "alpha beta gamma delta epsilon" not in out
        assert "zeta eta" in out
