"""Unit tests for round-4 batch: Cohen's kappa and decision-stump
training."""

from __future__ import annotations

import os

from ocr_spark.queries import QUERIES


class TestCohensKappa:
    def test_chance_correction(self, spark, tmp_path):
        d = str(tmp_path)
        # 21 docs, mislabels at 0,7,14 (one per class) — same labeler
        # pair as multiclass_prf
        spark.createDataFrame(
            [(i, f"b{i}") for i in range(21)], ["doc_id", "text"]
        ).write.parquet(os.path.join(d, "documents.parquet"))
        out = QUERIES["cohens_kappa"](spark, d).collect()[0].asDict()
        assert out["total"] == 21 and out["agree"] == 18
        # po = 18/21 -> 8571 bp
        assert out["po_bp"] == 8571
        # marginals: rows 7/7/7; cols 7/7/7 -> pe = 3*49/441 = 1/3
        assert out["pe_bp"] == 3333
        # kappa = (8571-3333)/(10000-3333) -> 5238*10000//6667 = 7856
        assert out["kappa_bp"] == (8571 - 3333) * 10000 // (10000 - 3333)


class TestDecisionStump:
    def test_perfect_split(self, spark, tmp_path):
        d = str(tmp_path)
        # feature n_chars separates the label exactly: positives
        # (doc_id%3==0) get small n_chars, negatives get large
        rows = []
        for i in range(12):
            n_chars = 10 + i if i % 3 == 0 else 1000 + i
            rows.append((i, "t", "en", "s", n_chars))
        spark.createDataFrame(
            rows, ["doc_id", "text", "lang", "source", "n_chars"]
        ).write.parquet(os.path.join(d, "documents.parquet"))
        out = QUERIES["decision_stump"](spark, d).collect()[0].asDict()
        # best threshold = largest positive feature value (19), cost 0
        assert out["threshold"] == 19
        assert out["gini_cost_bp"] == 0
        assert out["n_left"] == 4 and out["n_right"] == 8

    def test_impure_split_cost(self, spark, tmp_path):
        d = str(tmp_path)
        # 4 docs: f=1 (pos), f=2 (neg), f=3 (pos), f=4 (neg):
        # t=1: left (1 pos) cost 0 + right (1 pos, 2 neg):
        #   2*1*2*10000//3 = 13333 -> total 13333
        # t=2: left (1p,1n): 2*1*1*10000//2 = 10000; right (1p,1n):
        #   10000 -> 20000
        # t=3: left (2p,1n): 2*2*1*10000//3=13333; right 0 -> 13333
        # argmin ties at 13333 -> smaller threshold 1 wins
        rows = [(0, "t", "en", "s", 1), (1, "t", "en", "s", 2),
                (3, "t", "en", "s", 3), (4, "t", "en", "s", 4)]
        spark.createDataFrame(
            rows, ["doc_id", "text", "lang", "source", "n_chars"]
        ).write.parquet(os.path.join(d, "documents.parquet"))
        out = QUERIES["decision_stump"](spark, d).collect()[0].asDict()
        assert out["threshold"] == 1
        assert out["gini_cost_bp"] == 13333
