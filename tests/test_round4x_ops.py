"""Unit tests for round-4 batch: greedy source set-cover and sorted-token
title dedup."""

from __future__ import annotations

import os

from ocr_spark.queries import QUERIES


class TestSourceCover:
    def test_greedy_rounds(self, spark, tmp_path):
        d = str(tmp_path)
        # srcA covers hosts {0,1,2}; srcB covers {2,3}; srcC covers
        # {0, 3}; srcD covers {4}. Greedy: A (3 new), then B (1 new:
        # host 3), then D (1 new: host 4).
        rows, did = [], 0
        for src, hosts in [("srcA", [0, 1, 2]), ("srcB", [2, 3]),
                           ("srcC", [0, 3]), ("srcD", [4])]:
            for h in hosts:
                rows.append((h + 50 * did, "t", "en", src, 10))
                did += 1
        # doc_id % 50 must equal the host -> build ids as h + 50k
        spark.createDataFrame(
            rows, ["doc_id", "text", "lang", "source", "n_chars"]
        ).write.parquet(os.path.join(d, "documents.parquet"))
        out = {r["round"]: r.asDict()
               for r in QUERIES["source_cover"](spark, d).collect()}
        assert out[1]["source"] == "srcA" and out[1]["new_hosts"] == 3
        assert out[2]["source"] == "srcB" and out[2]["new_hosts"] == 1
        assert out[3]["source"] == "srcD" and out[3]["new_hosts"] == 1

    def test_tie_breaks_to_smaller_source(self, spark, tmp_path):
        d = str(tmp_path)
        rows = [(0, "t", "en", "srcB", 1), (1, "t", "en", "srcA", 1)]
        spark.createDataFrame(
            rows, ["doc_id", "text", "lang", "source", "n_chars"]
        ).write.parquet(os.path.join(d, "documents.parquet"))
        out = {r["round"]: r.asDict()
               for r in QUERIES["source_cover"](spark, d).collect()}
        # both cover 1 host; lexicographically smaller source wins
        assert out[1]["source"] == "srcA"


class TestTitleSignatureDedup:
    def test_reordered_titles_collapse(self, spark, tmp_path):
        d = str(tmp_path)
        spark.createDataFrame(
            [(i, f"b{i}") for i in range(8)], ["doc_id", "text"]
        ).write.parquet(os.path.join(d, "documents.parquet"))
        rows = QUERIES["title_signature_dedup"](spark, d).collect()
        by_sig = {r["sig"]: r.asDict() for r in rows}
        # docs 0,4 (m0) and 1,5 (m1) share one signature
        news = by_sig["breaking markets news rally today"]
        assert news["n_docs"] == 4
        assert news["keeper"] == 0
        # docs 2,6 (m2, k%5 = 2 and 1) vs 3,7 (m3, k%5 = 3 and 2):
        # 'local team wins cup 2' appears for doc 2 (m2) and doc 7 (m3)
        pair = by_sig["2 cup local team wins"]
        assert pair["n_docs"] == 2
        assert pair["keeper"] == 2 and pair["max_doc"] == 7
        # singletons are filtered out
        assert all(v["n_docs"] >= 2 for v in by_sig.values())
