"""Unit tests for round-4 batch: exact prefix-filtered similarity
join."""

from __future__ import annotations

import os

from ocr_spark.queries import QUERIES


def _docs(spark, tmp_path, n):
    d = str(tmp_path)
    spark.createDataFrame(
        [(i, f"body {i}") for i in range(n)], ["doc_id", "text"]
    ).write.parquet(os.path.join(d, "documents.parquet"))
    return d


class TestPrefixFilterJoin:
    def test_exact_vs_bruteforce_semantics(self, spark, tmp_path):
        # 40 docs -> clusters 0..19 of 2 docs each (doc, doc+20).
        # Within a cluster: both drop a different cluster token
        # (doc div 20 is 0 vs 1) and carry different noise tokens
        # unless doc % 7 wraps equal.
        d = _docs(spark, tmp_path, 40)
        rows = QUERIES["prefix_filter_join"](spark, d).collect()
        pairs = {(r["d1"], r["d2"]): r.asDict() for r in rows}
        # every same-cluster pair must be found (no false negatives)
        for c in range(20):
            assert (c, c + 20) in pairs, c
        # cluster 0: docs 0 and 20. doc 0 drops c0_0, doc 20 drops
        # c0_1; noise x0 vs x6 -> inter = 6 shared cluster tokens,
        # sizes 8/8 -> union 10, jaccard exactly 6000 bp (boundary in)
        p = pairs[(0, 20)]
        assert p["inter"] == 6 and p["union_sz"] == 10
        assert p["jaccard_bp"] == 6000
        # docs 1 and 21: drops c1_0 vs c1_1, noise x1 vs x0 -> same
        p = pairs[(1, 21)]
        assert p["jaccard_bp"] == 6000
        # doc 14 and 34: noise x0 vs x6... 14%7=0, 34%7=6 -> 6000
        # no cross-cluster pair sneaks in
        assert all(d1 % 20 == d2 % 20 for d1, d2 in pairs)
        assert len(pairs) == 20
