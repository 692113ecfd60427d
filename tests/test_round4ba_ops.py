"""Unit tests for round-4 batch: corpus growth curves and
de-hyphenation repair."""

from __future__ import annotations

import hashlib
import os

from ocr_spark.queries import QUERIES


def _write_docs(spark, tmp_path, rows):
    d = str(tmp_path)
    spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    ).write.parquet(os.path.join(d, "documents.parquet"))
    return d


class TestCorpusGrowthCurves:
    def test_prefix_stats(self, spark, tmp_path):
        # 32 docs: docs 0-15 all say 'alpha beta'; docs 16-31 each have
        # a unique word -> vocab jumps after k=4, dup rate drops
        rows = []
        for i in range(16):
            rows.append((i, "alpha beta", "en", "s", 10))
        for i in range(16, 32):
            rows.append((i, f"uniq{i} alpha", "en", "s", 10))
        d = _write_docs(spark, tmp_path, rows)
        out = {r["k"]: r.asDict()
               for r in QUERIES["corpus_growth_curves"](spark, d)
               .collect()}
        # k=4: first 16 docs, all identical content
        assert out[4]["n_docs"] == 16
        assert out[4]["n_tokens"] == 32
        assert out[4]["vocab"] == 2
        assert out[4]["distinct_content"] == 1
        assert out[4]["dup_bp"] == (16 - 1) * 10000 // 16
        # k=5: all 32 docs; 16 unique texts + 1 shared
        assert out[5]["n_docs"] == 32
        assert out[5]["vocab"] == 2 + 16
        assert out[5]["distinct_content"] == 17
        # larger prefixes see the same corpus (only 32 docs exist)
        assert out[10]["n_docs"] == 32
        assert out[10]["vocab"] == out[5]["vocab"]


class TestDehyphenate:
    def test_repair_and_precision(self, spark, tmp_path):
        rows = [(i, "t", "en", "s", 1) for i in range(8)]
        d = _write_docs(spark, tmp_path, rows)
        out = {r["doc"]: r.asDict()
               for r in QUERIES["dehyphenate"](spark, d).collect()}
        # doc 0: two broken words rejoin
        assert out[0]["n_repairs"] == 2
        want = hashlib.md5(
            ("the example shows a hyphenated line break "
             + str(0 % 5)).encode()).hexdigest()
        assert out[0]["repaired_md5"] == want
        # compounds keep their hyphens
        assert out[1]["n_repairs"] == 0
        want1 = hashlib.md5(
            ("a state-of-the-art system with well-known parts "
             + str(1 % 3)).encode()).hexdigest()
        assert out[1]["repaired_md5"] == want1
        # spaced dash between numbers is not a line break
        assert out[2]["n_repairs"] == 0
        assert out[3]["n_repairs"] == 0
