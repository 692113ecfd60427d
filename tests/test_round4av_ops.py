"""Unit tests for round-4 batch: skip-gram pair generation and
fixed-stride token chunking."""

from __future__ import annotations

import hashlib
import os

from ocr_spark.queries import QUERIES


def _write_docs(spark, tmp_path, texts):
    d = str(tmp_path)
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        ["doc_id", "text", "lang", "source", "n_chars"],
    ).write.parquet(os.path.join(d, "documents.parquet"))
    return d


class TestSkipgramPairs:
    def test_window_and_support(self, spark, tmp_path):
        # 'a b c' x3: pairs within +/-2 of each token
        texts = ["a b c", "a b c", "a b c"]
        d = _write_docs(spark, tmp_path, texts)
        out = {(r["center"], r["context"]): r["n_pairs"]
               for r in QUERIES["skipgram_pairs"](spark, d).collect()}
        # every ordered pair of distinct tokens is within the window
        assert out[("a", "b")] == 3 and out[("b", "a")] == 3
        assert out[("a", "c")] == 3 and out[("c", "a")] == 3
        assert out[("b", "c")] == 3 and out[("c", "b")] == 3
        # no self-pairs
        assert ("a", "a") not in out

    def test_distance_beyond_two_excluded(self, spark, tmp_path):
        texts = ["a x y z b"] * 3
        d = _write_docs(spark, tmp_path, texts)
        out = {(r["center"], r["context"]): r["n_pairs"]
               for r in QUERIES["skipgram_pairs"](spark, d).collect()}
        # a..b are 4 apart -> never a pair; a..y are 2 apart -> pair
        assert ("a", "b") not in out
        assert out[("a", "y")] == 3

    def test_cross_document_pairs_never_emitted(self, spark, tmp_path):
        texts = ["p q"] * 2 + ["r s"] * 2
        d = _write_docs(spark, tmp_path, texts)
        out = {(r["center"], r["context"])
               for r in QUERIES["skipgram_pairs"](spark, d).collect()}
        assert ("q", "r") not in out


class TestTokenChunking:
    def test_chunk_boundaries_and_overlap(self, spark, tmp_path):
        words = [f"w{i}" for i in range(20)]
        d = _write_docs(spark, tmp_path, [" ".join(words)])
        rows = {r["chunk_idx"]: r.asDict()
                for r in QUERIES["token_chunking"](spark, d).collect()}
        # 20 tokens, stride 6 -> starts 0,6,12,18 -> 4 chunks
        assert sorted(rows) == [0, 1, 2, 3]
        assert rows[0]["n_tokens"] == 8
        assert rows[2]["n_tokens"] == 8
        # tail chunk holds the last 2 tokens
        assert rows[3]["n_tokens"] == 2
        want0 = hashlib.md5(" ".join(words[0:8]).encode()).hexdigest()
        want1 = hashlib.md5(" ".join(words[6:14]).encode()).hexdigest()
        want3 = hashlib.md5(" ".join(words[18:20]).encode()).hexdigest()
        assert rows[0]["chunk_md5"] == want0
        assert rows[1]["chunk_md5"] == want1
        assert rows[3]["chunk_md5"] == want3

    def test_short_and_empty_docs(self, spark, tmp_path):
        d = _write_docs(spark, tmp_path, ["one two three", "   "])
        rows = QUERIES["token_chunking"](spark, d).collect()
        # the 3-token doc yields exactly one chunk; the blank doc none
        assert len(rows) == 1
        assert rows[0]["n_tokens"] == 3 and rows[0]["chunk_idx"] == 0
