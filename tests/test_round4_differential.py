"""Differential tests: the cross-engine string ops added this session
(Soundex blocking, de-hyphenation) checked against independent pure-
Python reference implementations over a deterministic pseudo-random
word corpus — the same third-implementation discipline as the
extractor differentials (tests/test_native_vs_oracle.py)."""

from __future__ import annotations

import os
import re

from ocr_spark.queries import QUERIES

_CODES = {}
for letters, digit in (("BFPV", "1"), ("CGJKQSXZ", "2"), ("DT", "3"),
                       ("L", "4"), ("MN", "5"), ("R", "6")):
    for ch in letters:
        _CODES[ch] = digit


def soundex_ref(word: str) -> str:
    """Canonical American Soundex (NIST rules), implemented with
    Python's backreference regex — machinery the engine versions cannot
    use (RE2 has no backrefs), so agreement is meaningful."""
    u = word.upper()
    first = u[0]
    digits = "".join(
        _CODES.get(c, "" if c in "HW" else "0") for c in u)
    digits = re.sub(r"(\d)\1+", r"\1", digits)
    tail = digits if first in "HW" else digits[1:]
    tail = tail.replace("0", "")
    return first + (tail + "000")[:3]


def _words(n=200):
    out = []
    for i in range(n):
        w = "".join(chr(97 + (i * 7 + j * 13 + i * j) % 26)
                    for j in range(3 + i % 6))
        out.append(w)
    return sorted(set(out))


class TestSoundexDifferential:
    def test_pseudo_random_words_match_reference(self, spark, tmp_path):
        import datetime as dt  # noqa: F401  (schema parity with fixtures)

        d = str(tmp_path)
        words = _words()
        spark.createDataFrame(
            [(i, w, "Brand#1", "ECONOMY", 1, 1.0)
             for i, w in enumerate(words)],
            ["p_partkey", "p_name", "p_brand", "p_type", "p_size",
             "p_retailprice"],
        ).write.parquet(os.path.join(d, "part.parquet"))
        out = {r["word"]: r["soundex_code"]
               for r in QUERIES["soundex_blocking"](spark, d).collect()}
        assert len(out) == len(words)
        mismatches = {w: (out[w], soundex_ref(w))
                      for w in words if out[w] != soundex_ref(w)}
        assert mismatches == {}


class TestDehyphenateDifferential:
    def test_branch_texts_match_python_re(self, spark, tmp_path):
        import hashlib

        d = str(tmp_path)
        spark.createDataFrame(
            [(i, "t", "en", "s", 1) for i in range(32)],
            ["doc_id", "text", "lang", "source", "n_chars"],
        ).write.parquet(os.path.join(d, "documents.parquet"))
        out = {r["doc"]: r.asDict()
               for r in QUERIES["dehyphenate"](spark, d).collect()}

        def text_for(k):
            m = k % 4
            if m == 0:
                return ("the exam- ple shows a hyphen- ated line break "
                        + str(k % 5))
            if m == 1:
                return ("a state-of-the-art system with well-known "
                        "parts " + str(k % 3))
            if m == 2:
                return "the final score was 3 - 2 in the match " \
                    + str(k % 4)
            return "plain prose with no broken words at all " + str(k % 6)

        for k in range(32):
            t = text_for(k)
            repaired = re.sub(r"([a-z])-\s+([a-z])", r"\1\2", t)
            n = len(re.findall(r"([a-z])-\s+([a-z])", t))
            assert out[k]["n_repairs"] == n, k
            want = hashlib.md5(repaired.encode()).hexdigest()
            assert out[k]["repaired_md5"] == want, k
