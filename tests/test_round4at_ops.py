"""Unit tests for round-4 batch: soft-404 detection and price
normalization to integer cents."""

from __future__ import annotations

import os

from ocr_spark.queries import QUERIES


def _write_docs(spark, tmp_path, n):
    d = str(tmp_path)
    spark.createDataFrame(
        [(i, "t", "en", "s", 1) for i in range(n)],
        ["doc_id", "text", "lang", "source", "n_chars"],
    ).write.parquet(os.path.join(d, "documents.parquet"))
    return d


class TestSoft404Detect:
    def test_branches(self, spark, tmp_path):
        d = _write_docs(spark, tmp_path, 10)
        out = {r["doc"]: r.asDict()
               for r in QUERIES["soft404_detect"](spark, d).collect()}
        # doc 0: real prose, 200 -> clean
        assert out[0]["soft404"] == 0
        # doc 1: 'Error 404' boilerplate served with 200 -> soft404
        assert out[1]["status"] == 200 and out[1]["soft404"] == 1
        assert out[1]["strong_hits"] >= 1
        # doc 2: prose that mentions the number 404 -> never gates
        assert out[2]["strong_hits"] == 0 and out[2]["soft404"] == 0
        # doc 3: hard 404 (status 404) -> routed by status, not flagged
        assert out[3]["status"] == 404 and out[3]["soft404"] == 0
        # doc 4: two weak phrases with 200 -> soft404
        assert out[4]["weak_hits"] == 2 and out[4]["soft404"] == 1


class TestPriceNormalize:
    def test_all_formats(self, spark, tmp_path):
        d = _write_docs(spark, tmp_path, 12)
        out = {r["doc"]: r.asDict()
               for r in QUERIES["price_normalize"](spark, d).collect()}
        # US format with thousands comma and cents
        assert out[0]["currency"] == "USD"
        assert out[0]["amount_cents"] == 129999
        # EU decimal comma
        assert out[1]["currency"] == "EUR"
        assert out[1]["amount_cents"] == 1250
        # Indian 2-2-3 grouping: commas stripped
        assert out[2]["currency"] == "INR"
        assert out[2]["amount_cents"] == 12345600
        # code-prefixed integer amount
        assert out[3]["currency"] == "USD"
        assert out[3]["amount_cents"] == 4900
        # no price signal -> NULL, not zero
        assert out[4]["currency"] is None
        assert out[4]["amount_cents"] is None
        # a bare number ('3,000 feet') never becomes a price
        assert out[5]["currency"] is None
        assert out[5]["amount_cents"] is None
