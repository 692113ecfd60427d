"""Edge-case tests for the round-3r operator batch: mutual-NN pairing
and modified bigram precision."""

from __future__ import annotations

import __spark_entry__ as E

SF = "/root/testdata/sf0.001"


def test_mutual_nn_pairs_are_reciprocal_and_canonical(spark):
    rows = E.queries()["mutual_nn_pairs"](spark, SF).collect()
    assert rows
    seen = set()
    for r in rows:
        assert r["doc_a"] < r["doc_b"]
        key = (r["doc_a"], r["doc_b"])
        assert key not in seen  # each mutual pair appears exactly once
        seen.add(key)


def test_mutual_nn_is_subset_of_directional_best(spark):
    # every mutual pair's cosine must be >= any other bucket-pair cosine
    # involving either endpoint (it IS both endpoints' best)
    near = {}
    for r in E.queries()["embedding_near_dup"](spark, SF).collect():
        near.setdefault(r["doc_a"], []).append(r["cos"])
        near.setdefault(r["doc_b"], []).append(r["cos"])
    for r in E.queries()["mutual_nn_pairs"](spark, SF).collect():
        for end in (r["doc_a"], r["doc_b"]):
            if end in near:  # near_dup lists only cos >= 0.3 pairs
                assert r["cos"] >= max(near[end]) - 1e-9


def test_ngram_precision_less_than_perfect_by_construction(spark):
    rows = E.queries()["ngram_precision"](spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r["precision_bp"] < 10000  # the tail bigrams never match
        assert r["clipped"] <= r["total"]
        assert r["precision_bp"] == 10000 * r["clipped"] // r["total"]


def test_ngram_precision_identity_on_clean_pred(spark):
    from pyspark.sql import functions as F

    # hand-check: pred == gold -> every bigram clips fully
    from ocr_spark.queries import QUERIES  # noqa: F401 (import parity)

    df = spark.createDataFrame([(1, "a b c d e")], ["doc", "text"])
    gw = F.split(F.trim(F.col("text")), r"\s+")
    n = F.size(gw)
    grams = F.zip_with(F.slice(gw, 1, n - 1), F.slice(gw, 2, n - 1),
                       lambda x, y: F.concat_ws(" ", x, y))
    out = df.select(F.explode(grams).alias("g")).collect()
    assert [r["g"] for r in out] == ["a b", "b c", "c d", "d e"]
