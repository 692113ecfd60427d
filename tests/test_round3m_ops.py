"""Edge-case tests for the round-3m operator batch: cross-label leakage
pairs, exact degree Gini, and cross-source quantile alignment."""

from __future__ import annotations

import __spark_entry__ as E

SF = "/root/testdata/sf0.001"


def test_label_leakage_pairs_all_cross_label(spark):
    rows = E.queries()["label_leakage_pairs"](spark, SF).collect()
    assert rows, "fixture embeddings must produce at least one pair"
    for r in rows:
        assert r["label_a"] != r["label_b"]
        assert r["doc_a"] < r["doc_b"]
        assert r["cos"] >= 0.3


def test_label_leakage_is_subset_of_near_dup(spark):
    near = {(r["doc_a"], r["doc_b"]) for r in
            E.queries()["embedding_near_dup"](spark, SF).collect()}
    leak = {(r["doc_a"], r["doc_b"]) for r in
            E.queries()["label_leakage_pairs"](spark, SF).collect()}
    assert leak <= near


def test_degree_gini_bounds_and_known_values(spark):
    from ocr_spark.queries import QUERIES

    r = QUERIES["degree_gini"](spark, SF).collect()[0]
    assert 0 <= r["gini_bp"] < 10000
    # graph fixture: out-degrees vary 0..4-ish -> nonzero inequality
    assert r["gini_bp"] > 0
    assert r["n"] == 100


def test_quantile_align_properties(spark):
    rows = E.queries()["quantile_align"](spark, SF).collect()
    assert rows
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    for src, rs in by_src.items():
        rs.sort(key=lambda r: r["pct_bp"])
        vals = [r["aligned_v"] for r in rs]
        # monotone: higher source percentile -> >= aligned global value
        assert vals == sorted(vals)
        # top of every source maps to the global maximum value
        assert rs[-1]["pct_bp"] == 10000
    tops = {rs[-1]["aligned_v"] for rs in by_src.values()}
    assert len(tops) == 1  # every source's 100th pct aligns to one value
