"""Edge-case tests for the round-3g operator batch: per-group dup rates,
Unicode script composition, sitemap-vs-crawl coverage, and the dominant-
axis variance share."""

from __future__ import annotations

from ocr_spark.functions.curation import script_counts
from ocr_spark.functions.dedup import dup_rates
from ocr_spark.functions.similarity import axis_share

SF = "/root/testdata/sf0.001"


def test_dup_rates_all_unique_and_all_same(spark):
    rows = [("a", f"t{i}") for i in range(10)] + [("b", "same")] * 4
    df = spark.createDataFrame(rows, ["src", "text"])
    out = {r["src"]: r.asDict() for r in
           dup_rates(df, "src", "text").collect()}
    assert out["a"]["dup_docs"] == 0 and out["a"]["dup_bp"] == 0
    assert out["b"] == {"src": "b", "n_docs": 4, "n_distinct": 1,
                        "dup_docs": 3, "dup_bp": 7500}


def test_dup_rates_counts_are_per_group(spark):
    # identical text in two groups is NOT a cross-group duplicate
    rows = [("a", "x"), ("b", "x")]
    df = spark.createDataFrame(rows, ["src", "text"])
    for r in dup_rates(df, "src", "text").collect():
        assert r["dup_docs"] == 0


def test_script_counts_hand_string(spark):
    df = spark.createDataFrame([("अआ 汉 яз ab 12!",)], ["t"])
    r = script_counts(df, "t").collect()[0]
    assert r["deva_chars"] == 2
    assert r["han_chars"] == 1
    assert r["cyr_chars"] == 2
    assert r["latin_chars"] == 2
    assert r["digit_chars"] == 2
    assert r["other_chars"] == 5  # 4 spaces + '!'
    assert r["dominant_script"] == "deva"  # tie at 2 resolves deva-first


def test_script_counts_tiebreak_order(spark):
    # equal han/cyr/latin counts, zero deva: han wins by fixed priority
    df = spark.createDataFrame([("汉 я a",)], ["t"])
    assert script_counts(df, "t").collect()[0]["dominant_script"] == "han"


def test_script_mix_query_partitions_all_docs(spark):
    import duckdb

    import __spark_entry__ as E

    rows = E.queries()["script_mix"](spark, SF).collect()
    n_total = duckdb.sql(
        f"SELECT COUNT(*) FROM '{SF}/documents.parquet'").fetchone()[0]
    assert sum(r["n_docs"] for r in rows) == n_total
    assert {r["dominant_script"] for r in rows} <= {"deva", "han", "cyr",
                                                    "latin"}


def test_sitemap_coverage_invariants(spark):
    import __spark_entry__ as E

    rows = E.queries()["sitemap_coverage"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r["n_both"] <= min(r["n_sitemap"], r["n_crawled"])
        assert 0 <= r["coverage_bp"] <= 10000
        assert r["n_orphans"] == r["n_crawled"] - r["n_both"]


def test_axis_share_collapsed_corpus_near_10000(spark):
    # rank-1 corpus: every vector is a multiple of the same direction
    vecs = [[(i % 5 + 1) * c for c in (0.6, 0.8, 0.0, 0.0)]
            for i in range(40)]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], ["vec_id", "emb"])
    r = axis_share(df, "vec_id", "emb", n_iters=3).collect()[0]
    assert r["n_vecs"] == 40 and r["n_dims"] == 4
    assert r["share_bp"] >= 9999


def test_axis_share_isotropic_corpus_near_1_over_dim(spark):
    # 4 orthogonal axes, equal mass: share must sit near 10000/4
    vecs = [[1.0 if j == i % 4 else 0.0 for j in range(4)]
            for i in range(40)]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], ["vec_id", "emb"])
    r = axis_share(df, "vec_id", "emb", n_iters=3).collect()[0]
    # un-converged iterate on a degenerate spectrum still stays bounded
    assert 2000 <= r["share_bp"] <= 3500
