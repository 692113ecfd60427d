"""Edge-case tests for the round-3l operator batch: personalized
PageRank, exact ROC AUC, and the Kadane best-span fold."""

from __future__ import annotations

from ocr_spark.functions.curation import best_span, roc_auc
from ocr_spark.functions.graph import personalized_pagerank

SF = "/root/testdata/sf0.001"


def _ppr(spark, edges, seeds, **kw):
    e = spark.createDataFrame(edges, ["src", "dst"])
    s = spark.createDataFrame([(n,) for n in seeds], ["node"])
    return {r["node"]: r["rank"]
            for r in personalized_pagerank(e, s, **kw).collect()}


def test_ppr_unreachable_nodes_rank_zero(spark):
    # 0 -> 1; 2 -> 3 disconnected from seed 0
    out = _ppr(spark, [(0, 1), (2, 3)], [0])
    assert out[0] > 0 and out[1] > 0
    assert out[2] == 0 and out[3] == 0


def test_ppr_seed_outranks_distant(spark):
    # chain 0 -> 1 -> 2: mass decays with distance from the seed
    out = _ppr(spark, [(0, 1), (1, 2), (2, 0)], [0])
    assert out[0] > out[1] > out[2] > 0


def test_ppr_partition_invariance(spark):
    edges = [(i, (i * 7 + 3) % 20) for i in range(20) if i != (i * 7 + 3) % 20]
    e = spark.createDataFrame(edges, ["src", "dst"])
    s = spark.createDataFrame([(0,), (5,)], ["node"])
    a = {r["node"]: r["rank"]
         for r in personalized_pagerank(e, s).collect()}
    b = {r["node"]: r["rank"]
         for r in personalized_pagerank(e.repartition(7), s).collect()}
    assert a == b


def test_roc_auc_perfect_and_random(spark):
    # perfectly separating score
    rows = [(i, 1 if i >= 50 else 0) for i in range(100)]
    df = spark.createDataFrame(rows, ["s", "y"])
    assert roc_auc(df, "s", "y").collect()[0]["auc_bp"] == 10000
    # anti-separating score
    rows = [(i, 0 if i >= 50 else 1) for i in range(100)]
    df = spark.createDataFrame(rows, ["s", "y"])
    assert roc_auc(df, "s", "y").collect()[0]["auc_bp"] == 0


def test_roc_auc_all_tied_is_half(spark):
    rows = [(7, i % 2) for i in range(40)]
    df = spark.createDataFrame(rows, ["s", "y"])
    assert roc_auc(df, "s", "y").collect()[0]["auc_bp"] == 5000


def test_roc_auc_matches_sklearn_formula(spark):
    # hand check against the probabilistic definition on a small frame
    data = [(3, 1), (3, 0), (1, 0), (5, 1), (2, 0), (5, 0), (4, 1)]
    df = spark.createDataFrame(data, ["s", "y"])
    pos = [s for s, y in data if y == 1]
    neg = [s for s, y in data if y == 0]
    num = sum((p > n) + 0.5 * (p == n) for p in pos for n in neg)
    expect = int(10000 * num // (len(pos) * len(neg)))
    assert roc_auc(df, "s", "y").collect()[0]["auc_bp"] == expect


def _span(spark, text):
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    return best_span(df, "doc_id", "text").collect()[0]


def test_best_span_hand_cases(spark):
    # scores: len-3 -> 'looong'=3 'aa'=-1 'bbbbbb'=3 'c'=-2 'dddddd'=3
    r = _span(spark, "looong aa bbbbbb c dddddd")
    # best run: the whole thing = 3-1+3-2+3 = 6
    assert r["best_score"] == 6 and r["n_words"] == 5


def test_best_span_all_negative_floors_at_zero(spark):
    r = _span(spark, "a b c d")
    assert r["best_score"] == 0


def test_best_span_picks_interior_run(spark):
    # negative head/tail, strong middle
    r = _span(spark, "x verylongword anotherlongone y")
    # middle: (12-3)+(14-3)... 'verylongword'=12->9, 'anotherlongone'=14->11
    assert r["best_score"] == 20
