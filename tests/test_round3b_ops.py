"""Edge-case tests for the round-3b operator batch: zone-map pruning
(boundary inclusivity, false-positive files, fully-pruned predicates) and
phrase-index retrieval (degenerate docs, tie-breaks, multiplicity) —
properties the oracle parity harness can't express.
"""

from __future__ import annotations

from ocr_spark.functions.curation import (
    ks_drift,
    ngram_novelty,
    phrase_topk,
    zipf_fit,
    zone_map_prune,
)
from ocr_spark.functions.graph import label_propagation


def _prune(spark, rows, preds):
    df = spark.createDataFrame(rows, ["f", "x"])
    out = zone_map_prune(df, "f", preds)
    return {r["pred_id"]: r.asDict() for r in out.collect()}


def test_zone_map_prune_boundary_inclusive(spark):
    # file 0 holds {10, 20}, file 1 holds {30, 40}
    rows = [(0, 10), (0, 20), (1, 30), (1, 40)]
    # hi == file-0 max and lo == file-1 min: both files kept
    out = _prune(spark, rows, [(1, "x", 20, 30)])
    assert out[1]["n_files_kept"] == 2
    assert out[1]["exact_rows"] == 2
    assert out[1]["n_fp_files"] == 0


def test_zone_map_prune_prunes_and_counts_rows(spark):
    rows = [(0, 10), (0, 20), (1, 30), (1, 40), (2, 50)]
    out = _prune(spark, rows, [(1, "x", 35, 60)])
    r = out[1]
    assert r["n_files"] == 3
    assert r["n_files_kept"] == 2          # file 0 pruned
    assert r["rows_total"] == 5
    assert r["rows_in_kept_files"] == 3
    assert r["exact_rows"] == 2            # 40 and 50
    # 30 is in a kept file but outside the range: zone maps over-read
    assert r["exact_rows"] < r["rows_in_kept_files"]


def test_zone_map_prune_false_positive_file(spark):
    # file 0 spans [10, 30] but holds no 20: kept AND zero matches
    rows = [(0, 10), (0, 30), (1, 100)]
    out = _prune(spark, rows, [(1, "x", 20, 20)])
    r = out[1]
    assert r["n_files_kept"] == 1
    assert r["exact_rows"] == 0
    assert r["n_fp_files"] == 1


def test_zone_map_prune_all_pruned(spark):
    rows = [(0, 10), (1, 20)]
    out = _prune(spark, rows, [(1, "x", 500, 600)])
    r = out[1]
    assert r["n_files_kept"] == 0
    assert r["rows_in_kept_files"] == 0
    assert r["exact_rows"] == 0
    assert r["n_fp_files"] == 0


def test_zone_map_prune_multi_pred_multi_col(spark):
    df = spark.createDataFrame(
        [(0, 1, 100), (0, 2, 200), (1, 3, 300)], ["f", "a", "b"]
    )
    out = zone_map_prune(
        df, "f", [(1, "a", 1, 1), (2, "b", 250, 999)]
    )
    got = {r["pred_id"]: r.asDict() for r in out.collect()}
    assert got[1]["col"] == "a" and got[1]["exact_rows"] == 1
    assert got[2]["col"] == "b" and got[2]["n_files_kept"] == 1
    assert got[2]["rows_in_kept_files"] == 1


def _phrases(spark, rows, k=3):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    return phrase_topk(df, "doc_id", "text", k).collect()


def test_phrase_topk_degenerate_docs(spark):
    # empty / whitespace / single-token docs contribute no bigrams
    rows = [(0, ""), (1, "   "), (2, "one"), (3, "a b a b")]
    out = _phrases(spark, rows, k=2)
    assert {r["bigram"] for r in out} == {"a b", "b a"}
    occ = {(r["bigram"], r["doc_id"]): r["n_occ"] for r in out}
    assert occ[("a b", 3)] == 2            # within-doc multiplicity
    assert occ[("b a", 3)] == 1


def test_phrase_topk_tie_break_lexicographic(spark):
    # three bigrams all with frequency 1; k=2 must take the two smallest
    rows = [(0, "z z"), (1, "a a"), (2, "m m")]
    out = _phrases(spark, rows, k=2)
    assert sorted({r["bigram"] for r in out}) == ["a a", "m m"]


def test_phrase_topk_corpus_freq_consistency(spark):
    rows = [(0, "x y x y"), (1, "x y"), (2, "q r")]
    out = _phrases(spark, rows, k=1)
    assert all(r["bigram"] == "x y" for r in out)
    assert all(r["corpus_freq"] == 3 for r in out)
    assert sum(r["n_occ"] for r in out) == 3


def _lpa(spark, edges, n_iters=4):
    df = spark.createDataFrame(edges, ["src", "dst"])
    out = label_propagation(df, n_iters=n_iters)
    return {r["node"]: (r["community"], r["community_size"])
            for r in out.collect()}


def test_label_propagation_two_cliques(spark):
    # two triangles with no connection: two communities of size 3
    tri1 = [(0, 1), (1, 2), (2, 0)]
    tri2 = [(10, 11), (11, 12), (12, 10)]
    out = _lpa(spark, tri1 + tri2)
    c1 = {out[n][0] for n in (0, 1, 2)}
    c2 = {out[n][0] for n in (10, 11, 12)}
    assert len(c1) == 1 and len(c2) == 1 and c1 != c2
    assert all(out[n][1] == 3 for n in out)


def test_label_propagation_barbell_keeps_sides(spark):
    # two triangles joined by one bridge edge: each side stays one block
    edges = [(0, 1), (1, 2), (2, 0), (10, 11), (11, 12), (12, 10), (2, 10)]
    out = _lpa(spark, edges)
    assert len({out[n][0] for n in (0, 1, 2)}) == 1
    assert len({out[n][0] for n in (10, 11, 12)}) == 1


def test_label_propagation_symmetrizes_directed_edges(spark):
    # a one-directional edge still makes both endpoints neighbors
    out = _lpa(spark, [(7, 8), (8, 9), (9, 7)])
    assert len({out[n][0] for n in (7, 8, 9)}) == 1


def test_label_propagation_partition_invariance(spark):
    edges = [(a, (a * 13 + j * 29) % 50) for a in range(50)
             for j in (1, 2) if (a * 13 + j * 29) % 50 != a]
    df1 = spark.createDataFrame(edges, ["src", "dst"])
    df2 = df1.repartition(17, "dst")
    r1 = sorted(map(tuple, label_propagation(df1).collect()))
    r2 = sorted(map(tuple, label_propagation(df2).collect()))
    assert r1 == r2


def _ks(spark, a_vals, b_vals):
    rows = [(v, 0) for v in a_vals] + [(v, 1) for v in b_vals]
    df = spark.createDataFrame(rows, ["v", "side"])
    return ks_drift(df, "v", "side").collect()[0].asDict()


def test_ks_drift_identical_sides_zero(spark):
    r = _ks(spark, [1, 2, 3], [1, 2, 3])
    assert r["d_num"] == 0 and r["ks_bp"] == 0
    assert r["at_value"] == 1              # tie-break: smallest value


def test_ks_drift_disjoint_is_10000bp(spark):
    r = _ks(spark, [1, 1, 1, 1], [2, 2, 2])
    assert r["n_a"] == 4 and r["n_b"] == 3
    assert r["at_value"] == 1
    assert r["d_num"] == 12 and r["ks_bp"] == 10000


def test_ks_drift_hand_computed(spark):
    r = _ks(spark, [1, 2], [1, 3])
    assert r["at_value"] == 2
    assert r["d_num"] == 2 and r["ks_bp"] == 5000


def _zipf(spark, freqs):
    # one row per word occurrence: term_i with frequency freqs[i]
    text = " ".join(
        " ".join(f"w{i:03d}" for _ in range(f)) for i, f in enumerate(freqs)
    )
    df = spark.createDataFrame([(0, text)], ["doc_id", "text"])
    return zipf_fit(df, "text").collect()[0].asDict()


def test_zipf_fit_true_zipf_slope_near_minus_one(spark):
    # freq = 840 / rank exactly: the continuous slope is -1
    r = _zipf(spark, [840 // i for i in range(1, 9)])
    assert r["n_terms"] == 8
    # exact fixture: 840 = lcm(1..8), so freq = 840/rank exactly and the
    # continuous slope is -1; milli-nat quantization leaves ~1e-4
    assert 995_000 <= r["abs_slope_ppm"] <= 1_005_000
    assert r["num"] < 0 and r["den"] > 0


def test_zipf_fit_flat_distribution_zero_slope(spark):
    r = _zipf(spark, [7] * 10)
    assert r["num"] == 0 and r["abs_slope_ppm"] == 0


def test_zipf_fit_single_term_degenerate(spark):
    r = _zipf(spark, [5])
    assert r["n_terms"] == 1
    assert r["den"] == 0 and r["abs_slope_ppm"] == 0


def _novelty(spark, rows):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    return {r["doc_id"]: r.asDict()
            for r in ngram_novelty(df, "doc_id", "text", 3).collect()}


def test_ngram_novelty_copy_scores_zero(spark):
    out = _novelty(spark, [
        (0, "a b c d e"),          # introduces all 3 trigrams
        (1, "a b c d e"),          # exact copy: nothing novel
        (2, "a b c x y z"),        # 1 old trigram (a b c), 3 new
    ])
    assert out[0]["novelty_bp"] == 10000 and out[0]["n_grams"] == 3
    assert out[1]["novelty_bp"] == 0 and out[1]["n_novel"] == 0
    assert out[2]["n_grams"] == 4 and out[2]["n_novel"] == 3
    assert out[2]["novelty_bp"] == 7500


def test_ngram_novelty_short_and_empty_docs(spark):
    out = _novelty(spark, [(0, "one two"), (1, ""), (2, "x y z")])
    assert out[0]["n_grams"] == 0 and out[0]["novelty_bp"] == 0
    assert out[1]["n_grams"] == 0
    assert out[2]["novelty_bp"] == 10000


def test_ngram_novelty_within_doc_repeat_counts_once(spark):
    out = _novelty(spark, [(0, "a b c a b c a b c")])
    # distinct trigrams of the cycle: a b c / b c a / c a b — each once
    assert out[0]["n_grams"] == 3 and out[0]["n_novel"] == 3


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_zipf_fit_topk_is_take_ordered(spark):
    """The top-256 vocabulary selection must plan as TakeOrderedAndProject
    (a bounded heap per partition), never a global Sort of the whole
    vocabulary; the only data-sized shuffle is the term agg."""
    import __spark_entry__ as E

    plan = _plan(E.queries()["zipf_fit"](spark, "/root/testdata/sf0.001"))
    assert "TakeOrderedAndProject" in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_ngram_novelty_plan_no_corpus_distinct(spark):
    """In-doc dedup must be the array_distinct projection — no corpus-wide
    (doc, gram) DISTINCT Exchange, no cartesian anywhere; every shuffle is
    keyed on grams or doc ids (<= 4 hash exchanges pre-AQE)."""
    import __spark_entry__ as E

    df = E.queries()["ngram_novelty"](spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "array_distinct" in plan
    assert plan.count("Exchange hashpartitioning") <= 4
