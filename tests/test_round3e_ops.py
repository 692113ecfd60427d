"""Edge-case tests for the round-3e operator batch: RRF rank fusion
(exact rank decomposition, tie semantics), integer Flesch readability
(hand-counted formula, degenerate docs), and int8 scalar quantization
(floor semantics, zero vectors, recall bounds).
"""

from __future__ import annotations

from ocr_spark.functions.curation import readability, rrf_fusion
from ocr_spark.functions.similarity import int8_codes, int8_topk


def test_rrf_ranks_match_global_sort(spark):
    # signals chosen so the three rankings disagree
    rows = [(1, 10, 1, 5), (2, 20, 2, 5), (3, 30, 3, 1)]
    df = spark.createDataFrame(rows, ["id", "a", "b", "c"])
    out = {r["id"]: r.asDict()
           for r in rrf_fusion(df, "id", ["a", "b", "c"]).collect()}
    assert (out[3]["rank_a"], out[2]["rank_a"], out[1]["rank_a"]) == (1, 2, 3)
    # signal c ties at 5 for ids 1,2 -> id-ordered within the tie
    assert (out[3]["rank_c"], out[1]["rank_c"], out[2]["rank_c"]) == (3, 1, 2)
    # fused score: scale//(60+r) summed over the three ranks
    s = 10**6
    assert out[1]["rrf_micro"] == s // 63 + s // 63 + s // 61
    assert out[3]["rrf_micro"] == s // 61 + s // 61 + s // 63


def test_rrf_all_equal_signal_is_pure_id_order(spark):
    df = spark.createDataFrame([(i, 7) for i in range(1, 6)], ["id", "s"])
    out = {r["id"]: r["rank_s"]
           for r in rrf_fusion(df, "id", ["s"]).collect()}
    assert out == {i: i for i in range(1, 6)}


def _read(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["id", "text"])
    return {r["id"]: r.asDict()
            for r in readability(df, "id", "text").collect()}


def test_readability_hand_counts(spark):
    out = _read(spark, ["The cat sat."])
    r = out[0]
    assert (r["n_words"], r["n_sentences"], r["n_syllables"]) == (3, 1, 3)
    assert r["flesch_milli"] == 206835 - (1015 * 3) // 1 - (84600 * 3) // 3
    assert r["band"] == "very_easy"


def test_readability_degenerate_docs(spark):
    out = _read(spark, ["", "   ", "no punctuation here"])
    assert 0 not in out and 1 not in out  # empty/ws-only excluded
    assert out[2]["n_sentences"] == 1     # floored, no div-by-zero


def test_readability_dense_prose_scores_lower(spark):
    easy = _read(spark, ["He is up. She is in. We go on."])[0]
    hard = _read(spark, [
        "Incomprehensibility characterizes institutionalization "
        "notwithstanding anthropological contemporaneousness."])[0]
    assert easy["flesch_milli"] > hard["flesch_milli"]
    assert hard["band"] == "very_difficult"


def _codes(spark, vecs):
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], ["vec_id", "emb"])
    return {r["nid"]: r["qv"]
            for r in int8_codes(df, "vec_id", "emb").collect()}


def test_int8_codes_floor_and_sign(spark):
    out = _codes(spark, [[-1.0, 0.5, 1.0, 0.0]])
    assert out[0] == [-127, 63, 127, 0]


def test_int8_codes_zero_vector_is_zero_not_nan(spark):
    out = _codes(spark, [[0.0, 0.0, 0.0]])
    assert out[0] == [0, 0, 0]


def test_int8_codes_scale_invariant(spark):
    a = _codes(spark, [[0.1, -0.2, 0.4]])[0]
    b = _codes(spark, [[1.0, -2.0, 4.0]])[0]
    assert a == b  # max-abs normalization cancels uniform scale


def test_int8_topk_identical_direction_wins(spark):
    # neighbor 10 is exactly query 0's direction; 11 is orthogonal
    vecs = {0: [1.0, 0.0], 10: [2.0, 0.0], 11: [0.0, 3.0]}
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], ["vec_id", "emb"])
    out = int8_topk(df, "vec_id", "emb", k=1, n_queries=1).collect()
    assert len(out) == 1
    assert out[0]["qid"] == 0 and out[0]["nid"] == 10
    assert out[0]["dot_q"] == 127 * 127


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


SF = "/root/testdata/sf0.001"


def test_readability_plan_zero_shuffle(spark):
    """Readability must be one codegen'd projection: no Exchange of any
    kind, no Python eval."""
    import __spark_entry__ as E

    p = _plan(E.queries()["readability"](spark, SF))
    # the only Exchange is _cpu's small-file RoundRobin repartition (a
    # no-op at production scale) — nothing keyed, nothing single-partition
    assert p.count("Exchange hashpartitioning") == 0
    assert p.count("Exchange SinglePartition") == 0
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_term_burstiness_plan_two_aggs_take_ordered(spark):
    """Exactly the (term,doc) pre-agg + (term) agg — two hash exchanges —
    and the top-100 as TakeOrderedAndProject, never a global Sort."""
    import __spark_entry__ as E

    p = _plan(E.queries()["term_burstiness"](spark, SF))
    assert p.count("Exchange hashpartitioning") == 2
    assert "TakeOrderedAndProject" in p


def test_int8_topk_plan_broadcast_one_window_shuffle(spark):
    """The query side must broadcast (no shuffled join of the corpus) and
    the only hash exchange is the qid-partitioned top-k window."""
    import __spark_entry__ as E

    p = _plan(E.queries()["int8_topk"](spark, SF))
    assert "BroadcastExchange" in p
    assert p.count("Exchange hashpartitioning") == 1
    assert "CartesianProduct" not in p


def test_pareto_plan_bucketed_prune_before_global(spark):
    """The data-sized window must be bucket-partitioned (one hash
    exchange); only the pruned survivors reach the single-partition
    global pass."""
    import __spark_entry__ as E

    p = _plan(E.queries()["pareto_orders"](spark, SF))
    assert p.count("Exchange hashpartitioning") == 1
    assert p.count("Exchange SinglePartition") == 1


def test_rank_fusion_plan_no_global_data_sort(spark):
    """Exact ranks without a global sort: the unpivoted formulation's
    histogram cumsum is a sig-partitioned window, so there is NO
    single-partition exchange at all (the round-3 per-column shape had
    three histogram-sized ones), at most four hash shuffles total for
    any number of signals, and no Python eval anywhere."""
    import __spark_entry__ as E

    p = _plan(E.queries()["rank_fusion"](spark, SF))
    assert "CartesianProduct" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert p.count("Exchange SinglePartition") == 0
    assert p.count("Exchange hashpartitioning") <= 4
