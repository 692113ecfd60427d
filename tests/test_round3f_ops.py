"""Edge-case tests for the round-3f operator batch: k-core peel
(cascading removals, convergence raise, complete/empty cores) and the
cross-source LSH overlap matrix (bounds, canonical ordering).
"""

from __future__ import annotations

import pytest

from ocr_spark.functions.graph import kcore


def _core(spark, edges, k, **kw):
    df = spark.createDataFrame(edges, ["src", "dst"])
    return {r["node"]: r["degree"] for r in kcore(df, k=k, **kw).collect()}


TRI = [(1, 2), (2, 3), (1, 3)]


def test_kcore_triangle_survives_pendant_peels(spark):
    out = _core(spark, TRI + [(1, 4)], k=2)
    assert out == {1: 2, 2: 2, 3: 2}  # node 1's degree measured IN core


def test_kcore_cascading_peel(spark):
    # 5-4-1 path: peeling 5 drops 4 to degree 1, which peels next round
    out = _core(spark, TRI + [(1, 4), (4, 5)], k=2)
    assert out == {1: 2, 2: 2, 3: 2}


def test_kcore_path_has_no_2core(spark):
    out = _core(spark, [(1, 2), (2, 3), (3, 4)], k=2)
    assert out == {}


def test_kcore_complete_graph_is_its_own_core(spark):
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    out = _core(spark, k4, k=3)
    assert out == {n: 3 for n in range(4)}


def test_kcore_raises_instead_of_partial_result(spark):
    with pytest.raises(RuntimeError, match="did not converge"):
        _core(spark, TRI + [(1, 4), (4, 5)], k=2, max_iters=1)


def test_source_overlap_bounds_and_ordering(spark):
    import __spark_entry__ as E

    rows = E.queries()["source_overlap"](
        spark, "/root/testdata/sf0.001").collect()
    assert rows, "fixture corpus must produce at least one overlap cell"
    for r in rows:
        assert r["src_a"] <= r["src_b"]          # canonical unordered pair
        assert 0 < r["overlap_ppm"] <= 10**6     # a ppm share
        assert r["n_pairs"] >= 1


def test_source_overlap_plan_no_cartesian_no_python(spark):
    import __spark_entry__ as E

    df = E.queries()["source_overlap"](spark, "/root/testdata/sf0.001")
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


from ocr_spark.functions.graph import seed_distance


def _dist(spark, edges, seeds, rounds=4):
    e = spark.createDataFrame(edges, ["src", "dst"])
    s = spark.createDataFrame([(n,) for n in seeds], ["node"])
    return {r["node"]: r["dist"]
            for r in seed_distance(e, s, rounds=rounds).collect()}


def test_seed_distance_chain_and_horizon(spark):
    # 0 -> 1 -> 2 -> 3 -> 4 -> 5, seed 0, 4 rounds: node 5 beyond horizon
    edges = [(i, i + 1) for i in range(5)]
    out = _dist(spark, edges, [0], rounds=4)
    assert out == {0: 0, 1: 1, 2: 2, 3: 3, 4: 4}


def test_seed_distance_min_over_paths(spark):
    # 0->1->2 and 0->2 direct: dist(2) must be 1, not 2
    out = _dist(spark, [(0, 1), (1, 2), (0, 2)], [0])
    assert out[2] == 1


def test_seed_distance_multiple_seeds_take_nearest(spark):
    out = _dist(spark, [(0, 1), (1, 2), (9, 2)], [0, 9])
    assert out[2] == 1  # via seed 9, not 2 via seed 0
    assert out[9] == 0


def test_seed_distance_directedness(spark):
    # edge 1->0 does NOT make 1 reachable from seed 0
    out = _dist(spark, [(1, 0)], [0])
    assert out == {0: 0}


def test_vocab_coverage_monotone_and_bounded(spark):
    import __spark_entry__ as E

    rows = {r["top_n"]: r.asDict()
            for r in E.queries()["vocab_coverage"](
                spark, "/root/testdata/sf0.001").collect()}
    assert set(rows) == {10, 100, 1000}
    assert rows[10]["covered_bp"] <= rows[100]["covered_bp"] \
        <= rows[1000]["covered_bp"] <= 10000
    assert rows[10]["covered_cf"] > 0
    # all three rows agree on vocab_size
    assert len({r["vocab_size"] for r in rows.values()}) == 1


def test_vocab_coverage_full_vocab_is_total_mass(spark):
    import __spark_entry__ as E

    rows = {r["top_n"]: r.asDict()
            for r in E.queries()["vocab_coverage"](
                spark, "/root/testdata/sf0.001").collect()}
    # fixture vocab < 1000 terms -> top-1000 covers everything exactly
    if rows[1000]["vocab_size"] <= 1000:
        assert rows[1000]["covered_bp"] == 10000
