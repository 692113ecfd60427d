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
