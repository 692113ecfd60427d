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


from ocr_spark.functions.curation import winsorize
from ocr_spark.functions.similarity import power_iteration


def test_winsorize_hand_bounds_and_clamps(spark):
    # 100 values 1..100 in one group: p1 = 1, p99 = 99 (ceil rule);
    # one value (100) clamps high, none clamp low
    rows = [("a", v) for v in range(1, 101)]
    df = spark.createDataFrame(rows, ["k", "v"])
    out = winsorize(df, "k", "v", lo_pct=1, hi_pct=99).collect()[0]
    assert (out["p_lo"], out["p_hi"]) == (1, 99)
    assert (out["n_lo"], out["n_hi"]) == (0, 1)
    assert out["sum_raw"] == 5050
    assert out["sum_clamped"] == 5050 - 1  # 100 -> 99


def test_winsorize_outlier_is_contained(spark):
    rows = [("a", 10)] * 98 + [("a", 10**12), ("a", -10**12)]
    df = spark.createDataFrame(rows, ["k", "v"])
    out = winsorize(df, "k", "v").collect()[0]
    assert out["p_lo"] == -10**12  # ceil(1*100/100)=1st value IS the outlier
    assert out["p_hi"] == 10
    assert out["n_hi"] == 1
    assert out["sum_clamped"] == -10**12 + 99 * 10


def test_winsorize_groups_are_independent(spark):
    rows = [("a", v) for v in range(1, 101)] + [("b", 7)] * 10
    df = spark.createDataFrame(rows, ["k", "v"])
    out = {r["k"]: r.asDict() for r in winsorize(df, "k", "v").collect()}
    assert out["b"]["p_lo"] == out["b"]["p_hi"] == 7
    assert out["b"]["n_lo"] == out["b"]["n_hi"] == 0
    assert out["a"]["p_hi"] == 99


def test_power_iteration_finds_dominant_axis(spark):
    # vectors concentrated on axis 0 with deterministic small noise
    vecs = [[10.0 if j == 0 else ((i * 7 + j) % 5 - 2) * 0.01
             for j in range(8)] for i in range(50)]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], ["vec_id", "emb"])
    out = {r["pos"]: r["v"] for r in
           power_iteration(df, "vec_id", "emb", n_iters=3).collect()}
    assert abs(out[0]) == 10**6  # axis 0 carries the max component
    assert all(abs(out[j]) < 10**4 for j in range(1, 8))


def test_power_iteration_matches_numpy_direction(spark):
    import numpy as np

    rng_vals = [[((i * 13 + j * 29) % 17 - 8) / 8.0 + (0.5 if j < 2 else 0)
                 for j in range(6)] for i in range(80)]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(rng_vals)], ["vec_id", "emb"])
    out = {r["pos"]: r["v"] for r in
           power_iteration(df, "vec_id", "emb", n_iters=20).collect()}
    got = np.array([out[j] for j in range(6)], dtype=float)
    got /= np.linalg.norm(got)
    x = np.array(rng_vals)
    evals, evecs = np.linalg.eigh(x.T @ x)
    top = evecs[:, -1]
    # convergence is gap-limited ((l2/l1)^T); this fixture's gap is 0.79
    # so 20 rounds give ~4-nines alignment (12 rounds only ~0.9987)
    assert abs(float(got @ top)) > 0.999


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


SF = "/root/testdata/sf0.001"


def test_power_iteration_dot_step_reuses_base_partitioning(spark):
    """The per-round dot must be a BroadcastHashJoin of the dim-sized
    iterate onto the nid-partitioned persisted base, with groupBy(nid)
    reusing that partitioning: zero Exchange above the cached relation."""
    from pyspark.sql import functions as F

    base = (
        spark.range(100)
        .select(
            F.col("id").alias("nid"),
            F.posexplode(F.array(*[F.lit(float(i)) for i in range(8)]))
            .alias("pos", "x"),
        )
        .select("nid", "pos", F.col("x").cast("bigint").alias("q"))
        .repartition("nid")
        .persist()
    )
    try:
        base.count()
        v = base.groupBy("pos").agg(
            F.max("q").cast("bigint").alias("v"))  # non-literal iterate
        dot = (
            base.join(F.broadcast(v), "pos")
            .groupBy("nid")
            .agg(F.sum(F.col("q") * F.col("v")).alias("dot"))
        )
        above_cache = _plan(dot).split("InMemoryRelation")[0]
        assert "BroadcastHashJoin" in above_cache
        assert "Exchange hashpartitioning" not in above_cache
        assert "Exchange SinglePartition" not in above_cache
    finally:
        base.unpersist()


def test_winsorize_plan_one_data_sized_exchange(spark):
    """winsorize's only data-sized shuffle is the (key, value) histogram
    agg; everything downstream runs on the per-group value histogram."""
    import __spark_entry__ as E

    p = _plan(E.queries()["winsorize_events"](spark, SF))
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    # hist agg + window repartition + bounds agg + join + final agg —
    # all keyed on k after the first; no single-partition collapse
    assert p.count("Exchange SinglePartition") == 0
