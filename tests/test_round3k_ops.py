"""Edge-case tests for the round-3k operator batch: JL projection with
distortion eval and the training-mix waterfilling solver."""

from __future__ import annotations

from ocr_spark.functions.curation import mix_solver
from ocr_spark.functions.similarity import jl_distortion, jl_project

SF = "/root/testdata/sf0.001"


def test_jl_project_shape_and_determinism(spark):
    vecs = [(i, [float(j + i) for j in range(8)]) for i in range(6)]
    df = spark.createDataFrame(vecs, ["vec_id", "emb"])
    a = {r["nid"]: r["proj"] for r in
         jl_project(df, "vec_id", "emb", out_dim=4).collect()}
    b = {r["nid"]: r["proj"] for r in
         jl_project(df.repartition(5), "vec_id", "emb",
                    out_dim=4).collect()}
    assert a == b  # partition-invariant
    assert all(len(v) == 4 for v in a.values())


def test_jl_projection_is_linear(spark):
    # proj(2x) == 2*proj(x) — exact integers make this an identity
    df = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0, 4.0]), (1, [2.0, 4.0, 6.0, 8.0])],
        ["vec_id", "emb"])
    out = {r["nid"]: r["proj"] for r in
           jl_project(df, "vec_id", "emb", out_dim=4).collect()}
    assert [2 * v for v in out[0]] == list(out[1])


def test_jl_distortion_concentrates_near_expectation(spark):
    import __spark_entry__ as E

    rows = E.queries()["jl_distortion"](spark, SF).collect()
    assert len(rows) == 50
    ratios = [r["ratio_bp"] for r in rows]
    # every pair within 4x of the JL expectation; median well inside
    assert all(1500 <= x <= 40000 for x in ratios)
    mid = sorted(ratios)[len(ratios) // 2]
    assert 5000 <= mid <= 20000


def test_mix_solver_budget_and_caps(spark):
    rows = [("tiny", 10), ("small", 50), ("big", 10000)]
    df = spark.createDataFrame(rows, ["src", "avail"])
    out = {r["src"]: r.asDict() for r in
           mix_solver(df, "src", "avail", budget=300).collect()}
    assert out["tiny"]["alloc"] == 10 and out["tiny"]["capped"] == 1
    assert out["small"]["alloc"] == 50 and out["small"]["capped"] == 1
    # big absorbs the redistributed remainder, never exceeding budget
    total = sum(r["alloc"] for r in out.values())
    assert total <= 300
    assert out["big"]["alloc"] >= 200  # 100 equal share + redistributions


def test_mix_solver_abundant_budget_caps_everyone(spark):
    rows = [("a", 5), ("b", 7)]
    df = spark.createDataFrame(rows, ["src", "avail"])
    out = {r["src"]: r.asDict() for r in
           mix_solver(df, "src", "avail", budget=1000).collect()}
    assert out["a"]["alloc"] == 5 and out["b"]["alloc"] == 7
    assert all(r["capped"] == 1 for r in out.values())


def test_mix_solver_never_exceeds_avail_or_budget(spark):
    import __spark_entry__ as E

    rows = E.queries()["mix_solver"](spark, SF).collect()
    assert rows
    assert sum(r["alloc"] for r in rows) <= 2000
    for r in rows:
        assert 0 <= r["alloc"] <= r["avail"]
