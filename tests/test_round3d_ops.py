"""Edge-case tests for the round-3d operator batch: integer HITS
(hub/authority separation, zero-mass graphs, normalization exactness)
and the two-stage exact Pareto front (dominance semantics, equal points,
lossless bucket prune) — properties the oracle harness can't express.
"""

from __future__ import annotations

from ocr_spark.functions.curation import pareto_front
from ocr_spark.functions.graph import hits_scores

SCALE = 10**6


def _hits(spark, edges, **kw):
    df = spark.createDataFrame(edges, ["src", "dst"])
    return {r["node"]: r.asDict() for r in hits_scores(df, **kw).collect()}


def test_hits_two_hubs_one_authority(spark):
    # 1->3, 2->3: node 3 takes ALL authority, hubs split hub mass evenly
    out = _hits(spark, [(1, 3), (2, 3)])
    assert out[3]["auth"] == SCALE and out[3]["hub"] == 0
    assert out[1]["hub"] == out[2]["hub"] == SCALE // 2
    assert out[1]["auth"] == out[2]["auth"] == 0


def test_hits_symmetric_cycle(spark):
    # 1<->2: perfectly symmetric, both halves split evenly every iteration
    out = _hits(spark, [(1, 2), (2, 1)])
    for n in (1, 2):
        assert out[n]["hub"] == SCALE // 2
        assert out[n]["auth"] == SCALE // 2


def test_hits_link_farm_is_hub_not_authority(spark):
    # farm 0 points at 1..4 which all point at 9; 9 is the authority,
    # farm keeps hub mass but earns zero authority
    edges = [(0, t) for t in range(1, 5)] + [(t, 9) for t in range(1, 5)]
    out = _hits(spark, edges)
    assert out[0]["auth"] == 0
    assert out[9]["auth"] > out[0]["auth"]
    assert out[9]["hub"] == 0
    assert out[0]["hub"] > 0


def test_hits_mass_is_conserved_within_floor_error(spark):
    edges = [(a, b) for a in range(5) for b in range(5) if (a * 3 + b) % 4 == 1]
    out = _hits(spark, edges)
    n = len(out)
    assert SCALE - n <= sum(r["hub"] for r in out.values()) <= SCALE
    assert SCALE - n <= sum(r["auth"] for r in out.values()) <= SCALE


def _front(spark, rows, **kw):
    df = spark.createDataFrame(rows, ["id", "x", "y"])
    return {r["id"]: (r["x"], r["y"])
            for r in pareto_front(df, "id", "x", "y", **kw).collect()}


def test_pareto_hand_front(spark):
    # (3,1) and (1,3) non-dominated; (2,2) also non-dominated; (1,1) dominated
    rows = [(1, 3, 1), (2, 1, 3), (3, 2, 2), (4, 1, 1)]
    assert set(_front(spark, rows)) == {1, 2, 3}


def test_pareto_equal_points_both_kept(spark):
    rows = [(1, 5, 5), (2, 5, 5), (3, 4, 4)]
    assert set(_front(spark, rows)) == {1, 2}


def test_pareto_same_x_higher_y_dominates(spark):
    rows = [(1, 5, 5), (2, 5, 6)]
    assert set(_front(spark, rows)) == {2}


def test_pareto_single_point_and_total_order(spark):
    assert set(_front(spark, [(1, 1, 1)])) == {1}
    # strictly increasing in both axes -> only the max survives
    rows = [(i, i, i) for i in range(20)]
    assert set(_front(spark, rows)) == {19}


def test_pareto_prune_is_lossless_vs_bruteforce(spark):
    # deterministic scatter; compare against an in-Python brute force
    rows = [(i, (i * 37) % 101, (i * 53) % 97) for i in range(300)]
    expect = {
        i for i, x, y in rows
        if not any(
            (x2 >= x and y2 >= y and (x2 > x or y2 > y))
            for _, x2, y2 in rows)
    }
    for buckets in (1, 7, 64):
        assert set(_front(spark, rows, n_prune_buckets=buckets)) == expect
