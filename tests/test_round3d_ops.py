"""Edge-case tests for the round-3d operator batch: the two-stage exact
Pareto front (dominance semantics, equal points, lossless bucket prune)
— properties the oracle harness can't express.
"""

from __future__ import annotations

from ocr_spark.functions.curation import pareto_front

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
