"""Edge-case tests for the round-3c operator batch: salting skew audit
(hot-key defusal, degenerate single-key corpora) and link-graph degree /
reciprocity stats (sinks, mutual edges, link-farm shapes) — properties
the oracle parity harness can't express.
"""

from __future__ import annotations

from ocr_spark.functions.curation import salt_skew_audit
from ocr_spark.functions.graph import degree_stats


def _skew(spark, rows, **kw):
    df = spark.createDataFrame(rows, ["doc_id", "host"])
    out = salt_skew_audit(df, "host", "doc_id", **kw)
    return {r["strategy"]: r.asDict() for r in out.collect()}


def test_salt_audit_single_hot_key_defused(spark):
    # every row on one host: plain puts ALL rows in one bucket
    rows = [(i, "mega.example") for i in range(256)]
    out = _skew(spark, rows, n_buckets=16, n_salts=8)
    p, s = out["plain"], out["salted"]
    assert p["n_buckets_used"] == 1
    assert p["max_bucket_n"] == 256
    assert p["skew_bp"] == 16 * 10000  # one bucket holds 100%
    # 8 salt lanes split the hot key across >1 bucket and cut the max
    assert s["n_buckets_used"] > 1
    assert s["max_bucket_n"] < 256
    assert s["skew_bp"] < p["skew_bp"]


def test_salt_audit_mass_conserved_and_bounds(spark):
    rows = [(i, f"h{i % 5}.example") for i in range(100)]
    df = spark.createDataFrame(rows, ["doc_id", "host"])
    out = {r["strategy"]: r.asDict()
           for r in salt_skew_audit(df, "host", "doc_id",
                                    n_buckets=16, n_salts=8).collect()}
    for r in out.values():
        assert 1 <= r["n_buckets_used"] <= 16
        assert r["min_bucket_n"] >= 1
        assert r["max_bucket_n"] <= 100
        # max share >= uniform share, by definition of max
        assert r["skew_bp"] >= 10000 * 16 // 16


def test_salt_audit_plan_stays_jvm_side(spark):
    df = spark.createDataFrame([(1, "a.example")], ["doc_id", "host"])
    plan = (salt_skew_audit(df, "host", "doc_id")
            ._jdf.queryExecution().executedPlan().toString())
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


def _deg(spark, edges):
    df = spark.createDataFrame(edges, ["src", "dst"])
    return {r["node"]: r.asDict() for r in degree_stats(df).collect()}


def test_degree_stats_hand_graph(spark):
    # a<->b mutual, a->c one-way; c is a pure sink
    out = _deg(spark, [(1, 2), (2, 1), (1, 3)])
    a, b, c = out[1], out[2], out[3]
    assert (a["out_deg"], a["in_deg"], a["n_reciprocal"]) == (2, 1, 1)
    assert a["reciprocity_bp"] == 5000
    assert (b["out_deg"], b["in_deg"], b["n_reciprocal"]) == (1, 1, 1)
    assert b["reciprocity_bp"] == 10000
    assert (c["out_deg"], c["in_deg"], c["n_reciprocal"]) == (0, 1, 0)
    assert c["reciprocity_bp"] == 0


def test_degree_stats_link_farm_shape(spark):
    # farm node 0 points at 5 targets; none point back
    out = _deg(spark, [(0, t) for t in range(1, 6)])
    farm = out[0]
    assert farm["out_deg"] == 5
    assert farm["n_reciprocal"] == 0
    assert farm["reciprocity_bp"] == 0
    # all targets are sinks that appear via the dst side of the node union
    assert all(out[t]["in_deg"] == 1 for t in range(1, 6))


def test_degree_stats_all_mutual(spark):
    out = _deg(spark, [(1, 2), (2, 1), (2, 3), (3, 2)])
    assert all(r["reciprocity_bp"] == 10000 for r in out.values())

from datetime import datetime

from ocr_spark.functions.curation import digit_hist_quantiles
from ocr_spark.functions.temporal import event_transitions


def _dq(spark, values, quantiles=(50, 90, 99)):
    df = spark.createDataFrame([(v,) for v in values], ["v"])
    out = digit_hist_quantiles(df, "v", quantiles)
    return {r["quantile_pct"]: r.asDict() for r in out.collect()}


def test_digit_hist_quantiles_hand_distribution(spark):
    # 50x 1-digit, 40x 2-digit, 9x 3-digit, 1x 4-digit -> cum 50/90/99/100
    vals = [5] * 50 + [50] * 40 + [500] * 9 + [5000]
    out = _dq(spark, vals)
    assert out[50]["bucket_digits"] == 1 and out[50]["bucket_ub"] == 9
    assert out[50]["n_le"] == 50
    assert out[90]["bucket_digits"] == 2 and out[90]["bucket_ub"] == 99
    assert out[90]["n_le"] == 90
    assert out[99]["bucket_digits"] == 3 and out[99]["bucket_ub"] == 999
    assert out[99]["n_le"] == 99


def test_digit_hist_quantiles_filters_negatives_and_nulls(spark):
    df = spark.createDataFrame(
        [(7,), (-3,), (None,), (8,)], "v bigint")
    out = {r["quantile_pct"]: r.asDict()
           for r in digit_hist_quantiles(df, "v", (99,)).collect()}
    # only the two non-negative rows count
    assert out[99]["n_le"] == 2 and out[99]["bucket_digits"] == 1


def test_digit_hist_quantiles_19_digit_ub_is_null(spark):
    # int64 max has 19 digits; 10^19-1 overflows, so ub must be NULL
    out = _dq(spark, [9223372036854775807], quantiles=(50,))
    assert out[50]["bucket_digits"] == 19
    assert out[50]["bucket_ub"] is None


def _trans(spark, rows):
    df = spark.createDataFrame(
        rows, ["user_id", "ts", "event_type", "event_id"])
    out = event_transitions(df, "user_id", "ts", "event_type", "event_id")
    return {(r["prev_type"], r["next_type"]): r.asDict()
            for r in out.collect()}


def test_event_transitions_hand_counts_and_lift(spark):
    t = datetime(2026, 1, 1)
    # user 1: A B A B  -> A->B x2, B->A x1 ; user 2: A B -> A->B x1
    rows = [(1, t.replace(hour=h), e, h)
            for h, e in enumerate(["A", "B", "A", "B"])]
    rows += [(2, t.replace(hour=h), e, 10 + h)
             for h, e in enumerate(["A", "B"])]
    out = _trans(spark, rows)
    ab, ba = out[("A", "B")], out[("B", "A")]
    assert ab["n"] == 3 and ba["n"] == 1
    # total=4, row_m(A)=3, col_m(B)=3 -> 3*4*10000 // 9 = 13333
    assert ab["lift_bp"] == 13333
    # row_m(B)=1, col_m(A)=1 -> 1*4*10000 // 1 = 40000
    assert ba["lift_bp"] == 40000


def test_event_transitions_tiebreak_is_deterministic(spark):
    # same-instant events: order must come from event_id, not input order
    t = datetime(2026, 1, 1)
    rows = [(1, t, "B", 2), (1, t, "A", 1), (1, t, "C", 3)]
    out = _trans(spark, rows)
    assert set(out) == {("A", "B"), ("B", "C")}


def test_event_transitions_single_event_users_drop_out(spark):
    t = datetime(2026, 1, 1)
    out = _trans(spark, [(1, t, "A", 1), (2, t, "B", 2)])
    assert out == {}
