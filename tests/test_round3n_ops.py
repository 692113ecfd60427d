"""Edge-case tests for the round-3n operator batch: bot gap-regularity
detection and cross-crawl IDF rank drift."""

from __future__ import annotations

import __spark_entry__ as E

SF = "/root/testdata/sf0.001"


def test_bot_gap_regularity_flags_synthetic_bots_only(spark):
    rows = {r["user_id"]: r.asDict() for r in
            E.queries()["bot_gap_regularity"](spark, SF).collect()}
    bots = [u for u, r in rows.items() if r["is_bot"] == 1]
    organics = [u for u, r in rows.items() if r["is_bot"] == 0]
    assert bots and organics
    # the planted metronomes (user_id % 7 == 0) all flag with cv2 == 0
    for u in bots:
        assert u % 7 == 0
        assert rows[u]["cv2_bp"] == 0
    # every user_id % 7 == 0 with enough gaps IS flagged
    for u, r in rows.items():
        if u % 7 == 0:
            assert r["is_bot"] == 1


def test_bot_gap_cv2_nonnegative_everywhere(spark):
    for r in E.queries()["bot_gap_regularity"](spark, SF).collect():
        assert r["cv2_bp"] >= 0
        assert r["n_gaps"] >= 3
        assert r["sum_gap_micros"] > 0


def test_idf_drift_shape_and_thresholds(spark):
    rows = E.queries()["idf_drift"](spark, SF).collect()
    assert 0 < len(rows) <= 20
    drifts = [r["drift"] for r in rows]
    assert drifts == sorted(drifts, reverse=True)
    for r in rows:
        assert r["df_a"] >= 5 and r["df_b"] >= 5
        assert r["drift"] == abs(r["rank_a"] - r["rank_b"])
