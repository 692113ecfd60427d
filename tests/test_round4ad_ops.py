"""Unit tests for round-4 batch: capture-recapture estimation,
difference-in-differences, peer percentile ranks."""

from __future__ import annotations

import datetime as dt
import os

from ocr_spark.queries import QUERIES


class TestCaptureRecapture:
    def test_exact_recovery(self, spark, tmp_path):
        d = str(tmp_path)
        spark.createDataFrame(
            [(i, f"b{i}") for i in range(60)], ["doc_id", "text"]
        ).write.parquet(os.path.join(d, "documents.parquet"))
        out = QUERIES["capture_recapture"](spark, d).collect()[0]
        # ids 0..59: evens 30, thirds 20, sixths 10
        assert out["n1"] == 30 and out["n2"] == 20
        assert out["overlap"] == 10
        # independent residue samples recover the truth exactly
        assert out["lp_estimate"] == 60 == out["true_n"]
        # Chapman: 31*21//11 - 1 = 58
        assert out["chapman_estimate"] == 58


class TestDiffInDiff:
    def test_planted_effect(self, spark, tmp_path):
        d = str(tmp_path)
        rows, eid = [], 0

        def burst(user, day, n):
            nonlocal eid
            for _ in range(n):
                rows.append((eid, dt.datetime(2024, 1, day, 12), user,
                             "a", 1.0, "{}"))
                eid += 1

        # control (user 1): 10/day pre (days 1,2), 12/day post (16,17)
        for day in (1, 2):
            burst(1, day, 10)
        for day in (16, 17):
            burst(1, day, 12)
        # treat (user 2): 10/day pre, 20/day post -> DiD = +8/day
        for day in (1, 2):
            burst(2, day, 10)
        for day in (16, 17):
            burst(2, day, 20)
        spark.createDataFrame(
            rows, ["event_id", "ts", "user_id", "event_type", "value",
                   "props"]
        ).write.parquet(os.path.join(d, "events.parquet"))
        out = QUERIES["diff_in_diff"](spark, d).collect()[0]
        assert out["treat_pre_bp"] == 100000
        assert out["treat_post_bp"] == 200000
        assert out["control_pre_bp"] == 100000
        assert out["control_post_bp"] == 120000
        # (200000-100000) - (120000-100000) = +80000 bp = +8/day
        assert out["did_bp"] == 80000


class TestPeerPercentile:
    def test_endpoints_and_ties(self, spark, tmp_path):
        d = str(tmp_path)
        rows = []
        for i, (prio, price) in enumerate(
                [("A", 10.0), ("A", 20.0), ("A", 30.0), ("A", 20.0),
                 ("B", 99.0)]):
            rows.append((i, 1, "O", price, "1996-01-02", prio, "c", 0,
                         "x"))
        spark.createDataFrame(
            rows, ["o_orderkey", "o_custkey", "o_orderstatus",
                   "o_totalprice", "o_orderdate", "o_orderpriority",
                   "o_clerk", "o_shippriority", "o_comment"]
        ).write.parquet(os.path.join(d, "orders.parquet"))
        out = {r["o_orderkey"]: r.asDict()
               for r in QUERIES["peer_percentile"](spark, d).collect()}
        # A: sorted (1000,o0) (2000,o1) (2000,o3) (3000,o2)
        assert out[0]["pct_bp"] == 0
        assert out[1]["pct_bp"] == 3333
        assert out[3]["pct_bp"] == 6666
        assert out[2]["pct_bp"] == 10000
        # singleton group: rank 1 of 1 -> 0 via the n-1 guard
        assert out[4]["pct_bp"] == 0
