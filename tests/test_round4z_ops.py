"""Unit tests for round-4 batch: time-weighted average and Kendall rank
correlation."""

from __future__ import annotations

import datetime as dt
import os

from ocr_spark.queries import QUERIES


class TestTimeWeightedAvg:
    def test_holding_time_weights(self, spark, tmp_path):
        d = str(tmp_path)
        rows = [
            # user 1: value 10 held for 9 min, then 100 held for 1 min,
            # then a final sample (no holding interval)
            (0, dt.datetime(2024, 1, 1, 10, 0, 0), 1, "g", 10.0, "{}"),
            (1, dt.datetime(2024, 1, 1, 10, 9, 0), 1, "g", 100.0, "{}"),
            (2, dt.datetime(2024, 1, 1, 10, 10, 0), 1, "g", 7.0, "{}"),
            # user 2: single sample -> zero span, twa 0
            (3, dt.datetime(2024, 1, 1, 12, 0, 0), 2, "g", 5.0, "{}"),
        ]
        spark.createDataFrame(
            rows, ["event_id", "ts", "user_id", "event_type", "value",
                   "props"]
        ).write.parquet(os.path.join(d, "events.parquet"))
        out = {r["user_id"]: r.asDict()
               for r in QUERIES["time_weighted_avg"](spark, d).collect()}
        # user 1: (10*540 + 100*60) / 600 = 19 (exact)
        assert out[1]["n_samples"] == 3
        assert out[1]["span_us"] == 600 * 1000000
        assert out[1]["twa_us"] == 19 * 1000000
        # a plain average would say (10+100+7)/3 = 39 — wrong semantics
        assert out[2]["span_us"] == 0
        assert out[2]["twa_us"] == 0


class TestRankCorrelation:
    def _write(self, spark, tmp_path, nation_of, orders):
        d = str(tmp_path)
        spark.createDataFrame(
            [(ck, f"c{ck}", nk) for ck, nk in nation_of.items()],
            ["c_custkey", "c_name", "c_nationkey"]
        ).write.parquet(os.path.join(d, "customer.parquet"))
        spark.createDataFrame(
            [(i, ck, "O", price, "1996-01-02", "P", "c", 0, "x")
             for i, (ck, price) in enumerate(orders)],
            ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
             "o_orderdate", "o_orderpriority", "o_clerk",
             "o_shippriority", "o_comment"]
        ).write.parquet(os.path.join(d, "orders.parquet"))
        return d

    def test_perfect_agreement(self, spark, tmp_path):
        # nation 0: 3 orders of 100; nation 1: 2 of 50; nation 2: 1 of 10
        nation_of = {10: 0, 11: 1, 12: 2}
        orders = ([(10, 100.0)] * 3 + [(11, 50.0)] * 2 + [(12, 10.0)])
        d = self._write(spark, tmp_path, nation_of, orders)
        out = QUERIES["rank_correlation"](spark, d).collect()[0].asDict()
        assert out["n_pairs"] == 3
        assert out["concordant"] == 3 and out["discordant"] == 0
        assert out["tau_bp"] == 10000

    def test_disagreement_and_ties(self, spark, tmp_path):
        # nation 0: 1 order of 300 (high rev, low count);
        # nation 1: 3 orders of 10 (rev 30, high count) -> discordant;
        # nation 2: 1 order of 40 (ties nation 0 on count, out-earns
        # nation 1 with fewer orders -> discordant with 1)
        nation_of = {10: 0, 11: 1, 12: 2}
        orders = ([(10, 300.0)] + [(11, 10.0)] * 3 + [(12, 40.0)])
        d = self._write(spark, tmp_path, nation_of, orders)
        out = QUERIES["rank_correlation"](spark, d).collect()[0].asDict()
        # pairs: (0,1) discordant; (0,2) count-tied; (1,2) discordant
        assert out["discordant"] == 2
        assert out["tied"] == 1
        # both engines' integer division truncates toward zero on
        # negatives (-20000 div 3 = -6666), unlike Python's floor
        assert out["tau_bp"] == -6666
