"""Unit tests for round-4 batch: market-basket pair lift and RFM
customer segmentation."""

from __future__ import annotations

import datetime as dt
import os

from ocr_spark.queries import QUERIES


class TestBasketPairLift:
    def _write(self, spark, tmp_path, baskets):
        d = str(tmp_path)
        rows = []
        for o, parts in baskets.items():
            for i, p in enumerate(parts):
                rows.append((o, p, 1, i + 1, 1.0, 10.0, 0.0, 0.0, "N",
                             "O", dt.datetime(2024, 1, 1)))
        spark.createDataFrame(
            rows, ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
                   "l_quantity", "l_extendedprice", "l_discount", "l_tax",
                   "l_returnflag", "l_linestatus", "l_shipdate"]
        ).write.parquet(os.path.join(d, "lineitem.parquet"))
        return d

    def test_support_confidence_lift(self, spark, tmp_path):
        # parts 1,2 co-occur in 3 of 4 orders; part 3 rides along once
        baskets = {10: [1, 2], 11: [1, 2], 12: [1, 2, 3], 13: [3]}
        d = self._write(spark, tmp_path, baskets)
        out = {(r["part_a"], r["part_b"]): r.asDict()
               for r in QUERIES["basket_pair_lift"](spark, d).collect()}
        # only (1,2) clears min support 3
        assert set(out) == {(1, 2)}
        r = out[(1, 2)]
        assert r["n_ab"] == 3 and r["n_a"] == 3 and r["n_b"] == 3
        # lift = 3*4/(3*3) = 1.3333 -> 13333 bp
        assert r["lift_bp"] == 13333
        assert r["conf_ab_bp"] == 10000

    def test_duplicate_lines_counted_once(self, spark, tmp_path):
        # the same part on two lines of one order must not inflate
        baskets = {10: [1, 2, 2], 11: [1, 2], 12: [1, 2]}
        d = self._write(spark, tmp_path, baskets)
        out = QUERIES["basket_pair_lift"](spark, d).collect()
        assert len(out) == 1
        assert out[0]["n_ab"] == 3 and out[0]["n_b"] == 3


class TestRfmSegments:
    def test_scores_and_segments(self, spark, tmp_path):
        d = str(tmp_path)
        # 5 customers, one per quintile by construction: customer k has
        # k orders of 100 each, last order on day k -> recency ranks
        # reverse frequency ranks.
        rows = []
        okey = 0
        for ck in range(1, 6):
            for j in range(ck):
                rows.append((okey, ck, "O", 100.0,
                             dt.datetime(2024, 1, ck), "1-URGENT"))
                okey += 1
        spark.createDataFrame(
            rows, ["o_orderkey", "o_custkey", "o_orderstatus",
                   "o_totalprice", "o_orderdate", "o_orderpriority"]
        ).write.parquet(os.path.join(d, "orders.parquet"))
        out = {r["custkey"]: r.asDict()
               for r in QUERIES["rfm_segments"](spark, d).collect()}
        # customer 5: most recent (recency 0), most orders, most revenue
        assert out[5]["recency_days"] == 0
        assert out[5]["r_score"] == 5 and out[5]["f_score"] == 5
        assert out[5]["m_score"] == 5
        assert out[5]["segment"] == "champion"
        # customer 1: stale and rare -> hibernating
        assert out[1]["recency_days"] == 4
        assert out[1]["r_score"] == 1 and out[1]["f_score"] == 1
        assert out[1]["segment"] == "hibernating"
        # middle customer is regular
        assert out[3]["segment"] == "regular"
