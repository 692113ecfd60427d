"""Semantics + plan-shape tests for TPC-H analog batch 3 (Q3, Q6, Q8,
Q9, Q12, Q16 analogs) on hand-built fixtures."""

from __future__ import annotations

import datetime
import os

from ocr_spark.queries import QUERIES

T = datetime.datetime

LI_COLS = ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
           "l_quantity", "l_extendedprice", "l_discount", "l_tax",
           "l_returnflag", "l_linestatus", "l_shipdate"]
O_COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
          "o_orderdate", "o_orderpriority"]


def _li(rows, status="O"):
    return [(ok, pk, sk, i + 1, float(q), float(p), float(d), 0.0,
             "N", status, ts) for i, (ok, pk, sk, q, p, d, ts)
            in enumerate(rows)]


def _write(spark, d, **tables):
    for name, (rows, cols) in tables.items():
        spark.createDataFrame(rows, cols).write.mode("overwrite").parquet(
            os.path.join(d, f"{name}.parquet"))


class TestUrgentUnshippedTopk:
    def test_only_post_cutoff_lines_counted(self, spark, tmp_path):
        d = str(tmp_path)
        _write(
            spark, d,
            customer=([(1, "c1", 0, 0.0, "BUILDING"),
                       (2, "c2", 0, 0.0, "MACHINERY")],
                      ["c_custkey", "c_name", "c_nationkey", "c_acctbal",
                       "c_mktsegment"]),
            orders=([(10, 1, "O", 1.0, T(1998, 1, 1), "1-URGENT"),
                     # order after the cutoff date -> excluded entirely
                     (11, 1, "O", 1.0, T(1998, 7, 1), "1-URGENT"),
                     # wrong segment -> excluded
                     (12, 2, "O", 1.0, T(1998, 1, 1), "1-URGENT")], O_COLS),
            lineitem=(_li([
                (10, 1, 1, 1, 50.00, 0.0, T(1998, 7, 1)),  # counted
                (10, 1, 1, 1, 30.00, 0.0, T(1998, 5, 1)),  # shipped early
                (11, 1, 1, 1, 99.00, 0.0, T(1998, 8, 1)),
                (12, 1, 1, 1, 99.00, 0.0, T(1998, 8, 1)),
            ]), LI_COLS),
        )
        out = QUERIES["urgent_unshipped_topk"](spark, d).collect()
        assert len(out) == 1
        assert out[0]["l_orderkey"] == 10
        assert out[0]["revenue_centbp"] == 5000 * 10000
        assert out[0]["order_date"] == "1998-01-01"


class TestForecastRevenue:
    def test_discount_and_qty_boundaries(self, spark, tmp_path):
        d = str(tmp_path)
        _write(spark, d, lineitem=(_li([
            (1, 1, 1, 10, 100.00, 0.02, T(1997, 3, 1)),  # in (bp=200)
            (2, 1, 1, 10, 100.00, 0.04, T(1997, 3, 1)),  # in (bp=400)
            (3, 1, 1, 10, 100.00, 0.01, T(1997, 3, 1)),  # disc below
            (4, 1, 1, 10, 100.00, 0.05, T(1997, 3, 1)),  # disc above
            (5, 1, 1, 24, 100.00, 0.03, T(1997, 3, 1)),  # qty not < 24
            (6, 1, 1, 10, 100.00, 0.03, T(1996, 3, 1)),  # wrong year
        ]), LI_COLS))
        row = QUERIES["forecast_revenue"](spark, d).collect()[0]
        assert row["n_lines"] == 2
        assert row["forecast_revenue_centbp"] == 10000 * 200 + 10000 * 400


class TestNationMarketShare:
    def test_share_only_over_region_customers(self, spark, tmp_path):
        d = str(tmp_path)
        _write(
            spark, d,
            region=([(0, "ASIA"), (1, "EUROPE")],
                    ["r_regionkey", "r_name"]),
            nation=([(0, "NATION_2", 0), (1, "OTHER", 0), (2, "EU_N", 1)],
                    ["n_nationkey", "n_name", "n_regionkey"]),
            customer=([(1, "c1", 0, 0.0, "A"),    # ASIA customer
                       (2, "c2", 2, 0.0, "A")],   # EUROPE customer
                      ["c_custkey", "c_name", "c_nationkey", "c_acctbal",
                       "c_mktsegment"]),
            supplier=([(10, "S10", 0, 0.0),   # NATION_2 supplier
                       (11, "S11", 1, 0.0)],  # OTHER supplier
                      ["s_suppkey", "s_name", "s_nationkey", "s_acctbal"]),
            orders=([(100, 1, "O", 1.0, T(1997, 5, 1), "1-URGENT"),
                     (101, 2, "O", 1.0, T(1997, 6, 1), "1-URGENT")],
                    O_COLS),
            lineitem=(_li([
                (100, 1, 10, 1, 30.00, 0.0, T(1997, 5, 2)),  # target nation
                (100, 1, 11, 1, 10.00, 0.0, T(1997, 5, 3)),  # other nation
                # EUROPE customer's order: excluded from the denominator
                (101, 1, 10, 1, 99.00, 0.0, T(1997, 6, 2)),
            ]), LI_COLS),
        )
        out = QUERIES["nation_market_share"](spark, d).collect()
        assert len(out) == 1
        r = out[0]
        assert r["o_year"] == 1997
        assert r["nation_centbp"] == 3000 * 10000
        assert r["total_centbp"] == 4000 * 10000
        assert r["share_bp"] == 7500


class TestPartProfitByNation:
    def test_negative_profit_kept_and_name_filtered(self, spark, tmp_path):
        d = str(tmp_path)
        _write(
            spark, d,
            part=([(1, "cold widget", "Brand#12", "PROMO", 3, 8.00),
                   (2, "large bolt", "Brand#13", "PROMO", 3, 1.00)],
                  ["p_partkey", "p_name", "p_brand", "p_type", "p_size",
                   "p_retailprice"]),
            supplier=([(10, "S10", 0, 0.0)],
                      ["s_suppkey", "s_name", "s_nationkey", "s_acctbal"]),
            nation=([(0, "N0", 0)], ["n_nationkey", "n_name", "n_regionkey"]),
            orders=([(100, 1, "O", 1.0, T(1997, 5, 1), "1-URGENT")], O_COLS),
            lineitem=(_li([
                # widget: rev 10.00, cost 2*8.00=16.00 -> profit -6.00
                (100, 1, 10, 2, 10.00, 0.0, T(1997, 5, 2)),
                # bolt matches nothing (name filter)
                (100, 2, 10, 1, 99.00, 0.0, T(1997, 5, 2)),
            ]), LI_COLS),
        )
        out = QUERIES["part_profit_by_nation"](spark, d).collect()
        assert len(out) == 1
        assert out[0]["n_name"] == "N0"
        assert out[0]["o_year"] == 1997
        assert out[0]["profit_centbp"] == (1000 - 2 * 800) * 10000
        assert out[0]["n_items"] == 1


class TestPriorityByLinestatus:
    def test_conditional_counts(self, spark, tmp_path):
        d = str(tmp_path)
        _write(
            spark, d,
            orders=([(1, 1, "O", 1.0, T(1997, 1, 1), "1-URGENT"),
                     (2, 1, "O", 1.0, T(1997, 1, 1), "2-HIGH"),
                     (3, 1, "O", 1.0, T(1997, 1, 1), "5-LOW")], O_COLS),
            lineitem=(
                _li([(1, 1, 1, 1, 1.0, 0.0, T(1997, 2, 1))], "O")
                + _li([(2, 1, 1, 1, 1.0, 0.0, T(1997, 2, 1)),
                       (3, 1, 1, 1, 1.0, 0.0, T(1997, 2, 1))], "F")
                # outside the ship-year window:
                + _li([(1, 1, 1, 1, 1.0, 0.0, T(1996, 2, 1))], "O"),
                LI_COLS),
        )
        out = {r["l_linestatus"]: r.asDict()
               for r in QUERIES["priority_by_linestatus"](spark, d).collect()}
        assert out["O"]["high_line_count"] == 1
        assert out["O"]["low_line_count"] == 0
        assert out["F"]["high_line_count"] == 1
        assert out["F"]["low_line_count"] == 1


class TestSupplierVariety:
    def test_denylist_and_distinct(self, spark, tmp_path):
        d = str(tmp_path)
        _write(
            spark, d,
            part=([(1, "p1", "Brand#13", "PROMO", 3, 1.0),
                   (2, "p2", "Brand#12", "PROMO", 3, 1.0),   # brand excluded
                   (3, "p3", "Brand#13", "PROMO", 20, 1.0)],  # size excluded
                  ["p_partkey", "p_name", "p_brand", "p_type", "p_size",
                   "p_retailprice"]),
            supplier=([(10, "S10", 0, 5000.0),
                       (11, "S11", 0, 100.0),    # denylisted (< 2000.00)
                       (12, "S12", 0, 2000.0)],  # exactly at: NOT < -> kept
                      ["s_suppkey", "s_name", "s_nationkey", "s_acctbal"]),
            lineitem=(_li([
                (1, 1, 10, 1, 1.0, 1.0, T(1997, 1, 1)),
                (2, 1, 10, 1, 1.0, 1.0, T(1997, 1, 1)),  # dup supplier
                (3, 1, 11, 1, 1.0, 1.0, T(1997, 1, 1)),  # denylisted
                (4, 1, 12, 1, 1.0, 1.0, T(1997, 1, 1)),
                (5, 2, 10, 1, 1.0, 1.0, T(1997, 1, 1)),
                (6, 3, 10, 1, 1.0, 1.0, T(1997, 1, 1)),
            ]), LI_COLS),
        )
        out = QUERIES["supplier_variety"](spark, d).collect()
        assert len(out) == 1
        assert out[0]["p_brand"] == "Brand#13"
        assert out[0]["supplier_cnt"] == 2  # s10 once despite 2 lines; s12


class TestPlanShapes:
    SF = "/root/testdata/sf0.001"

    def _fmt(self, spark, df):
        return df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted"))

    def test_q3_topk_is_take_ordered_not_sort(self, spark):
        df = QUERIES["urgent_unshipped_topk"](spark, self.SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan
        fmt = self._fmt(spark, df)
        assert "EqualTo(c_mktsegment,BUILDING)" in fmt
        assert "GreaterThan(l_shipdate" in fmt

    def test_q6_pure_scan_aggregate_no_join(self, spark):
        df = QUERIES["forecast_revenue"](spark, self.SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Join" not in plan
        fmt = self._fmt(spark, df)
        assert "LessThan(l_quantity,24.0)" in fmt
        assert "GreaterThanOrEqual(l_shipdate" in fmt

    def test_q8_three_broadcast_dims_one_shuffle_join(self, spark):
        df = QUERIES["nation_market_share"](spark, self.SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("BroadcastHashJoin") >= 3

    def test_q16_denylist_is_broadcast_anti(self, spark):
        df = QUERIES["supplier_variety"](spark, self.SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "LeftAnti" in plan
        assert "BroadcastHashJoin" in plan
