"""Semantics + plan-shape tests for the TPC-H analog batch 2 (Q13, Q14,
Q15, Q17, Q19, Q22, Q11, Q2 analogs), on hand-built fixture tables.

Each test class writes only the tables its query reads, so the fixtures
stay independently readable and the expected numbers are derivable by
hand in the comments."""

from __future__ import annotations

import datetime
import os

from ocr_spark.queries import QUERIES

T = datetime.datetime

LI_COLS = ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
           "l_quantity", "l_extendedprice", "l_discount", "l_tax",
           "l_returnflag", "l_linestatus", "l_shipdate"]


def _li(rows):
    """lineitem rows from (orderkey, partkey, suppkey, qty, price,
    disc, shipdate) tuples."""
    return [(ok, pk, sk, i + 1, float(q), float(p), float(d), 0.0,
             "N", "O", ts) for i, (ok, pk, sk, q, p, d, ts)
            in enumerate(rows)]


def _write(spark, d, **tables):
    for name, (rows, cols) in tables.items():
        spark.createDataFrame(rows, cols).write.mode("overwrite").parquet(
            os.path.join(d, f"{name}.parquet"))


class TestCustomerOrderCounts:
    def test_on_clause_filter_keeps_zero_bucket(self, spark, tmp_path):
        d = str(tmp_path)
        _write(
            spark, d,
            customer=([(1, "c1", 0, 0.0, "A"), (2, "c2", 0, 0.0, "A"),
                       (3, "c3", 0, 0.0, "B"), (4, "c4", 0, 0.0, "B")],
                      ["c_custkey", "c_name", "c_nationkey", "c_acctbal",
                       "c_mktsegment"]),
            orders=([
                # c1: one urgent (filtered in ON) + one medium -> c_count 1
                (10, 1, "O", 1.0, T(1997, 1, 1), "1-URGENT"),
                (11, 1, "O", 1.0, T(1997, 1, 2), "3-MEDIUM"),
                # c2: urgent only -> survives the LEFT JOIN with c_count 0
                (12, 2, "O", 1.0, T(1997, 1, 3), "1-URGENT"),
                # c3: no orders at all -> c_count 0
                # c4: two non-urgent -> c_count 2
                (13, 4, "O", 1.0, T(1997, 1, 4), "2-HIGH"),
                (14, 4, "O", 1.0, T(1997, 1, 5), "5-LOW"),
            ], ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
                "o_orderdate", "o_orderpriority"]),
        )
        out = {r["c_count"]: r["custdist"]
               for r in QUERIES["customer_order_counts"](spark, d).collect()}
        assert out == {0: 2, 1: 1, 2: 1}


class TestPromoRevenueShare:
    def test_share_is_truncated_basis_points(self, spark, tmp_path):
        d = str(tmp_path)
        _write(
            spark, d,
            part=([(1, "p1", "Brand#12", "PROMO", 3, 1.0),
                   (2, "p2", "Brand#13", "STANDARD", 8, 1.0)],
                  ["p_partkey", "p_name", "p_brand", "p_type", "p_size",
                   "p_retailprice"]),
            lineitem=(_li([
                # 1997-01: promo 10.00, standard 30.00 -> 2500 bp
                (1, 1, 1, 1, 10.00, 0.0, T(1997, 1, 5)),
                (1, 2, 1, 1, 30.00, 0.0, T(1997, 1, 6)),
                # 1997-02: standard only -> 0 bp; discount exercises centbp
                (2, 2, 1, 1, 20.00, 0.10, T(1997, 2, 5)),
            ]), LI_COLS),
        )
        out = {r["ship_month"]: r.asDict()
               for r in QUERIES["promo_revenue_share"](spark, d).collect()}
        assert out["1997-01"]["promo_centbp"] == 1000 * 10000
        assert out["1997-01"]["total_centbp"] == 4000 * 10000
        assert out["1997-01"]["promo_share_bp"] == 2500
        assert out["1997-02"]["promo_centbp"] == 0
        assert out["1997-02"]["total_centbp"] == 2000 * 9000
        assert out["1997-02"]["promo_share_bp"] == 0


class TestTopRevenueSuppliers:
    def test_ties_all_returned_window_filter_applies(self, spark, tmp_path):
        d = str(tmp_path)
        _write(
            spark, d,
            supplier=([(10, "S10", 0, 0.0), (11, "S11", 0, 0.0),
                       (12, "S12", 0, 0.0)],
                      ["s_suppkey", "s_name", "s_nationkey", "s_acctbal"]),
            lineitem=(_li([
                # in-window: s10 and s11 tie at 40.00 -> both rows returned
                (1, 1, 10, 1, 40.00, 0.0, T(1997, 2, 1)),
                (2, 1, 11, 1, 25.00, 0.0, T(1997, 2, 2)),
                (3, 1, 11, 1, 15.00, 0.0, T(1997, 3, 3)),
                # s12's 99.00 ships outside the quarter -> excluded
                (4, 1, 12, 1, 99.00, 0.0, T(1997, 6, 1)),
            ]), LI_COLS),
        )
        out = {r["s_suppkey"]: r["total_rev_centbp"]
               for r in QUERIES["top_revenue_suppliers"](spark, d).collect()}
        assert out == {10: 4000 * 10000, 11: 4000 * 10000}


class TestSmallQtyRevenue:
    def test_strictly_below_one_fifth_of_avg(self, spark, tmp_path):
        d = str(tmp_path)
        _write(
            spark, d,
            part=([(1, "p1", "Brand#12", "STANDARD", 3, 1.0),
                   (5, "p5", "Brand#12", "STANDARD", 5, 1.0),
                   (9, "p9", "Brand#99", "STANDARD", 3, 1.0)],
                  ["p_partkey", "p_name", "p_brand", "p_type", "p_size",
                   "p_retailprice"]),
            lineitem=(_li([
                # p1: qtys 1,10,14,15 -> sum 40, cnt 4, avg 10; only the
                # qty-1 line is < 2.0 (1*5*4=20 < 40) -> revenue 7.50
                (1, 1, 1, 1, 7.50, 0.0, T(1997, 1, 1)),
                (1, 1, 1, 10, 5.00, 0.0, T(1997, 1, 1)),
                (1, 1, 1, 14, 5.00, 0.0, T(1997, 1, 1)),
                (1, 1, 1, 15, 5.00, 0.0, T(1997, 1, 1)),
                # p5: qtys 2,10,14,14 -> avg 10; the qty-2 line sits AT the
                # 0.2*avg boundary (2*5*4=40 = 40) and must be excluded
                (2, 5, 1, 2, 9.00, 0.0, T(1997, 1, 1)),
                (2, 5, 1, 10, 5.00, 0.0, T(1997, 1, 1)),
                (2, 5, 1, 14, 5.00, 0.0, T(1997, 1, 1)),
                (2, 5, 1, 14, 5.00, 0.0, T(1997, 1, 1)),
                # p9: tiny qty but wrong brand -> dim filter drops it
                (3, 9, 1, 1, 5.00, 0.0, T(1997, 1, 1)),
            ]), LI_COLS),
        )
        row = QUERIES["small_qty_revenue"](spark, d).collect()[0]
        assert row["n_lines"] == 1
        assert row["revenue_cents"] == 750


class TestDisjunctFilterRevenue:
    def test_no_cross_term_matches(self, spark, tmp_path):
        d = str(tmp_path)
        _write(
            spark, d,
            part=([(1, "p1", "Brand#12", "STANDARD", 3, 1.0),
                   (2, "p2", "Brand#13", "STANDARD", 8, 1.0),
                   (3, "p3", "Brand#15", "STANDARD", 12, 1.0)],
                  ["p_partkey", "p_name", "p_brand", "p_type", "p_size",
                   "p_retailprice"]),
            lineitem=(_li([
                (1, 1, 1, 5, 10.00, 0.0, T(1997, 1, 1)),   # disjunct 1 ok
                # Brand#12 with qty 25: qty fits disjunct 3, brand fits
                # disjunct 1 -> no single conjunct satisfied -> excluded
                (2, 1, 1, 25, 99.00, 0.0, T(1997, 1, 1)),
                (3, 2, 1, 15, 20.00, 0.0, T(1997, 1, 1)),  # disjunct 2 ok
                (4, 3, 1, 25, 30.00, 0.0, T(1997, 1, 1)),  # disjunct 3 ok
                # Brand#15 size 12 but qty 5 -> excluded
                (5, 3, 1, 5, 99.00, 0.0, T(1997, 1, 1)),
            ]), LI_COLS),
        )
        row = QUERIES["disjunct_filter_revenue"](spark, d).collect()[0]
        assert row["n_lines"] == 3
        assert row["revenue_centbp"] == (1000 + 2000 + 3000) * 10000


class TestIdleRichCustomers:
    def test_above_avg_and_no_urgent_orders(self, spark, tmp_path):
        d = str(tmp_path)
        _write(
            spark, d,
            customer=([
                # positive balances: 100.00, 100.00, 10.00 -> avg 70.00
                (1, "c1", 0, 100.00, "A"),   # above avg, has urgent -> out
                (2, "c2", 0, 100.00, "A"),   # above avg, no urgent -> in
                (3, "c3", 0, 10.00, "B"),    # below avg -> out
                (4, "c4", 0, -5.00, "B"),    # negative: not in avg, not rich
            ], ["c_custkey", "c_name", "c_nationkey", "c_acctbal",
                "c_mktsegment"]),
            orders=([
                (10, 1, "O", 1.0, T(1997, 1, 1), "1-URGENT"),
                (11, 2, "O", 1.0, T(1997, 1, 2), "3-MEDIUM"),
                (12, 3, "O", 1.0, T(1997, 1, 3), "2-HIGH"),
            ], ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
                "o_orderdate", "o_orderpriority"]),
        )
        out = [r.asDict()
               for r in QUERIES["idle_rich_customers"](spark, d).collect()]
        assert out == [{"c_mktsegment": "A", "n_customers": 1,
                        "total_acctbal_cents": 10000}]


class TestPartValueShare:
    def test_exact_boundary_excluded(self, spark, tmp_path):
        # values 300,300,400,600 cents -> total 1600, mean 400; part 4
        # sits exactly at 1.5x the mean and must NOT be selected
        d = str(tmp_path)
        _write(spark, d, lineitem=(_li([
            (1, 1, 1, 1, 3.00, 0.0, T(1997, 1, 1)),
            (1, 2, 1, 1, 3.00, 0.0, T(1997, 1, 1)),
            (1, 3, 1, 1, 4.00, 0.0, T(1997, 1, 1)),
            (1, 4, 1, 1, 6.00, 0.0, T(1997, 1, 1)),
        ]), LI_COLS))
        assert QUERIES["part_value_share"](spark, d).collect() == []

    def test_above_boundary_selected_with_truncated_share(
            self, spark, tmp_path):
        # values 300,300,400,601 -> total 1601; 2*601*4=4808 > 3*1601=4803
        d = str(tmp_path)
        _write(spark, d, lineitem=(_li([
            (1, 1, 1, 1, 3.00, 0.0, T(1997, 1, 1)),
            (1, 2, 1, 1, 3.00, 0.0, T(1997, 1, 1)),
            (1, 3, 1, 1, 4.00, 0.0, T(1997, 1, 1)),
            (1, 4, 1, 1, 6.01, 0.0, T(1997, 1, 1)),
        ]), LI_COLS))
        out = QUERIES["part_value_share"](spark, d).collect()
        assert len(out) == 1
        assert out[0]["p_partkey"] == 4
        assert out[0]["value_cents"] == 601
        assert out[0]["share_cbp"] == 601 * 100000 // 1601


class TestMinCostSupplier:
    def test_tie_breaks_to_lower_suppkey(self, spark, tmp_path):
        d = str(tmp_path)
        _write(
            spark, d,
            part=([(4, "p4", "Brand#12", "STANDARD", 4, 1.0),
                   (6, "p6", "Brand#13", "STANDARD", 5, 1.0),
                   (3, "p3", "Brand#15", "STANDARD", 12, 1.0),
                   (7, "p7", "Brand#15", "PROMO", 4, 1.0)],
                  ["p_partkey", "p_name", "p_brand", "p_type", "p_size",
                   "p_retailprice"]),
            supplier=([(10, "S10", 0, 0.0), (11, "S11", 1, 0.0),
                       (12, "S12", 2, 0.0)],
                      ["s_suppkey", "s_name", "s_nationkey", "s_acctbal"]),
            nation=([(0, "N0", 0), (1, "N1", 0), (2, "N2", 0)],
                    ["n_nationkey", "n_name", "n_regionkey"]),
            lineitem=(_li([
                # p4: s10 and s11 tie at 5.00 -> s10 (lower key) wins
                (1, 4, 10, 1, 5.00, 0.0, T(1997, 1, 1)),
                (2, 4, 11, 1, 5.00, 0.0, T(1997, 1, 1)),
                (3, 4, 12, 1, 7.00, 0.0, T(1997, 1, 1)),
                # p6: single supplier
                (4, 6, 12, 1, 3.00, 0.0, T(1997, 1, 1)),
                # p3 (size 12) and p7 (PROMO) fail the dim filter
                (5, 3, 10, 1, 1.00, 0.0, T(1997, 1, 1)),
                (6, 7, 10, 1, 1.00, 0.0, T(1997, 1, 1)),
            ]), LI_COLS),
        )
        out = {r["p_partkey"]: r.asDict()
               for r in QUERIES["min_cost_supplier"](spark, d).collect()}
        assert set(out) == {4, 6}
        assert out[4]["s_name"] == "S10"
        assert out[4]["n_name"] == "N0"
        assert out[4]["cost_cents"] == 500
        assert out[6]["s_name"] == "S12"
        assert out[6]["cost_cents"] == 300


class TestPlanShapes:
    """Pin the load-bearing plan claims in the docstrings."""

    SF = "/root/testdata/sf0.001"

    def _fmt(self, spark, df):
        return df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted"))

    def test_q13_outer_join_survives_on_clause_filter(self, spark):
        df = QUERIES["customer_order_counts"](spark, self.SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "LeftOuter" in plan
        # the ON-clause predicate reaches the orders scan, not the join
        assert ("Not(StringStartsWith(o_orderpriority,1-))"
                in self._fmt(spark, df))

    def test_q19_per_side_disjunctive_residuals_pushed(self, spark):
        fmt = self._fmt(
            spark, QUERIES["disjunct_filter_revenue"](spark, self.SF))
        # Catalyst extracts the per-side OR residuals from the cross-table
        # disjunction and pushes BOTH below the join
        assert "Or(Or(And(GreaterThanOrEqual(l_quantity,1.0)" in fmt
        assert "Or(Or(And(EqualTo(p_brand,Brand#12)" in fmt

    def test_q2_argmin_uses_no_window(self, spark):
        df = QUERIES["min_cost_supplier"](spark, self.SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in plan
        assert "BroadcastHashJoin" in plan

    def test_q22_anti_join_with_pushed_priority_filter(self, spark):
        df = QUERIES["idle_rich_customers"](spark, self.SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "LeftAnti" in plan
        assert ("StringStartsWith(o_orderpriority,1-)"
                in self._fmt(spark, df))

    def test_q15_single_fact_scan_after_checkpoint(self, spark):
        df = QUERIES["top_revenue_suppliers"](spark, self.SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        # per_supp is localCheckpoint-ed: the final plan reads the
        # materialized RDD; the only parquet scan left is the supplier dim
        assert plan.count("Scan parquet") == 1
        assert "Window" not in plan
