"""Semantics tests for the Q21/Q20-analog relational shapes and the
streaming stateful dedup, on hand-built fixture tables."""

from __future__ import annotations

import datetime
import os

from ocr_spark.queries import QUERIES

TS = datetime.datetime(1997, 6, 1)


def _write_fixture(spark, d):
    li = spark.createDataFrame(
        [
            # order 1: two suppliers, only supp 10 returns -> counted
            (1, 100, 10, 1, 5.0, 10.0, 0.0, 0.0, "R", "F", TS),
            (1, 101, 11, 2, 5.0, 10.0, 0.0, 0.0, "N", "F", TS),
            # order 2: two suppliers BOTH return -> neither counted
            (2, 100, 10, 1, 5.0, 10.0, 0.0, 0.0, "R", "F", TS),
            (2, 101, 11, 2, 5.0, 10.0, 0.0, 0.0, "R", "F", TS),
            # order 3: single supplier returns -> no second supplier, dropped
            (3, 100, 12, 1, 5.0, 10.0, 0.0, 0.0, "R", "F", TS),
            # order 4: like order 1 but order not finalized -> dropped
            (4, 100, 10, 1, 5.0, 10.0, 0.0, 0.0, "R", "F", TS),
            # dominant-share rows: part 200 total 10, supp 10 ships 8 (80%)
            (5, 200, 10, 1, 8.0, 10.0, 0.0, 0.0, "N", "F", TS),
            (5, 200, 11, 2, 2.0, 10.0, 0.0, 0.0, "N", "F", TS),
            # part 201: an even 5/5 split -> nobody dominant
            (6, 201, 10, 1, 5.0, 10.0, 0.0, 0.0, "N", "F", TS),
            (6, 201, 11, 2, 5.0, 10.0, 0.0, 0.0, "N", "F", TS),
        ],
        ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
         "l_quantity", "l_extendedprice", "l_discount", "l_tax",
         "l_returnflag", "l_linestatus", "l_shipdate"],
    )
    orders = spark.createDataFrame(
        [(1, 1, "F", 1.0, TS, "1-URGENT"),
         (2, 1, "F", 1.0, TS, "1-URGENT"),
         (3, 1, "F", 1.0, TS, "1-URGENT"),
         (4, 1, "O", 1.0, TS, "1-URGENT"),
         (5, 1, "F", 1.0, TS, "1-URGENT"),
         (6, 1, "F", 1.0, TS, "1-URGENT")],
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
         "o_orderdate", "o_orderpriority"],
    )
    supplier = spark.createDataFrame(
        [(10, "SUPP_10", 0, 0.0), (11, "SUPP_11", 1, 0.0),
         (12, "SUPP_12", 2, 0.0)],
        ["s_suppkey", "s_name", "s_nationkey", "s_acctbal"],
    )
    nation = spark.createDataFrame(
        [(i, f"NATION_{i}", i % 5) for i in range(25)],
        ["n_nationkey", "n_name", "n_regionkey"],
    )
    for name, df in [("lineitem", li), ("orders", orders),
                     ("supplier", supplier), ("nation", nation)]:
        df.write.mode("overwrite").parquet(os.path.join(d, f"{name}.parquet"))


class TestSoleReturnSupplier:
    def test_only_sole_returner_in_multi_supplier_final_order(
            self, spark, tmp_path):
        _write_fixture(spark, str(tmp_path))
        out = {r["s_suppkey"]: r.asDict()
               for r in QUERIES["sole_return_supplier"](
                   spark, str(tmp_path)).collect()}
        # supp 10 counted exactly once (order 1); order 2 (both return),
        # order 3 (single supplier), order 4 (status O) all excluded
        assert set(out) == {10}
        assert out[10]["numwait"] == 1


class TestDominantShareSuppliers:
    def test_majority_share_only(self, spark, tmp_path):
        _write_fixture(spark, str(tmp_path))
        out = {r["s_suppkey"]: r.asDict()
               for r in QUERIES["dominant_share_suppliers"](
                   spark, str(tmp_path)).collect()}
        # supp 10 dominates part 100 (15/20) and part 200 (8/10); supp 11
        # dominates part 101 (10/10); the 50/50 part 201 dominates nobody
        # (strict > majority); supp 12's 5/20 of part 100 never qualifies
        assert set(out) == {10, 11}
        assert out[10]["n_dominant_parts"] == 2
        assert out[10]["max_share_bp"] == 8000
        assert out[11]["n_dominant_parts"] == 1
        assert out[11]["max_share_bp"] == 10000


class TestStreamingDedupEvents:
    def test_cross_batch_duplicates_suppressed(self, spark, tmp_path):
        ev = spark.createDataFrame(
            [(i, TS, i % 3, "click", 1.0 + i, "{}") for i in range(50)],
            ["event_id", "ts", "user_id", "event_type", "value", "props"],
        )
        ev.write.parquet(os.path.join(str(tmp_path), "events.parquet"))
        out = QUERIES["streaming_dedup_events"](spark, str(tmp_path)).collect()
        assert len(out) == 50
        assert len({r["event_id"] for r in out}) == 50


class TestPlanShapes:
    """The docstring claims about these plans are load-bearing — pin them."""

    def test_sole_return_supplier_semi_anti_and_pushdown(self, spark):
        df = QUERIES["sole_return_supplier"](spark, "/root/testdata/sf0.001")
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "LeftSemi" in plan
        assert "LeftAnti" in plan
        scan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted"))
        assert "EqualTo(l_returnflag,R)" in scan  # predicate reached the scan

    def test_dominant_share_two_level_agg_shares_exchange(self, spark):
        df = QUERIES["dominant_share_suppliers"](
            spark, "/root/testdata/sf0.001")
        plan = df._jdf.queryExecution().executedPlan().toString()
        # the supplier dim must come in broadcast, never shuffled
        assert "BroadcastHashJoin" in plan
        # the date window reaches the parquet scan
        scan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted"))
        assert "GreaterThanOrEqual(l_shipdate" in scan
