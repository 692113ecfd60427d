"""Unit tests for round-4 batch: data-quality check panel."""

from __future__ import annotations

import datetime as dt
import os

from ocr_spark.queries import QUERIES


class TestDqCheckpanel:
    def test_planted_violations(self, spark, tmp_path):
        d = str(tmp_path)
        spark.createDataFrame(
            [
                (1, 1, "O", 10.0, dt.datetime(2024, 1, 5), "1-URGENT"),
                # duplicate PK
                (1, 1, "O", 11.0, dt.datetime(2024, 1, 5), "1-URGENT"),
                # negative price + empty priority
                (2, 1, "O", -5.0, dt.datetime(2024, 1, 5), ""),
                (3, 2, "O", 20.0, dt.datetime(2024, 1, 5), "2-HIGH"),
            ],
            ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
             "o_orderdate", "o_orderpriority"],
        ).write.parquet(os.path.join(d, "orders.parquet"))
        spark.createDataFrame(
            [(1, "c1", 0, 0.0, "B"), (2, "c2", 0, 0.0, "B")],
            ["c_custkey", "c_name", "c_nationkey", "c_acctbal",
             "c_mktsegment"],
        ).write.parquet(os.path.join(d, "customer.parquet"))
        spark.createDataFrame(
            [
                # ships AFTER order date: fine
                (3, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O",
                 dt.datetime(2024, 1, 9)),
                # ships BEFORE order date: temporal violation
                (3, 2, 1, 2, 1.0, 1.0, 0.0, 0.0, "N", "O",
                 dt.datetime(2024, 1, 2)),
                # orphan lineitem: fk violation
                (99, 3, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O",
                 dt.datetime(2024, 1, 9)),
            ],
            ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
             "l_quantity", "l_extendedprice", "l_discount", "l_tax",
             "l_returnflag", "l_linestatus", "l_shipdate"],
        ).write.parquet(os.path.join(d, "lineitem.parquet"))
        out = {r["check_name"]: r.asDict()
               for r in QUERIES["dq_checkpanel"](spark, d).collect()}
        assert len(out) == 6
        assert out["pk_orders_unique"]["n_violations"] == 1
        assert out["pk_orders_unique"]["passed"] == 0
        assert out["pk_customer_unique"]["passed"] == 1
        assert out["fk_lineitem_has_order"]["n_violations"] == 1
        # the two lineitems with order 3 join twice? no — order 3 is
        # unique; the dup is order 1 with no lineitems, so n stays 3
        assert out["fk_lineitem_has_order"]["n_checked"] == 3
        assert out["ship_not_before_order"]["n_violations"] == 1
        assert out["price_non_negative"]["n_violations"] == 1
        assert out["priority_present"]["n_violations"] == 1
        assert out["priority_present"]["violation_ppm"] == 250000
