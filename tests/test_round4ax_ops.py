"""Unit tests for round-4 batch: AS-OF join enrichment and column
profiling."""

from __future__ import annotations

import datetime as dt
import os

from ocr_spark.queries import QUERIES


class TestAsofJoinEnrich:
    def test_at_or_before_and_ties(self, spark, tmp_path):
        d = str(tmp_path)
        spark.createDataFrame(
            [
                # user 1: orders on day 1 and day 5; two orders on day 5
                (100, 1, "O", 10.00, dt.datetime(2024, 1, 1), "1-URGENT"),
                (101, 1, "O", 20.00, dt.datetime(2024, 1, 5), "1-URGENT"),
                (102, 1, "O", 30.00, dt.datetime(2024, 1, 5), "1-URGENT"),
                # user 2: only a FUTURE order
                (200, 2, "O", 40.00, dt.datetime(2024, 2, 1), "1-URGENT"),
            ],
            ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
             "o_orderdate", "o_orderpriority"],
        ).write.parquet(os.path.join(d, "orders.parquet"))
        spark.createDataFrame(
            [
                # event between the orders -> sees day-1 order
                (0, dt.datetime(2024, 1, 3), 1, "a", 1.0, "{}"),
                # event exactly AT the day-5 order ts -> at-or-before
                # includes it; tie between 101/102 -> higher key 102
                (1, dt.datetime(2024, 1, 5), 1, "a", 1.0, "{}"),
                # event after -> still 102
                (2, dt.datetime(2024, 1, 9), 1, "a", 1.0, "{}"),
                # user 2's event precedes every order -> NULLs
                (3, dt.datetime(2024, 1, 3), 2, "a", 1.0, "{}"),
            ],
            ["event_id", "ts", "user_id", "event_type", "value", "props"],
        ).write.parquet(os.path.join(d, "events.parquet"))
        out = {r["event_id"]: r.asDict()
               for r in QUERIES["asof_join_enrich"](spark, d).collect()}
        assert out[0]["last_orderkey"] == 100
        assert out[0]["last_order_cents"] == 1000
        assert out[0]["days_since_order"] == 2
        assert out[1]["last_orderkey"] == 102
        assert out[1]["days_since_order"] == 0
        assert out[2]["last_orderkey"] == 102
        assert out[2]["days_since_order"] == 4
        assert out[3]["last_orderkey"] is None
        assert out[3]["days_since_order"] is None


class TestColumnProfile:
    def test_profile_values(self, spark, tmp_path):
        d = str(tmp_path)
        spark.createDataFrame(
            [
                (1, 10, "O", 5.0, dt.datetime(2024, 1, 1), "1-URGENT"),
                (2, 10, "F", 5.0, dt.datetime(2024, 1, 2), "1-URGENT"),
                (3, 11, None, 7.0, dt.datetime(2024, 1, 2), "2-HIGH"),
            ],
            ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
             "o_orderdate", "o_orderpriority"],
        ).write.parquet(os.path.join(d, "orders.parquet"))
        out = {r["col_name"]: r.asDict()
               for r in QUERIES["column_profile"](spark, d).collect()}
        assert len(out) == 6
        assert all(v["n_rows"] == 3 for v in out.values())
        assert out["o_orderkey"]["n_distinct"] == 3
        assert out["o_custkey"]["n_distinct"] == 2
        # NULL neither counts as a distinct value nor is lost
        assert out["o_orderstatus"]["n_null"] == 1
        assert out["o_orderstatus"]["n_distinct"] == 2
        assert out["o_totalprice"]["n_distinct"] == 2
        assert out["o_orderpriority"]["n_null"] == 0
