"""Unit tests for round-4 batch: double-fire detection and out-of-order
arrival rate."""

from __future__ import annotations

import datetime as dt
import os

from ocr_spark.queries import QUERIES


class TestDoubleFireDedup:
    def test_subsecond_gap(self, spark, tmp_path):
        d = str(tmp_path)
        rows = [
            # user 1 clicks twice 300ms apart -> one double-fire
            (0, dt.datetime(2024, 1, 1, 10, 0, 0, 0), 1, "click",
             1.0, "{}"),
            (1, dt.datetime(2024, 1, 1, 10, 0, 0, 300000), 1, "click",
             1.0, "{}"),
            # exactly 1s later: NOT a double fire (strict <)
            (2, dt.datetime(2024, 1, 1, 10, 0, 1, 300000), 1, "click",
             1.0, "{}"),
            # different type within 300ms: not a dup of the click
            (3, dt.datetime(2024, 1, 1, 10, 0, 0, 100000), 1, "view",
             1.0, "{}"),
            # different user same instant: independent
            (4, dt.datetime(2024, 1, 1, 10, 0, 0, 0), 2, "click",
             1.0, "{}"),
        ]
        spark.createDataFrame(
            rows, ["event_id", "ts", "user_id", "event_type", "value",
                   "props"]
        ).write.parquet(os.path.join(d, "events.parquet"))
        out = {r["event_type"]: r.asDict()
               for r in QUERIES["double_fire_dedup"](spark, d)
               .collect()}
        assert out["click"]["n_events"] == 4
        assert out["click"]["n_double_fires"] == 1
        assert out["click"]["dup_bp"] == 2500
        assert out["view"]["n_double_fires"] == 0


class TestOooArrival:
    def test_inversions(self, spark, tmp_path):
        d = str(tmp_path)
        rows = [
            # user 1: ids arrive 5, 3, 7, 6 in time order ->
            # inversions at (5->3) and (7->6)
            (5, dt.datetime(2024, 1, 1, 10, 0, 0), 1, "a", 1.0, "{}"),
            (3, dt.datetime(2024, 1, 1, 10, 0, 1), 1, "a", 1.0, "{}"),
            (7, dt.datetime(2024, 1, 1, 10, 0, 2), 1, "a", 1.0, "{}"),
            (6, dt.datetime(2024, 1, 1, 10, 0, 3), 1, "a", 1.0, "{}"),
            # user 2: perfectly ordered
            (10, dt.datetime(2024, 1, 1, 11, 0, 0), 2, "a", 1.0, "{}"),
            (11, dt.datetime(2024, 1, 1, 11, 0, 1), 2, "a", 1.0, "{}"),
        ]
        spark.createDataFrame(
            rows, ["event_id", "ts", "user_id", "event_type", "value",
                   "props"]
        ).write.parquet(os.path.join(d, "events.parquet"))
        out = {r["user_id"]: r.asDict()
               for r in QUERIES["ooo_arrival"](spark, d).collect()}
        assert out[1]["n_inversions"] == 2
        assert out[1]["ooo_bp"] == 5000
        assert out[2]["n_inversions"] == 0
