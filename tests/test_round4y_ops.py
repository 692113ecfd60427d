"""Unit tests for round-4 batch: multiclass PRF, CUSUM changepoint,
day-of-week seasonality."""

from __future__ import annotations

import datetime as dt
import os

from ocr_spark.queries import QUERIES


class TestMulticlassPrf:
    def test_rotating_confusion(self, spark, tmp_path):
        d = str(tmp_path)
        # 21 docs: ids 0..20. Mispredictions at ids 0,7,14 -> truths
        # x,y,z each lose one to the next class.
        spark.createDataFrame(
            [(i, f"b{i}") for i in range(21)], ["doc_id", "text"]
        ).write.parquet(os.path.join(d, "documents.parquet"))
        out = {r["cls"]: r.asDict()
               for r in QUERIES["multiclass_prf"](spark, d).collect()}
        # truths: x 7, y 7, z 7. id0 (x->y), id7 (y->z), id14 (z->x)
        for cls in "xyz":
            assert out[cls]["tp"] == 6
            assert out[cls]["fp"] == 1
            assert out[cls]["fn"] == 1
        # precision = recall = 6/7 -> 8571 bp; F1 equals them
        assert out["x"]["precision_bp"] == 8571
        assert out["x"]["recall_bp"] == 8571
        assert out["x"]["f1_bp"] == 8571


class TestCusumChangepoint:
    def test_planted_shift(self, spark, tmp_path):
        d = str(tmp_path)
        rows, eid = [], 0
        # 'shift': 5 days at 10/day then 5 days at 50/day
        for day in range(1, 11):
            per = 10 if day <= 5 else 50
            for _ in range(per):
                rows.append((eid, dt.datetime(2024, 1, day, 12, 0, 0),
                             1, "shift", 1.0, "{}"))
                eid += 1
        # 'flat': constant 20/day for 4 days
        for day in range(1, 5):
            for _ in range(20):
                rows.append((eid, dt.datetime(2024, 1, day, 12, 0, 0),
                             1, "flat", 1.0, "{}"))
                eid += 1
        spark.createDataFrame(
            rows, ["event_id", "ts", "user_id", "event_type", "value",
                   "props"]
        ).write.parquet(os.path.join(d, "events.parquet"))
        out = {r["event_type"]: r.asDict()
               for r in QUERIES["cusum_changepoint"](spark, d).collect()}
        # shift: peak at the boundary day 5 (|50*10 - 5*300| = 1000)
        assert out["shift"]["cp_index"] == 5
        assert out["shift"]["cp_day"] == "2024-01-05"
        assert out["shift"]["peak_scaled"] == 1000
        # flat: CUSUM identically zero -> first index wins
        assert out["flat"]["peak_scaled"] == 0
        assert out["flat"]["cp_index"] == 1


class TestDowSeasonality:
    def test_exact_indices(self, spark, tmp_path):
        d = str(tmp_path)
        rows, eid = [], 0
        # 2024-01-01 and 2024-01-08 are Mondays; 2024-01-02 a Tuesday
        for ts, n in [(dt.datetime(2024, 1, 1, 9), 4),
                      (dt.datetime(2024, 1, 8, 9), 1),
                      (dt.datetime(2024, 1, 2, 9), 1)]:
            for _ in range(n):
                rows.append((eid, ts, 1, "a", 1.0, "{}"))
                eid += 1
        spark.createDataFrame(
            rows, ["event_id", "ts", "user_id", "event_type", "value",
                   "props"]
        ).write.parquet(os.path.join(d, "events.parquet"))
        out = {r["dow"]: r.asDict()
               for r in QUERIES["dow_seasonality"](spark, d).collect()}
        # Monday (1): 5 events over 2 days; Tuesday (2): 1 over 1
        assert out[1]["n_events"] == 5 and out[1]["n_days"] == 2
        assert out[2]["n_events"] == 1 and out[2]["n_days"] == 1
        # totals 6 events / 3 day-slots
        assert out[1]["index_bp"] == 5 * 3 * 10000 // (2 * 6)
        assert out[2]["index_bp"] == 1 * 3 * 10000 // (1 * 6)
