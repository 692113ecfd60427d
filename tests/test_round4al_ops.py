"""Unit tests for round-4 batch: gains curve and longest streak."""

from __future__ import annotations

import datetime as dt
import os

from ocr_spark.queries import QUERIES


class TestGainsCurve:
    def test_decreasing_and_complete(self, spark, tmp_path):
        d = str(tmp_path)
        spark.createDataFrame(
            [(i, f"b{i}") for i in range(1000)], ["doc_id", "text"]
        ).write.parquet(os.path.join(d, "documents.parquet"))
        out = {r["decile"]: r.asDict()
               for r in QUERIES["gains_curve"](spark, d).collect()}
        assert set(out) == set(range(1, 11))
        # deciles of equal size
        assert all(v["n"] == 100 for v in out.values())
        # cumulative share reaches 100%
        assert out[10]["cum_share_bp"] == 10000
        # top decile lifts above baseline, bottom decile below
        assert out[1]["lift_x100"] > 100
        assert out[10]["lift_x100"] < 100
        # top decile captures the bulk of positives (score>=800 all
        # live there by construction)
        assert out[1]["n_pos"] >= 90


class TestLongestStreak:
    def test_islands(self, spark, tmp_path):
        d = str(tmp_path)
        rows, eid = [], 0
        # user 1: days 1,2,3 then 5,6 -> longest 3, 2 runs
        for day in (1, 2, 3, 5, 6):
            rows.append((eid, dt.datetime(2024, 1, day, 9), 1, "a",
                         1.0, "{}"))
            eid += 1
        # duplicate events on one day must not break the streak math
        rows.append((eid, dt.datetime(2024, 1, 2, 15), 1, "a", 1.0,
                     "{}"))
        eid += 1
        # user 2: a single day
        rows.append((eid, dt.datetime(2024, 1, 7, 9), 2, "a", 1.0,
                     "{}"))
        spark.createDataFrame(
            rows, ["event_id", "ts", "user_id", "event_type", "value",
                   "props"]
        ).write.parquet(os.path.join(d, "events.parquet"))
        out = {r["user_id"]: r.asDict()
               for r in QUERIES["longest_streak"](spark, d).collect()}
        assert out[1]["n_active_days"] == 5
        assert out[1]["longest_streak"] == 3
        assert out[1]["n_runs"] == 2
        assert out[2]["longest_streak"] == 1
        assert out[2]["n_runs"] == 1
