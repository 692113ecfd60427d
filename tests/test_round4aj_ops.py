"""Unit tests for round-4 batch: seasonal anomaly and rolling WAU."""

from __future__ import annotations

import datetime as dt
import os

from ocr_spark.queries import QUERIES


class TestSeasonalAnomaly:
    def test_weekday_adjustment(self, spark, tmp_path):
        d = str(tmp_path)
        rows, eid = [], 0
        # Mondays 2024-01-01, 08, 15: 100, 100, 40 events;
        # Tuesdays 01-02, 09: 10, 10 events.
        for day, n in [(1, 100), (8, 100), (15, 40),
                       (2, 10), (9, 10)]:
            for _ in range(n):
                rows.append((eid, dt.datetime(2024, 1, day, 12), 1,
                             "a", 1.0, "{}"))
                eid += 1
        spark.createDataFrame(
            rows, ["event_id", "ts", "user_id", "event_type", "value",
                   "props"]
        ).write.parquet(os.path.join(d, "events.parquet"))
        out = {r["day"]: r.asDict()
               for r in QUERIES["seasonal_anomaly"](spark, d).collect()}
        # Monday profile: de=240, dd=3, expected 80
        assert out["2024-01-01"]["expected"] == 80
        # 2024-01-15: (40*3-240)*10000//240 = -5000 -> anomalous
        assert out["2024-01-15"]["resid_bp"] == -5000
        assert out["2024-01-15"]["is_anomalous"] == 1
        # a 10-event Tuesday is NORMAL for Tuesdays
        assert out["2024-01-02"]["resid_bp"] == 0
        assert out["2024-01-02"]["is_anomalous"] == 0
        # 100-event Mondays are mildly above their own profile
        assert out["2024-01-01"]["is_anomalous"] == 0


class TestRollingWau:
    def test_window_membership(self, spark, tmp_path):
        d = str(tmp_path)
        rows = [
            # users 1,2 active Jan 1; user 3 active Jan 5;
            # user 1 again Jan 10 (outside 7d of Jan 1..3)
            (0, dt.datetime(2024, 1, 1, 9), 1, "a", 1.0, "{}"),
            (1, dt.datetime(2024, 1, 1, 10), 2, "a", 1.0, "{}"),
            (2, dt.datetime(2024, 1, 5, 9), 3, "a", 1.0, "{}"),
            (3, dt.datetime(2024, 1, 10, 9), 1, "a", 1.0, "{}"),
        ]
        spark.createDataFrame(
            rows, ["event_id", "ts", "user_id", "event_type", "value",
                   "props"]
        ).write.parquet(os.path.join(d, "events.parquet"))
        out = {r["day"]: r["wau"]
               for r in QUERIES["rolling_wau"](spark, d).collect()}
        # report days = activity days only
        assert set(out) == {"2024-01-01", "2024-01-05", "2024-01-10"}
        assert out["2024-01-01"] == 2            # users 1,2
        assert out["2024-01-05"] == 3            # 1,2 (Jan1) + 3
        # Jan 10 window is Jan 4..10: user 3 (Jan 5) + user 1 (Jan 10)
        assert out["2024-01-10"] == 2
