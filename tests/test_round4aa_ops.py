"""Unit tests for round-4 batch: integer lag-7 autocorrelation and Kish
effective sample size."""

from __future__ import annotations

import datetime as dt
import os

from ocr_spark.queries import QUERIES


class TestWeeklyAutocorr:
    def test_planted_weekly_pattern(self, spark, tmp_path):
        d = str(tmp_path)
        rows, eid = [], 0
        # 'weekly': 21 days alternating 10 on weekdays-ish pattern with
        # period 7: counts = 50 if day % 7 == 1 else 10 -> lag-7 pairs
        # perfectly correlated
        for day in range(1, 22):
            per = 50 if day % 7 == 1 else 10
            for _ in range(per):
                rows.append((eid, dt.datetime(2024, 1, day, 12), 1,
                             "weekly", 1.0, "{}"))
                eid += 1
        # 'trend': strictly increasing counts — lag-7 correlation is
        # positive too, but the classic trap is DECREASING vs lagged;
        # here we just need a second series with >= 10 days
        for day in range(1, 12):
            for _ in range(day):
                rows.append((eid, dt.datetime(2024, 1, day, 12), 1,
                             "trend", 1.0, "{}"))
                eid += 1
        spark.createDataFrame(
            rows, ["event_id", "ts", "user_id", "event_type", "value",
                   "props"]
        ).write.parquet(os.path.join(d, "events.parquet"))
        out = {r["event_type"]: r.asDict()
               for r in QUERIES["weekly_autocorr"](spark, d).collect()}
        # weekly: 14 overlapping pairs, x and y identical sequences ->
        # r^2 = 1 exactly
        assert out["weekly"]["m"] == 14
        assert out["weekly"]["r2_bp"] == 10000
        assert out["weekly"]["is_weekly"] == 1
        # trend: only 4 pairs (11 days - 7); x=[1..4], y=[8..11] are
        # perfectly linearly related -> r^2 = 1, and positive
        assert out["trend"]["m"] == 4
        assert out["trend"]["is_weekly"] == 1

    def test_flat_series_zero_variance(self, spark, tmp_path):
        d = str(tmp_path)
        rows, eid = [], 0
        for day in range(1, 15):
            for _ in range(5):
                rows.append((eid, dt.datetime(2024, 1, day, 12), 1,
                             "flat", 1.0, "{}"))
                eid += 1
        spark.createDataFrame(
            rows, ["event_id", "ts", "user_id", "event_type", "value",
                   "props"]
        ).write.parquet(os.path.join(d, "events.parquet"))
        out = QUERIES["weekly_autocorr"](spark, d).collect()[0].asDict()
        # zero variance -> r2 defined as 0, never flagged
        assert out["r2_bp"] == 0
        assert out["is_weekly"] == 0


class TestEffectiveSampleSize:
    def test_balanced_vs_skewed(self, spark, tmp_path):
        d = str(tmp_path)
        rows = []
        # 'en': 4 docs of equal weight 100 -> ESS = 4 (ratio 10000)
        for i in range(4):
            rows.append((i, "t", "en", "s", 100))
        # 'de': one mega-doc dominates: weights 1000, 10, 10, 10
        for i, w in [(10, 1000), (11, 10), (12, 10), (13, 10)]:
            rows.append((i, "t", "de", "s", w))
        spark.createDataFrame(
            rows, ["doc_id", "text", "lang", "source", "n_chars"]
        ).write.parquet(os.path.join(d, "documents.parquet"))
        out = {r["lang"]: r.asDict()
               for r in QUERIES["effective_sample_size"](spark, d)
               .collect()}
        assert out["en"]["ess"] == 4
        assert out["en"]["ess_ratio_bp"] == 10000
        # de: (1030)^2 // (1000300) = 1 -> the corpus is worth ~1 doc
        assert out["de"]["ess"] == 1
        assert out["de"]["ess_ratio_bp"] == 2500
