"""Unit tests for round-4 batch: naive-forecast MASE eval and Soundex
blocking keys."""

from __future__ import annotations

import datetime as dt
import os

from ocr_spark.queries import QUERIES


class TestNaiveForecastEval:
    def test_periodic_series_favors_seasonal(self, spark, tmp_path):
        d = str(tmp_path)
        # 21 days of a perfect period-7 pattern: weekday d has 10+d
        # events. naive-7 error = 0; naive-1 error > 0.
        rows = []
        eid = 0
        for day in range(1, 22):
            for _ in range(10 + (day % 7)):
                rows.append((eid, dt.datetime(2024, 1, day, 12), 1, "a",
                             1.0, "{}"))
                eid += 1
        spark.createDataFrame(
            rows, ["event_id", "ts", "user_id", "event_type", "value",
                   "props"]
        ).write.parquet(os.path.join(d, "events.parquet"))
        out = QUERIES["naive_forecast_eval"](spark, d).collect()[0]
        # days 8..21 score (prev1 and prev7 both defined)
        assert out["n_days_scored"] == 14
        assert out["sae_seasonal7"] == 0
        assert out["sae_naive1"] > 0
        assert out["mase_bp"] == 0

    def test_flat_series_zero_denominator_guard(self, spark, tmp_path):
        d = str(tmp_path)
        rows = []
        eid = 0
        for day in range(1, 12):
            for _ in range(5):
                rows.append((eid, dt.datetime(2024, 1, day, 12), 1, "b",
                             1.0, "{}"))
                eid += 1
        spark.createDataFrame(
            rows, ["event_id", "ts", "user_id", "event_type", "value",
                   "props"]
        ).write.parquet(os.path.join(d, "events.parquet"))
        out = QUERIES["naive_forecast_eval"](spark, d).collect()[0]
        assert out["sae_naive1"] == 0 and out["mase_bp"] == 0


class TestSoundexBlocking:
    def test_canonical_codes(self, spark, tmp_path):
        d = str(tmp_path)
        names = ["robert thing", "rupert thing", "ashcraft thing",
                 "tymczak thing", "pfister thing", "honeyman thing"]
        spark.createDataFrame(
            [(i, n, "Brand#1", "ECONOMY", 1, 1.0)
             for i, n in enumerate(names)],
            ["p_partkey", "p_name", "p_brand", "p_type", "p_size",
             "p_retailprice"],
        ).write.parquet(os.path.join(d, "part.parquet"))
        out = {r["word"]: r.asDict()
               for r in QUERIES["soundex_blocking"](spark, d).collect()}
        # the canonical NIST test vectors
        assert out["robert"]["soundex_code"] == "R163"
        assert out["rupert"]["soundex_code"] == "R163"
        # H-transparency: s and c merge across the h
        assert out["ashcraft"]["soundex_code"] == "A261"
        # vowel separation keeps the two 2s apart
        assert out["tymczak"]["soundex_code"] == "T522"
        # first-letter duplicate code collapses
        assert out["pfister"]["soundex_code"] == "P236"
        assert out["honeyman"]["soundex_code"] == "H555"
        # robert and rupert share a block of 2
        assert out["robert"]["block_size"] == 2
        assert out["ashcraft"]["block_size"] == 1
