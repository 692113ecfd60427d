"""Unit tests for round-4 batch: contingency independence cells and
decayed leaderboard."""

from __future__ import annotations

import datetime as dt
import os

from ocr_spark.queries import QUERIES


class TestIndependenceChi2:
    def test_skewed_vs_independent(self, spark, tmp_path):
        d = str(tmp_path)
        rows, did = [], 0
        # srcA: 8 en, 2 de; srcB: 2 en, 8 de -> strong dependence
        for src, lang, n in [("A", "en", 8), ("A", "de", 2),
                             ("B", "en", 2), ("B", "de", 8)]:
            for _ in range(n):
                rows.append((did, "t", lang, src, 10))
                did += 1
        spark.createDataFrame(
            rows, ["doc_id", "text", "lang", "source", "n_chars"]
        ).write.parquet(os.path.join(d, "documents.parquet"))
        out = {(r["lang"], r["source"]): r.asDict()
               for r in QUERIES["independence_chi2"](spark, d)
               .collect()}
        # margins: en 10, de 10, A 10, B 10, n 20 -> expected 5 each
        cell = out[("en", "A")]
        assert cell["obs"] == 8
        assert cell["exp_x10000"] == 50000
        # contrib = (8*20 - 10*10)^2 * 10000 // (20*10*10)
        assert cell["chi2_contrib_x10000"] == (160 - 100) ** 2 * 10000 // 2000
        # all four cells deviate symmetrically
        assert all(v["chi2_contrib_x10000"] == 18000
                   for v in out.values())


class TestDecayedLeaderboard:
    def test_trending_reorder(self, spark, tmp_path):
        d = str(tmp_path)
        rows, eid = [], 0
        # 'legacy': 100 events 3 weeks ago (decay // 8) -> decayed 12
        for _ in range(100):
            rows.append((eid, dt.datetime(2024, 1, 1, 12), 1, "legacy",
                         1.0, "{}"))
            eid += 1
        # 'rising': 40 events on the anchor day -> decayed 40
        for _ in range(40):
            rows.append((eid, dt.datetime(2024, 1, 22, 12), 1, "rising",
                         1.0, "{}"))
            eid += 1
        spark.createDataFrame(
            rows, ["event_id", "ts", "user_id", "event_type", "value",
                   "props"]
        ).write.parquet(os.path.join(d, "events.parquet"))
        out = {r["event_type"]: r.asDict()
               for r in QUERIES["decayed_leaderboard"](spark, d)
               .collect()}
        # raw ranks: legacy first; decayed ranks flip
        assert out["legacy"]["raw_total"] == 100
        assert out["legacy"]["rank_raw"] == 1
        # 21 days old -> 3 weeks -> 100 // 8 = 12
        assert out["legacy"]["decayed_score"] == 12
        assert out["rising"]["decayed_score"] == 40
        assert out["rising"]["rank_decayed"] == 1
        assert out["legacy"]["rank_decayed"] == 2
