"""Unit tests for round-4 batch: skip-gram negative sampling and churn
label generation."""

from __future__ import annotations

import datetime as dt
import os

from ocr_spark.queries import QUERIES


class TestSkipgramNegatives:
    def test_deterministic_draws_and_collision_flag(self, spark,
                                                    tmp_path):
        d = str(tmp_path)
        spark.createDataFrame(
            [(0, "alpha beta gamma alpha", "en", "s", 1),
             (1, "alpha beta delta", "en", "s", 1)],
            ["doc_id", "text", "lang", "source", "n_chars"],
        ).write.parquet(os.path.join(d, "documents.parquet"))
        rows = QUERIES["skipgram_negatives"](spark, d).collect()
        # 4 vocab words, all within top-50 -> 2 draws each
        assert len(rows) == 8
        by_center = {}
        for r in rows:
            by_center.setdefault(r["center"], []).append(r)
        assert set(by_center) == {"alpha", "beta", "gamma", "delta"}
        assert all(len(v) == 2 for v in by_center.values())
        # every draw resolves to a real vocab word with its true freq
        freqs = {"alpha": 3, "beta": 2, "gamma": 1, "delta": 1}
        for r in rows:
            assert r["negative"] in freqs
            assert r["neg_freq"] == freqs[r["negative"]]
            assert r["self_collision"] == (
                1 if r["negative"] == r["center"] else 0)
        # rerun is bit-identical (no RNG anywhere)
        rows2 = QUERIES["skipgram_negatives"](spark, d).collect()
        key = lambda r: (r["center"], r["draw_idx"])
        assert sorted(((key(r), r["negative"]) for r in rows),
                      key=str) == \
            sorted(((key(r), r["negative"]) for r in rows2), key=str)


class TestChurnLabels:
    def test_labels_and_censoring(self, spark, tmp_path):
        d = str(tmp_path)
        rows = []
        eid = 0

        def ev(user, day):
            nonlocal eid
            rows.append((eid, dt.datetime(2024, 1, day, 12), user, "a",
                         1.0, "{}"))
            eid += 1

        # weeks anchored at 2024-01-01: week0 = days 1-7, week1 = 8-14,
        # week2 = 15-21
        ev(1, 2)   # user 1 active week 0
        ev(1, 9)   # ... and week 1 -> week0 label churn=0
        ev(2, 3)   # user 2 active week 0 only -> churn=1
        ev(3, 16)  # user 3 active only the FINAL week -> censored out
        spark.createDataFrame(
            rows, ["event_id", "ts", "user_id", "event_type", "value",
                   "props"]
        ).write.parquet(os.path.join(d, "events.parquet"))
        out = {(r["user_id"], r["week"]): r["churned_next_week"]
               for r in QUERIES["churn_labels"](spark, d).collect()}
        assert out[(1, 0)] == 0
        assert out[(2, 0)] == 1
        # user 1's week-1 row: absent week 2 -> churned
        assert out[(1, 1)] == 1
        # the right-censored final week never gets a row
        assert (3, 2) not in out
        assert all(w < 2 for (_, w) in out)
