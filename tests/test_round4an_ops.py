"""Unit tests for round-4 batch: segment migration, new vs returning,
hapax rate."""

from __future__ import annotations

import datetime as dt
import os

from ocr_spark.queries import QUERIES


class TestSegmentMigration:
    def test_tier_flow(self, spark, tmp_path):
        d = str(tmp_path)
        rows, eid = [], 0

        def burst(user, day, n):
            nonlocal eid
            for _ in range(n):
                rows.append((eid, dt.datetime(2024, 1, day, 12), user,
                             "a", 1.0, "{}"))
                eid += 1

        burst(1, 5, 50)    # user 1: hi in p1...
        burst(1, 20, 5)    # ...lo in p2 (churn)
        burst(2, 5, 15)    # user 2: mid -> mid
        burst(2, 20, 15)
        burst(3, 20, 50)   # user 3: none -> hi (new arrival)
        spark.createDataFrame(
            rows, ["event_id", "ts", "user_id", "event_type", "value",
                   "props"]
        ).write.parquet(os.path.join(d, "events.parquet"))
        out = {(r["t1"], r["t2"]): r.asDict()
               for r in QUERIES["segment_migration"](spark, d)
               .collect()}
        assert out[("hi", "lo")]["n_users"] == 1
        assert out[("hi", "lo")]["row_share_bp"] == 10000
        assert out[("mid", "mid")]["n_users"] == 1
        assert out[("none", "hi")]["n_users"] == 1


class TestNewVsReturning:
    def test_split(self, spark, tmp_path):
        d = str(tmp_path)
        rows = [
            (0, dt.datetime(2024, 1, 1, 9), 1, "a", 1.0, "{}"),
            (1, dt.datetime(2024, 1, 1, 9), 2, "a", 1.0, "{}"),
            (2, dt.datetime(2024, 1, 2, 9), 1, "a", 1.0, "{}"),
            (3, dt.datetime(2024, 1, 2, 9), 3, "a", 1.0, "{}"),
        ]
        spark.createDataFrame(
            rows, ["event_id", "ts", "user_id", "event_type", "value",
                   "props"]
        ).write.parquet(os.path.join(d, "events.parquet"))
        out = {r["day"]: r.asDict()
               for r in QUERIES["new_vs_returning"](spark, d).collect()}
        assert out["2024-01-01"]["new_users"] == 2
        assert out["2024-01-01"]["returning_users"] == 0
        # Jan 2: user 3 is new, user 1 returns
        assert out["2024-01-02"]["new_users"] == 1
        assert out["2024-01-02"]["returning_users"] == 1


class TestHapaxRate:
    def test_richness(self, spark, tmp_path):
        d = str(tmp_path)
        rows = [
            # en: 'the cat sat the mat' -> vocab 4 (the x2), hapax 3
            (0, "the cat sat the mat", "en", "s", 19),
            # de: every word once -> hapax 10000 bp
            (1, "ein zwei drei", "de", "s", 13),
        ]
        spark.createDataFrame(
            rows, ["doc_id", "text", "lang", "source", "n_chars"]
        ).write.parquet(os.path.join(d, "documents.parquet"))
        out = {r["lang"]: r.asDict()
               for r in QUERIES["hapax_rate"](spark, d).collect()}
        assert out["en"]["vocab"] == 4
        assert out["en"]["tokens"] == 5
        assert out["en"]["hapax"] == 3
        assert out["en"]["hapax_bp"] == 7500
        assert out["en"]["type_token_bp"] == 8000
        assert out["de"]["hapax_bp"] == 10000
