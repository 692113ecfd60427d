"""Unit tests for round-4 batch: KMV bottom-k distinct sketch and
Good-Turing count-of-counts."""

from __future__ import annotations

import datetime as dt
import os

from ocr_spark.queries import QUERIES


class TestKmvDistinct:
    def _write(self, spark, tmp_path, n_users, types=("a", "b")):
        d = str(tmp_path)
        rows = []
        for i in range(n_users):
            for t in types:
                rows.append((len(rows), dt.datetime(2024, 1, 1, 10), i, t,
                             1.0, "{}"))
        spark.createDataFrame(
            rows, ["event_id", "ts", "user_id", "event_type", "value",
                   "props"]
        ).write.parquet(os.path.join(d, "events.parquet"))
        return d

    def test_below_k_is_exact(self, spark, tmp_path):
        d = self._write(spark, tmp_path, 50)
        out = QUERIES["kmv_distinct"](spark, d).collect()[0].asDict()
        assert out["n_kept"] == 50
        assert out["est_distinct"] == 50
        assert out["exact_distinct"] == 50
        # merged sketch of per-type sketches sees the same universe
        assert out["est_merged"] == 50

    def test_above_k_estimates_and_merge_identity(self, spark, tmp_path):
        d = self._write(spark, tmp_path, 2000)
        out = QUERIES["kmv_distinct"](spark, d).collect()[0].asDict()
        assert out["n_kept"] == 256
        # estimator within 25% of truth at k=256
        assert abs(out["est_distinct"] - 2000) < 500
        # the merge property is exact, not approximate
        assert out["est_merged"] == out["est_distinct"]


class TestGoodTuring:
    def test_hand_counts(self, spark, tmp_path):
        d = str(tmp_path)
        # corpus: 'x' appears 3 times, 'y' and 'z' twice, 'a b c' once
        docs = [
            (0, "x x x y", "en", "s", 7),
            (1, "y z z a", "en", "s", 7),
            (2, "b c", "en", "s", 3),
        ]
        spark.createDataFrame(
            docs, ["doc_id", "text", "lang", "source", "n_chars"]
        ).write.parquet(os.path.join(d, "documents.parquet"))
        out = {r["r"]: r.asDict()
               for r in QUERIES["good_turing_counts"](spark, d).collect()}
        assert len(out) == 10
        # N_1 = 3 (a,b,c), N_2 = 2 (y,z), N_3 = 1 (x)
        assert out[1]["n_r"] == 3 and out[2]["n_r"] == 2
        assert out[3]["n_r"] == 1
        # r*=1: 2*N_2/N_1 = 4/3 -> 1333 milli
        assert out[1]["gt_r_star_milli"] == 1333
        # r*=2: 3*N_3/N_2 = 3/2 -> 1500 milli
        assert out[2]["gt_r_star_milli"] == 1500
        # unseen mass = N_1 / 10 tokens = 3000 bp, only on the r=1 row
        assert out[1]["unseen_mass_bp"] == 3000
        assert out[2]["unseen_mass_bp"] == 0
        # empty tail rows are zeros, not missing
        assert out[10]["n_r"] == 0 and out[10]["gt_r_star_milli"] == 0
