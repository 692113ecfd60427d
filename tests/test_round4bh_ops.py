"""Unit tests for round-4 batch: transition entropy and length-histogram
overlap."""

from __future__ import annotations

import datetime as dt
import math
import os

from ocr_spark.queries import QUERIES


class TestTransitionEntropy:
    def test_scripted_vs_coin_flip(self, spark, tmp_path):
        d = str(tmp_path)
        rows, eid = [], 0
        # user 1 repeats a->b deterministically: H(a)=0
        for i in range(8):
            rows.append((eid, dt.datetime(2024, 1, 1, 10, 0, eid), 1,
                         "a" if i % 2 == 0 else "b", 1.0, "{}"))
            eid += 1
        # user 2 alternates c's successor between d and e evenly:
        # H(c) = ln 2
        for nxt in ("d", "e") * 4:
            rows.append((eid, dt.datetime(2024, 1, 1, 11, 0, eid), 2,
                         "c", 1.0, "{}"))
            eid += 1
            rows.append((eid, dt.datetime(2024, 1, 1, 11, 0, eid), 2,
                         nxt, 1.0, "{}"))
            eid += 1
        spark.createDataFrame(
            rows, ["event_id", "ts", "user_id", "event_type", "value",
                   "props"]
        ).write.parquet(os.path.join(d, "events.parquet"))
        out = {r["event_type"]: r.asDict()
               for r in QUERIES["transition_entropy"](spark, d).collect()}
        assert out["a"]["h_micro_nats"] == 0
        assert out["a"]["n_successors"] == 1
        # c -> d half the time, e half the time (the d/e rows also
        # transition back to c, which only affects H(d), H(e))
        assert out["c"]["n_successors"] == 2
        assert abs(out["c"]["h_micro_nats"]
                   - round(math.log(2) * 1000000)) <= 1


class TestLengthHistogramOverlap:
    def test_identical_and_disjoint(self, spark, tmp_path):
        d = str(tmp_path)
        docs = []
        i = 0
        # sources s1/s2: identical length mix -> overlap 10000 bp
        for src in ("s1", "s2"):
            for n in (50, 150, 250, 250):
                docs.append((i, "t", "en", src, n))
                i += 1
        # source s3: all docs in a bucket s1 never uses -> overlap 0
        for n in (1950, 1999):
            docs.append((i, "t", "en", "s3", n))
            i += 1
        spark.createDataFrame(
            docs, ["doc_id", "text", "lang", "source", "n_chars"]
        ).write.parquet(os.path.join(d, "documents.parquet"))
        out = {(r["source_a"], r["source_b"]): r.asDict()
               for r in QUERIES["length_histogram_overlap"](spark, d)
               .collect()}
        assert out[("s1", "s2")]["overlap_bp"] == 10000
        # disjoint pairs share no bucket row, so they simply don't
        # appear (bucket-join semantics); s1-s3 absent
        assert ("s1", "s3") not in out

    def test_partial_overlap_exact(self, spark, tmp_path):
        d = str(tmp_path)
        docs = []
        i = 0
        # s1: 3 docs bucket0, 1 doc bucket1; s2: 1 and 3.
        for n, src in ((50, "s1"), (50, "s1"), (50, "s1"), (150, "s1"),
                       (50, "s2"), (150, "s2"), (150, "s2"),
                       (150, "s2")):
            docs.append((i, "t", "en", src, n))
            i += 1
        spark.createDataFrame(
            docs, ["doc_id", "text", "lang", "source", "n_chars"]
        ).write.parquet(os.path.join(d, "documents.parquet"))
        out = QUERIES["length_histogram_overlap"](spark, d).collect()[0]
        # overlap = min(3/4,1/4) + min(1/4,3/4) = 1/2 -> 5000 bp
        assert out["overlap_bp"] == 5000
