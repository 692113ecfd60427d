"""Unit tests for round-4 batch: Markov two-step matrix, JSON key
presence audit, and static cache hit-rate curve."""

from __future__ import annotations

import datetime as dt
import os

from ocr_spark.queries import QUERIES


class TestMarkovTwoStep:
    def test_deterministic_chain(self, spark, tmp_path):
        d = str(tmp_path)
        # one user walks a -> b -> c -> a -> b -> c: P(a->b)=1,
        # P(b->c)=1, P(c->a)=1 exactly; two-step P2(a->c)=1 etc.
        rows = []
        seqs = ["a", "b", "c", "a", "b", "c"]
        for i, t in enumerate(seqs):
            rows.append((i, dt.datetime(2024, 1, 1, 10, i), 1, t, 1.0,
                         "{}"))
        spark.createDataFrame(
            rows, ["event_id", "ts", "user_id", "event_type", "value",
                   "props"]
        ).write.parquet(os.path.join(d, "events.parquet"))
        out = {(r["from_type"], r["to_type"]): r.asDict()
               for r in QUERIES["markov_two_step"](spark, d).collect()}
        assert out[("a", "c")]["p2_ppm"] == 1000000
        assert out[("a", "c")]["p1_ppm"] == 0
        assert out[("b", "a")]["p2_ppm"] == 1000000
        assert ("a", "b") not in out  # unreachable in exactly 2 steps

    def test_split_paths(self, spark, tmp_path):
        d = str(tmp_path)
        # from 'a' half the users go b, half go c; both always -> d
        rows, eid = [], 0
        for u, mid in ((1, "b"), (2, "c")):
            for i, t in enumerate(["a", mid, "d"]):
                rows.append((eid, dt.datetime(2024, 1, 1, 10, i), u, t,
                             1.0, "{}"))
                eid += 1
        spark.createDataFrame(
            rows, ["event_id", "ts", "user_id", "event_type", "value",
                   "props"]
        ).write.parquet(os.path.join(d, "events.parquet"))
        out = {(r["from_type"], r["to_type"]): r.asDict()
               for r in QUERIES["markov_two_step"](spark, d).collect()}
        # P(a->b)=P(a->c)=1/2, P(b->d)=P(c->d)=1 -> P2(a->d)=1
        assert out[("a", "d")]["p2_ppm"] == 1000000
        assert out[("a", "d")]["p1_ppm"] == 0


class TestJsonKeyPresence:
    def test_presence_types_and_malformed(self, spark, tmp_path):
        d = str(tmp_path)
        rows = [
            (0, dt.datetime(2024, 1, 1), 1, "a", 1.0, '{"k": 1}'),
            (1, dt.datetime(2024, 1, 1), 1, "a", 1.0,
             '{"k": 2, "tag": "x"}'),
            (2, dt.datetime(2024, 1, 1), 1, "a", 1.0, '{"k": "oops"}'),
            (3, dt.datetime(2024, 1, 1), 1, "a", 1.0, 'not json'),
        ]
        spark.createDataFrame(
            rows, ["event_id", "ts", "user_id", "event_type", "value",
                   "props"]
        ).write.parquet(os.path.join(d, "events.parquet"))
        out = {r["key_name"]: r.asDict()
               for r in QUERIES["json_key_presence"](spark, d).collect()}
        assert out["k"]["n_present"] == 3
        assert out["k"]["presence_bp"] == 7500
        # one of k's values is a string, caught by the type audit
        assert out["k"]["n_int_values"] == 2
        assert out["k"]["n_other_values"] == 1
        assert out["tag"]["n_present"] == 1
        assert out["tag"]["n_other_values"] == 1


class TestStaticCacheHit:
    def test_zipf_curve(self, spark, tmp_path):
        d = str(tmp_path)
        # part 1: 70 accesses; parts 2-11: 2 each; parts 12-61: 1 each
        rows = []
        def add(p, times):
            for _ in range(times):
                rows.append((len(rows), p, 1, 1, 1.0, 1.0, 0.0, 0.0,
                             "N", "O", dt.datetime(2024, 1, 1)))
        add(1, 70)
        for p in range(2, 12):
            add(p, 2)
        for p in range(12, 62):
            add(p, 1)
        spark.createDataFrame(
            rows, ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
                   "l_quantity", "l_extendedprice", "l_discount", "l_tax",
                   "l_returnflag", "l_linestatus", "l_shipdate"]
        ).write.parquet(os.path.join(d, "lineitem.parquet"))
        out = {r["k"]: r.asDict()
               for r in QUERIES["static_cache_hit"](spark, d).collect()}
        total = 70 + 20 + 50
        assert out[10]["total_accesses"] == total
        # top-10 = part 1 + nine of the 2-access parts
        assert out[10]["hits"] == 70 + 18
        assert out[20]["hits"] == 70 + 20 + 9
        assert out[50]["hits"] == 70 + 20 + 39
        assert out[10]["hit_bp"] == (70 + 18) * 10000 // total
