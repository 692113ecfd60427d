"""Unit tests for round-4 batch: bucketized GeoIP range join and exact
audience-overlap Jaccard."""

from __future__ import annotations

import datetime as dt
import os

from ocr_spark.queries import QUERIES


class TestIpGeoLookup:
    def test_bucketized_equals_between(self, spark, tmp_path):
        d = str(tmp_path)
        # event_ids chosen so (id * 2654435761) % 2^32 is easy to place:
        # id 0 -> ip 0 (C0); id 1 -> 2654435761 (C5: 2.5e9..3.3e9);
        # id 2 -> 1013904226 (C2: 7e8..1.2e9)
        rows = [(i, dt.datetime(2024, 1, 1), 1, "a", 1.0, "{}")
                for i in range(3)]
        spark.createDataFrame(
            rows, ["event_id", "ts", "user_id", "event_type", "value",
                   "props"]
        ).write.parquet(os.path.join(d, "events.parquet"))
        out = {r["cc"]: r.asDict()
               for r in QUERIES["ip_geo_lookup"](spark, d).collect()}
        assert out["C0"]["n_ips"] == 1 and out["C0"]["min_ip"] == 0
        assert out["C5"]["n_ips"] == 1
        assert out["C5"]["min_ip"] == 2654435761
        assert out["C2"]["n_ips"] == 1
        assert out["C2"]["min_ip"] == (2 * 2654435761) % 4294967296
        # every synthetic ip found exactly one country
        assert sum(v["n_ips"] for v in out.values()) == 3

    def test_plan_is_broadcast_not_nested_loop(self, spark):
        df = QUERIES["ip_geo_lookup"](spark, "/root/testdata/sf0.001")
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestAudienceOverlap:
    def test_exact_jaccard(self, spark, tmp_path):
        d = str(tmp_path)
        # users: 1 -> {a,b}; 2 -> {a,b,c}; 3 -> {a}; 4 -> {c}
        rows, eid = [], 0
        for u, types in [(1, "ab"), (2, "abc"), (3, "a"), (4, "c")]:
            for t in types:
                # duplicate events must not inflate the distinct sets
                for _ in range(2):
                    rows.append((eid, dt.datetime(2024, 1, 1), u, t,
                                 1.0, "{}"))
                    eid += 1
        spark.createDataFrame(
            rows, ["event_id", "ts", "user_id", "event_type", "value",
                   "props"]
        ).write.parquet(os.path.join(d, "events.parquet"))
        out = {(r["t1"], r["t2"]): r.asDict()
               for r in QUERIES["audience_overlap"](spark, d).collect()}
        # a: {1,2,3}, b: {1,2}, c: {2,4}
        ab = out[("a", "b")]
        assert ab["inter"] == 2 and ab["n1"] == 3 and ab["n2"] == 2
        assert ab["jaccard_bp"] == 2 * 10000 // 3
        ac = out[("a", "c")]
        assert ac["inter"] == 1 and ac["jaccard_bp"] == 10000 // 4
        bc = out[("b", "c")]
        assert bc["inter"] == 1 and bc["n2"] == 2
        assert bc["jaccard_bp"] == 10000 // 3
        assert len(out) == 3
