"""Tests for the round-4e batch: merged-HLL incremental distinct, HTTP
revalidation planning, and homoglyph spoof detection."""

from __future__ import annotations

from ocr_spark.functions.curation import hll_merged_daily


def _rows(df, key):
    return {r[key]: r.asDict() for r in df.collect()}


class TestHllMergedDaily:
    def test_merge_equals_recompute_and_estimates_track_exact(self, spark):
        # 3 days, overlapping user sets: d1 = 0..99, d2 = 50..149, d3 = 100..199
        rows = []
        for d, lo in [("d1", 0), ("d2", 50), ("d3", 100)]:
            rows += [(d, f"u{u}") for u in range(lo, lo + 100)]
        df = spark.createDataFrame(rows, ["day", "uid"])
        out = _rows(hll_merged_daily(df, "uid", "day"), "scope")
        assert set(out) == {"d1", "d2", "d3", "ALL"}
        assert out["ALL"]["exact_distinct"] == 200
        # small-range-corrected estimates land within 15% at these sizes
        for scope, exact in [("d1", 100), ("d2", 100), ("d3", 100),
                             ("ALL", 200)]:
            est = out[scope]["est_distinct"]
            assert abs(est - exact) / exact < 0.15, (scope, est)

    def test_all_row_is_register_merge_not_sum(self, spark):
        # identical days: merged distinct == per-day distinct, NOT 2x
        rows = [(d, f"u{u}") for d in ("d1", "d2") for u in range(80)]
        df = spark.createDataFrame(rows, ["day", "uid"])
        out = _rows(hll_merged_daily(df, "uid", "day"), "scope")
        assert out["ALL"]["sum_scaled"] == out["d1"]["sum_scaled"]
        assert out["ALL"]["est_distinct"] == out["d1"]["est_distinct"]

    def test_partition_invariance(self, spark):
        rows = [("d1", f"u{u}") for u in range(200)]
        df = spark.createDataFrame(rows, ["day", "uid"])
        a = sorted(map(tuple, hll_merged_daily(df, "uid", "day").collect()))
        b = sorted(map(tuple, hll_merged_daily(
            df.repartition(13), "uid", "day").collect()))
        assert a == b


class TestRevalidationPlan:
    def test_rfc9111_priority_order(self, spark, tmp_path):
        # doc 0: %3==0 fresh (age 0 < 3600) AND %4==0 -> freshness wins: skip
        # doc 9: %3==0, age 9 < 3600 -> skip
        # doc 1: %4==1 etag -> revalidate_etag
        # doc 2: %4==2 last-modified -> revalidate_ims
        # doc 7: %3!=0, %4==3 -> fetch
        import os

        from ocr_spark.queries import QUERIES
        docs = spark.createDataFrame(
            [(i, "t", "en", "s", 1) for i in (0, 1, 2, 7, 9)],
            ["doc_id", "text", "lang", "source", "n_chars"])
        docs.write.parquet(os.path.join(str(tmp_path), "documents.parquet"))
        out = {r["doc_id"]: r["action"]
               for r in QUERIES["revalidation_plan"](
                   spark, str(tmp_path)).collect()}
        assert out[0] == "skip" and out[9] == "skip"
        assert out[1] == "revalidate_etag"
        assert out[2] == "revalidate_ims"
        assert out[7] == "fetch"


class TestHomoglyphFold:
    def test_mixed_script_tokens_flagged(self, spark, tmp_path):
        import os

        from ocr_spark.queries import QUERIES
        # doc 3 (%4==3): no planted spoof, pure-ASCII text -> 0
        # doc 4 (%4==0): ' pаypаl account' appended -> exactly 1 spoof token
        # doc 5 (%4==1): ' сrуpto wallet' appended -> exactly 1 spoof token
        docs = spark.createDataFrame(
            [(3, "plain ascii words here", "en", "s", 1),
             (4, "plain ascii words here", "en", "s", 1),
             (5, "plain ascii words here", "en", "s", 1)],
            ["doc_id", "text", "lang", "source", "n_chars"])
        docs.write.parquet(os.path.join(str(tmp_path), "documents.parquet"))
        out = {r["doc_id"]: r.asDict()
               for r in QUERIES["homoglyph_fold"](
                   spark, str(tmp_path)).collect()}
        assert out[3]["n_spoofed"] == 0 and out[3]["spoof_bp"] == 0
        assert out[4]["n_spoofed"] == 1 and out[4]["n_tokens"] == 6
        assert out[5]["n_spoofed"] == 1
        # pure-Cyrillic words (no ASCII mixed in) must NOT flag: that's
        # legitimate non-Latin text, not spoofing
        docs2 = spark.createDataFrame(
            [(3, "привет мир", "ru", "s", 1)],
            ["doc_id", "text", "lang", "source", "n_chars"])
        d2 = os.path.join(str(tmp_path), "v2")
        os.makedirs(d2)
        docs2.write.parquet(os.path.join(d2, "documents.parquet"))
        out2 = {r["doc_id"]: r.asDict()
                for r in QUERIES["homoglyph_fold"](spark, d2).collect()}
        assert out2[3]["n_spoofed"] == 0
