"""Unit tests for round-4 batch: end-to-end entity resolution."""

from __future__ import annotations

import os

from ocr_spark.queries import QUERIES


class TestEntityResolutionPass:
    def _run(self, spark, tmp_path, custkeys, acctbal=10.0):
        d = str(tmp_path)
        spark.createDataFrame(
            [(ck, f"c{ck}", 0, acctbal, "B") for ck in custkeys],
            ["c_custkey", "c_name", "c_nationkey", "c_acctbal",
             "c_mktsegment"],
        ).write.parquet(os.path.join(d, "customer.parquet"))
        return QUERIES["entity_resolution_pass"](spark, d).collect()

    def test_variants_merge_families_split(self, spark, tmp_path):
        # custkeys 1, 41, 81 are family 1 in variants a/e/i;
        # custkeys 2, 42 are family 2; custkey 3 is a singleton family
        out = self._run(spark, tmp_path, [1, 41, 81, 2, 42, 3])
        ents = {r["entity_id"]: r.asDict() for r in out}
        assert set(ents) == {1, 2, 3}
        assert ents[1]["n_records"] == 3
        assert ents[2]["n_records"] == 2
        assert ents[3]["n_records"] == 1
        # survivorship: canonical name is the min-key record's spelling
        # (variant 'a' for custkey 1) and balances sum exactly
        assert "a" in ents[1]["canonical_name"]
        assert ents[1]["total_acctbal_cents"] == 3000

    def test_no_cross_family_merge(self, spark, tmp_path):
        # families 0..39 one record each: no two may merge even when
        # Soundex blocks collide (edit distance >= 2 across families)
        out = self._run(spark, tmp_path, list(range(40)))
        assert len(out) == 40
        assert all(r["n_records"] == 1 for r in out)
