"""Unit tests for round-4 batch: degree h-index and k-anonymity audit."""

from __future__ import annotations

import os

from ocr_spark.queries import QUERIES


def _write_docs(spark, tmp_path, n):
    d = str(tmp_path)
    spark.createDataFrame(
        [(i, "t", "en", "s", 1) for i in range(n)],
        ["doc_id", "text", "lang", "source", "n_chars"],
    ).write.parquet(os.path.join(d, "documents.parquet"))
    return d


class TestDegreeHIndex:
    def test_h_index_invariants(self, spark, tmp_path):
        d = _write_docs(spark, tmp_path, 150)
        out = QUERIES["degree_h_index"](spark, d).collect()[0]
        # h is bounded by both the host count and the max in-degree
        assert 1 <= out["h_index"] <= out["n_hosts"]
        assert out["h_index"] <= out["max_indeg"]

    def test_hand_distribution(self, spark):
        # verify the windowed definition on a hand case through the
        # same expressions: degrees [5,4,2,1] -> h = 2
        from pyspark.sql import functions as F
        from pyspark.sql.window import Window

        df = spark.createDataFrame(
            [(1, 5), (2, 4), (3, 2), (4, 1)], ["node", "indeg"])
        ranked = df.select(
            "indeg",
            F.row_number().over(
                Window.orderBy(F.col("indeg").desc(), "node"))
            .alias("rk"))
        h = ranked.agg(F.max(F.when(
            F.col("indeg") >= F.col("rk"), F.col("rk")))).collect()[0][0]
        assert h == 2


class TestKAnonymityAudit:
    def test_class_sizes_and_flags(self, spark, tmp_path):
        d = str(tmp_path)
        rows = []
        # class (0, B): 6 members with varied balances -> k ok, l ok
        for i in range(6):
            rows.append((i, f"c{i}", 0, 1000.0 * (i + 1), "B"))
        # class (1, B): 2 members, identical balance bucket -> both
        # violations
        rows.append((10, "c10", 1, 500.0, "B"))
        rows.append((11, "c11", 1, 600.0, "B"))
        spark.createDataFrame(
            rows, ["c_custkey", "c_name", "c_nationkey", "c_acctbal",
                   "c_mktsegment"],
        ).write.parquet(os.path.join(d, "customer.parquet"))
        out = {(r["nation"], r["segment"]): r.asDict()
               for r in QUERIES["k_anonymity_audit"](spark, d).collect()}
        big = out[(0, "B")]
        assert big["k_size"] == 6 and big["violates_k5"] == 0
        assert big["l_diversity"] == 6 and big["violates_l2"] == 0
        small = out[(1, "B")]
        assert small["k_size"] == 2 and small["violates_k5"] == 1
        # 50000 and 60000 cents are both bucket 0 -> l = 1
        assert small["l_diversity"] == 1 and small["violates_l2"] == 1
