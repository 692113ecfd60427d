"""Unit tests for round-4 batch: modularity of LPA communities and
consistent-hash ring assignment."""

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


class TestModularity:
    def test_invariants_on_host_graph(self, spark, tmp_path):
        d = _write_docs(spark, tmp_path, 200)
        out = QUERIES["modularity"](spark, d).collect()[0].asDict()
        # modularity is bounded in [-10000, 10000] bp
        assert -10000 <= out["q_bp"] <= 10000
        assert 0 <= out["intra_edges"] <= out["m_edges"]
        assert out["n_communities"] >= 1

    def test_two_cliques_high_modularity(self, spark):
        from ocr_spark.functions.graph import label_propagation
        from pyspark.sql import functions as F

        # two disjoint triangles: LPA converges to one community per
        # clique; Q = 2 * (3/6 - (6/12)^2) = 0.5 exactly
        edges = [(1, 2), (2, 3), (3, 1), (4, 5), (5, 6), (6, 4)]
        df = spark.createDataFrame(edges, ["src", "dst"])
        lab = label_propagation(df)
        comm = {r["node"]: r["community"] for r in lab.collect()}
        assert comm[1] == comm[2] == comm[3]
        assert comm[4] == comm[5] == comm[6]
        assert comm[1] != comm[4]
        # reproduce the query's integer math by hand on this partition:
        # per clique: 4*m*e_c - d_c^2 = 4*6*3 - 36 = 36; total 72;
        # q_bp = 72 * 10000 // (4*36) = 5000
        und = (df.select(F.least("src", "dst").alias("a"),
                         F.greatest("src", "dst").alias("b"))
               .distinct())
        assert und.count() == 6


class TestConsistentHashRing:
    def test_movement_only_to_new_node(self, spark, tmp_path):
        d = _write_docs(spark, tmp_path, 1200)
        rows = QUERIES["consistent_hash_ring"](spark, d).collect()
        total = sum(r["n_docs"] for r in rows)
        assert total == 1200
        moved = [r for r in rows if r["moved"] == 1]
        stayed = [r for r in rows if r["moved"] == 0]
        # THE consistent-hashing contract: every mover lands on the
        # NEW node (5); no doc is reshuffled between old nodes
        assert all(r["owner6"] == 5 for r in moved)
        assert all(r["owner5"] == r["owner6"] for r in stayed)
        # movement is ~1/6 of the corpus, smoothed by 50 vnodes
        n_moved = sum(r["n_docs"] for r in moved)
        assert 0.05 * total < n_moved < 0.35 * total

    def test_balance(self, spark, tmp_path):
        d = _write_docs(spark, tmp_path, 1200)
        rows = QUERIES["consistent_hash_ring"](spark, d).collect()
        per_owner6 = {}
        for r in rows:
            per_owner6[r["owner6"]] = (per_owner6.get(r["owner6"], 0)
                                       + r["n_docs"])
        # all six owners get a share, none starves or hoards
        assert set(per_owner6) == set(range(6))
        assert max(per_owner6.values()) < 3 * min(per_owner6.values())
