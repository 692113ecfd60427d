"""Unit tests for round-4 batch: edge embeddedness / local bridges."""

from __future__ import annotations


class TestEdgeEmbeddedness:
    def _run(self, spark, edges):
        """Drive the query's core join shape directly on a hand graph
        (the query wrapper binds the shared host-graph fixture)."""
        from pyspark.sql import functions as F

        df = spark.createDataFrame(edges, ["src", "dst"])
        sym = (df.select("src", "dst")
               .unionByName(df.select(F.col("dst").alias("src"),
                                      F.col("src").alias("dst")))
               .filter(F.col("src") != F.col("dst")).distinct()
               .select(F.col("src").alias("u"), F.col("dst").alias("v")))
        und = (df.select(F.least("src", "dst").alias("a"),
                         F.greatest("src", "dst").alias("b"))
               .filter(F.col("a") != F.col("b")).distinct())
        na = sym.select(F.col("u").alias("a"), F.col("v").alias("c"))
        nb = sym.select(F.col("u").alias("b"), F.col("v").alias("c"))
        common = (und.join(na, "a").join(nb, ["b", "c"])
                  .filter((F.col("c") != F.col("a"))
                          & (F.col("c") != F.col("b")))
                  .groupBy("a", "b")
                  .agg(F.count(F.lit(1)).alias("n_common")))
        out = (und.join(common, ["a", "b"], "left")
               .select("a", "b",
                       F.coalesce("n_common", F.lit(0))
                       .alias("n_common")))
        return {(r["a"], r["b"]): r["n_common"] for r in out.collect()}

    def test_bridge_between_triangles(self, spark):
        # two triangles joined by the bridge 3-4
        edges = [(1, 2), (2, 3), (3, 1), (4, 5), (5, 6), (6, 4), (3, 4)]
        out = self._run(spark, edges)
        # triangle edges are embedded (1 common neighbor each)
        assert out[(1, 2)] == 1 and out[(2, 3)] == 1
        assert out[(4, 5)] == 1 and out[(5, 6)] == 1
        # the inter-community edge has no common neighbor: local bridge
        assert out[(3, 4)] == 0

    def test_shared_square_no_triangle(self, spark):
        # 4-cycle: every edge has zero common neighbors (no triangles),
        # so every edge is a local bridge despite the cycle
        edges = [(1, 2), (2, 3), (3, 4), (4, 1)]
        out = self._run(spark, edges)
        assert all(v == 0 for v in out.values())

    def test_query_registered_on_fixture(self, spark, tmp_path):
        import os

        from ocr_spark.queries import QUERIES

        d = str(tmp_path)
        spark.createDataFrame(
            [(i, "t", "en", "s", 1) for i in range(100)],
            ["doc_id", "text", "lang", "source", "n_chars"],
        ).write.parquet(os.path.join(d, "documents.parquet"))
        rows = QUERIES["edge_embeddedness"](spark, d).collect()
        assert len(rows) > 0
        assert all(r["is_local_bridge"] in (0, 1) for r in rows)
        assert all((r["n_common"] == 0) == (r["is_local_bridge"] == 1)
                   for r in rows)
