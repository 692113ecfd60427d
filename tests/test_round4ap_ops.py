"""Unit tests for round-4 batch: local clustering coefficient and
degree assortativity."""

from __future__ import annotations


class TestLocalClustering:
    def test_triangle_with_tail(self, spark):
        from ocr_spark.functions.graph import local_clustering

        # triangle 1-2-3 plus a pendant edge 3-4
        edges = [(1, 2), (2, 3), (3, 1), (3, 4)]
        df = spark.createDataFrame(edges, ["src", "dst"])
        out = {r["node"]: r.asDict() for r in local_clustering(df).collect()}
        assert out[1]["degree"] == 2 and out[1]["n_triangles"] == 1
        assert out[1]["clustering_bp"] == 10000
        assert out[2]["clustering_bp"] == 10000
        # node 3: deg 3, one triangle -> 2*1/(3*2) = 3333 bp
        assert out[3]["degree"] == 3
        assert out[3]["clustering_bp"] == 3333
        # pendant node: degree 1, coefficient undefined -> 0
        assert out[4]["degree"] == 1 and out[4]["clustering_bp"] == 0

    def test_direction_and_duplicates_ignored(self, spark):
        from ocr_spark.functions.graph import local_clustering

        # same triangle given with reversed/duplicated directed edges
        edges = [(1, 2), (2, 1), (2, 3), (1, 3), (3, 1)]
        df = spark.createDataFrame(edges, ["src", "dst"])
        out = {r["node"]: r.asDict() for r in local_clustering(df).collect()}
        assert all(out[n]["clustering_bp"] == 10000 for n in (1, 2, 3))


class TestDegreeAssortativity:
    def test_path_is_disassortative(self, spark):
        from ocr_spark.functions.graph import degree_assortativity

        # path 1-2-3: the middle node (deg 2) only touches leaves (deg 1)
        df = spark.createDataFrame([(1, 2), (2, 3)], ["src", "dst"])
        out = degree_assortativity(df).collect()[0].asDict()
        # samples (1,2),(2,1),(2,1),(1,2): M=4, sx=6, sxy=8, sxx=10
        assert out["n_samples"] == 4
        assert out["sum_deg"] == 6
        assert out["sum_xy"] == 8
        assert out["sum_xx"] == 10
        # r = (32-36)/(40-36) = -1
        assert out["assort_bp"] == -10000

    def test_regular_graph_zero_variance_guard(self, spark):
        from ocr_spark.functions.graph import degree_assortativity

        # triangle: every degree equal -> variance 0 -> defined as 0
        df = spark.createDataFrame([(1, 2), (2, 3), (3, 1)], ["src", "dst"])
        out = degree_assortativity(df).collect()[0].asDict()
        assert out["assort_bp"] == 0
