"""Unit tests for round-4 batch: Borůvka minimum spanning forest."""

from __future__ import annotations

import hashlib
import os

from ocr_spark.queries import QUERIES


def _w(a, b):
    h = hashlib.md5(f"mst:{a}:{b}".encode()).hexdigest()[:12]
    return int(h, 16)


class TestBoruvkaMsf:
    def test_two_triangles_and_bridge(self, spark):
        from ocr_spark.functions.graph import boruvka_rounds

        # two triangles joined by a bridge: the MSF must contract to
        # ONE component and the chosen edges are verifiable by hand
        edges = [(1, 2), (2, 3), (3, 1), (4, 5), (5, 6), (6, 4), (3, 4)]
        df = spark.createDataFrame(edges, ["src", "dst"])
        out = {r["round"]: r.asDict()
               for r in boruvka_rounds(df).collect()}
        assert out[1]["n_components_before"] == 6
        # each node picks its min incident edge; the bridge only joins
        # the forest if it is some node's minimum
        assert 3 <= out[1]["n_edges_chosen"] <= 6
        # after two rounds a 6-node graph is fully contracted
        assert out[2]["n_components_after"] == 1
        # round-1 chosen edges: recompute the per-node argmin in python
        incident = {}
        for a, b in edges:
            w = _w(min(a, b), max(a, b))
            for n in (a, b):
                cur = incident.get(n)
                cand = (w, min(a, b), max(a, b))
                if cur is None or cand < cur:
                    incident[n] = cand
        chosen = set(incident.values())
        assert out[1]["n_edges_chosen"] == len(chosen)
        assert out[1]["total_weight"] == sum(w for w, _, _ in chosen)

    def test_disjoint_components_never_merge(self, spark):
        from ocr_spark.functions.graph import boruvka_rounds

        # two disconnected edges: forest = both edges, 2 components
        df = spark.createDataFrame([(1, 2), (5, 6)], ["src", "dst"])
        out = {r["round"]: r.asDict()
               for r in boruvka_rounds(df).collect()}
        assert out[1]["n_components_before"] == 4
        assert out[1]["n_edges_chosen"] == 2
        assert out[1]["n_components_after"] == 2
        # round 2 finds no cross edges: forest is complete
        assert out[2]["n_edges_chosen"] == 0
        assert out[2]["n_components_after"] == 2

    def test_query_on_fixture(self, spark, tmp_path):
        d = str(tmp_path)
        spark.createDataFrame(
            [(i, "t", "en", "s", 1) for i in range(100)],
            ["doc_id", "text", "lang", "source", "n_chars"],
        ).write.parquet(os.path.join(d, "documents.parquet"))
        out = {r["round"]: r.asDict()
               for r in QUERIES["boruvka_msf"](spark, d).collect()}
        assert out[1]["n_components_before"] == 100
        # Borůvka at least halves the component count per round
        assert out[1]["n_components_after"] <= 50
        assert out[2]["n_components_after"] \
            <= out[1]["n_components_after"]
