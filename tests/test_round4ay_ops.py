"""Unit tests for round-4 batch: k-NN majority-vote classification."""

from __future__ import annotations

import os

from pyspark.sql.types import (
    ArrayType, FloatType, IntegerType, LongType, StructField, StructType,
)

from ocr_spark.queries import QUERIES


class TestKnnClassify:
    def test_clusters_and_mislabeled_point(self, spark, tmp_path):
        d = str(tmp_path)
        # ids 0-5: cluster A along [10,0], labeled 0
        # ids 6-11: cluster B along [0,10], labeled 1 — EXCEPT id 9,
        # which sits in B but is (wrongly) labeled 0
        rows = []
        for i in range(6):
            rows.append((i, [10.0, 0.0], 0))
        for i in range(6, 12):
            rows.append((i, [0.0, 10.0], 0 if i == 9 else 1))
        schema = StructType([
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(FloatType())),
            StructField("label", IntegerType()),
        ])
        spark.createDataFrame(rows, schema).write.parquet(
            os.path.join(d, "embeddings.parquet"))
        out = {r["qid"]: r.asDict()
               for r in QUERIES["knn_classify"](spark, d).collect()}
        assert len(out) == 10  # queries are ids < 10
        # cluster-A queries: all five neighbors vote 0
        for q in range(6):
            assert out[q]["pred_label"] == 0
            assert out[q]["n_votes"] == 5
            assert out[q]["correct"] == 1
        # clean cluster-B queries: id 9's bad label steals one vote
        for q in (6, 7, 8):
            assert out[q]["pred_label"] == 1
            assert out[q]["n_votes"] == 4
            assert out[q]["correct"] == 1
        # the mislabeled point itself: its true neighbors out-vote its
        # label -> flagged wrong, which is exactly the label-noise audit
        assert out[9]["pred_label"] == 1
        assert out[9]["true_label"] == 0
        assert out[9]["correct"] == 0
