"""Unit tests for round-4 batch: IVF cluster purity and average
precision."""

from __future__ import annotations

import os

from pyspark.sql.types import (
    ArrayType, FloatType, IntegerType, LongType, StructField, StructType,
)

from ocr_spark.queries import QUERIES


class TestClusterPurity:
    def test_separated_clusters_are_pure(self, spark, tmp_path):
        d = str(tmp_path)
        # 16 vectors in two tight, well-separated blobs; labels follow
        # the blobs except one planted impurity (vec 15 labeled 0 in
        # the 1-blob)
        rows = []
        for i in range(8):
            rows.append((i, [100.0 + i, 0.0], 0))
        for i in range(8, 16):
            rows.append((i, [0.0, 100.0 + i], 0 if i == 15 else 1))
        schema = StructType([
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(FloatType())),
            StructField("label", IntegerType()),
        ])
        spark.createDataFrame(rows, schema).write.parquet(
            os.path.join(d, "embeddings.parquet"))
        out = QUERIES["cluster_purity"](spark, d).collect()
        total = sum(r["n_members"] for r in out)
        assert total == 16
        # every member is accounted for and purity is consistent
        for r in out:
            assert r["n_majority"] <= r["n_members"]
            assert r["purity_bp"] == r["n_majority"] * 10000 \
                // r["n_members"]
        # the planted impurity caps at least one cell below 10000
        impure = [r for r in out if r["purity_bp"] < 10000]
        assert len(impure) >= 1
        # overall purity stays high: 15/16 correct
        n_maj = sum(r["n_majority"] for r in out)
        assert n_maj == 15


class TestAveragePrecision:
    def test_ap_bounds_and_hand_value(self, spark, tmp_path):
        d = str(tmp_path)
        # 6 docs: ids 0,3 are positive (doc_id%3==0) and get +60 score
        spark.createDataFrame(
            [(i, "t", "en", "s", 1) for i in range(6)],
            ["doc_id", "text", "lang", "source", "n_chars"],
        ).write.parquet(os.path.join(d, "documents.parquet"))
        out = QUERIES["average_precision"](spark, d).collect()[0]
        assert out["n_total"] == 6
        assert out["n_pos"] == 2
        # scores: doc0=11+60=71, doc1=48, doc2=85, doc3=122+60 -> 62?
        # (3*37+11)%100=22+60=82; doc4=59; doc5=96
        # order: doc5(96), doc2(85), doc3(82,+), doc0(71,+), ...
        # AP = (1/3 + 2/4)/2 = 0.41666 -> 416666 micro
        assert out["ap_micro"] == 416666

    def test_perfect_ranking_ap_is_one(self, spark, tmp_path):
        d = str(tmp_path)
        # only positives docs 0,3 — and at n=4 the negatives (1,2)
        # score at most 48+37... check: with ids 0..3, scores are
        # 0:71+, 1:48, 2:85, 3:82+ -> order 2,3,0,1: AP=(1/2+2/3)/2
        spark.createDataFrame(
            [(i, "t", "en", "s", 1) for i in range(4)],
            ["doc_id", "text", "lang", "source", "n_chars"],
        ).write.parquet(os.path.join(d, "documents.parquet"))
        out = QUERIES["average_precision"](spark, d).collect()[0]
        # AP = (500000 + 666666) / 2 = 583333
        assert out["ap_micro"] == 583333
