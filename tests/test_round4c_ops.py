"""Differential tests for the distributed ML-training primitives:
normal-equations gram moments and integer power-iteration PCA."""

from __future__ import annotations

import numpy as np

from ocr_spark.functions.similarity import gram_moments, pca_power_projection

SCALE = 1 << 20


def _mk(spark, vecs, labels):
    rows = [(i, [float(x) for x in v], int(y))
            for i, (v, y) in enumerate(zip(vecs, labels))]
    return spark.createDataFrame(rows, ["vec_id", "embedding", "label"])


def _quant(vecs, labels):
    q = np.round(np.asarray(vecs, dtype=np.float64) * SCALE).astype(np.int64)
    y = (np.asarray(labels, dtype=np.int64) * SCALE)[:, None]
    return np.hstack([q, y])


class TestGramMoments:
    def test_matches_numpy_exactly(self, spark):
        rng = np.random.RandomState(7)
        vecs = rng.randn(20, 5) * 0.3
        labels = rng.randint(0, 3, 20)
        df = _mk(spark, vecs, labels)
        out = {(r["i"], r["j"]): r["s_q"]
               for r in gram_moments(df, "vec_id", "embedding", "label").collect()}
        aug = _quant(vecs, labels)
        expect = aug.T @ aug  # exact: int64 products fit easily at this size
        d1 = aug.shape[1]
        assert len(out) == d1 * (d1 + 1) // 2
        for i in range(d1):
            for j in range(i, d1):
                assert out[(i + 1, j + 1)] == expect[i, j], (i, j)

    def test_partition_invariance(self, spark):
        rng = np.random.RandomState(3)
        vecs = rng.randn(30, 4) * 0.2
        labels = rng.randint(0, 2, 30)
        df = _mk(spark, vecs, labels)
        a = sorted(map(tuple, gram_moments(
            df, "vec_id", "embedding", "label").collect()))
        b = sorted(map(tuple, gram_moments(
            df.repartition(7), "vec_id", "embedding", "label").collect()))
        assert a == b


class TestPcaPowerProjection:
    def test_direction_matches_numpy_eigenvector(self, spark):
        # strongly anisotropic cloud: first axis dominates
        rng = np.random.RandomState(11)
        base = rng.randn(60, 6) * 0.05
        base[:, 0] += rng.randn(60) * 0.5
        df = _mk(spark, base, np.zeros(60, dtype=int))
        proj = {r["id"]: r["proj_micro"]
                for r in pca_power_projection(df, "vec_id", "embedding").collect()}
        q = np.round(base * SCALE).astype(np.int64).astype(np.float64)
        g = (q.T @ q) / SCALE
        evals, evecs = np.linalg.eigh(g)
        top = evecs[:, -1]
        ref = q @ top
        got = np.array([proj[i] for i in range(60)], dtype=np.float64)
        # same direction up to sign and scale: |cosine| ~ 1
        cos = abs(got @ ref) / (np.linalg.norm(got) * np.linalg.norm(ref))
        assert cos > 0.999, cos

    def test_deterministic_across_partitionings(self, spark):
        rng = np.random.RandomState(5)
        vecs = rng.randn(40, 4) * 0.3
        df = _mk(spark, vecs, np.zeros(40, dtype=int))
        a = sorted(map(tuple, pca_power_projection(
            df, "vec_id", "embedding").collect()))
        b = sorted(map(tuple, pca_power_projection(
            df.repartition(9), "vec_id", "embedding").collect()))
        assert a == b

    def test_degenerate_all_zero_vectors(self, spark):
        df = _mk(spark, np.zeros((5, 3)), np.zeros(5, dtype=int))
        out = pca_power_projection(df, "vec_id", "embedding").collect()
        assert len(out) == 5 and all(r["proj_micro"] == 0 for r in out)
