"""Distributed in-engine model training — the fastText-style quality
classifier of a web-corpus pipeline, expressed as fixed-iteration batch
gradient descent inside ONE lazy Spark program.

Determinism contract (the same discipline as the integer PageRank in
``graph.py``): floating-point SUMs over unordered partitions are the
textbook nondeterminism trap, so every per-document gradient contribution
is quantized to an exact BIGINT micro unit BEFORE the corpus-wide SUM.
Weights are integers in micro units, iteration count is a fixed literal,
and the whole training run + scoring pass is one Catalyst plan — so N
iterations produce bit-identical weights on any engine, any partitioning,
any retry, and a DuckDB twin can unroll the same iterations and match the
value hash exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


def logreg_quality(
    feats: DataFrame,
    id_col: str,
    feature_cols: tuple[str, ...],
    label_col: str,
    n_iters: int = 3,
    lr: float = 3.0,
) -> DataFrame:
    """Train a logistic-regression quality classifier by ``n_iters`` steps
    of full-batch gradient descent and score every row with the final
    weights — the in-engine analog of the fastText / logistic quality
    filters used to gate web corpora (e.g. the GPT-3 / CCNet-style
    quality classifier), for the common case where labels are a corpus
    column (a trusted slice, a language flag) rather than external data.

    ``feats`` must carry integer micro-unit feature columns (BIGINT,
    value*1e6) and a 0/1 integer label. Per iteration, each document
    contributes round((p - y) * 1e6) for the bias and round((p - y) * Fk)
    per feature — exact BIGINTs, so the gradient SUM is order-free — and
    the weight update w -= round(lr * g / n) stays integer micro.

    Scale shape: one broadcast 1-row weights frame per iteration feeding a
    corpus-wide projection + integer SUM with map-side partials (the same
    per-iteration shape as distributed LR in any parameter-server-free
    setup: the model is tiny, the data never moves); scoring reuses the
    final broadcast. No collect, no Python loop over rows — the driver
    only composes the lazy plan.

    Returns (doc, score, pred, label) with score = round(p, 6).
    """
    k = len(feature_cols)
    n = feats.agg(F.count(F.lit(1)).alias("n"))

    def z_of(wcols: list[Column]) -> Column:
        # micro^2 units: w0*1e6 + sum_k wk*Fk, then one double division
        raw = wcols[0] * MICRO
        for j, fc in enumerate(feature_cols):
            raw = raw + wcols[j + 1] * F.col(fc)
        return raw.cast("double") / (MICRO * MICRO)

    def sigmoid(z: Column) -> Column:
        return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))

    weights = n.select(
        *[F.lit(0).cast("bigint").alias(f"w{j}") for j in range(k + 1)],
        F.col("n"),
    )
    for _ in range(n_iters):
        wcols = [F.col(f"w{j}") for j in range(k + 1)]
        p = sigmoid(z_of(wcols))
        r = p - F.col(label_col).cast("double")
        scored = feats.crossJoin(F.broadcast(weights))
        grads = scored.agg(
            F.sum(F.round(r * MICRO).cast("bigint")).alias("g0"),
            *[
                F.sum(F.round(r * F.col(fc)).cast("bigint")).alias(f"g{j + 1}")
                for j, fc in enumerate(feature_cols)
            ],
            F.first("n").alias("n"),
            *[F.first(f"w{j}").alias(f"w{j}") for j in range(k + 1)],
        )
        weights = grads.select(
            *[
                (F.col(f"w{j}")
                 - F.round(F.lit(lr) * F.col(f"g{j}") / F.col("n"))
                 .cast("bigint")).alias(f"w{j}")
                for j in range(k + 1)
            ],
            F.col("n"),
        )
    wcols = [F.col(f"w{j}") for j in range(k + 1)]
    p = sigmoid(z_of(wcols))
    return (
        feats.crossJoin(F.broadcast(weights))
        .select(
            F.col(id_col).alias("doc"),
            F.round(p, 6).alias("score"),
            (p >= 0.5).alias("pred"),
            F.col(label_col).cast("bigint").alias("label"),
        )
    )


def standardize_micro(
    feats: DataFrame, feature_cols: tuple[str, ...]
) -> DataFrame:
    """Deterministic z-score standardization for integer micro-unit
    feature columns — the preprocessing stage full-batch GD needs for a
    shared learning rate to work across feature scales.

    Exactness: mean = round(SUM/n) and var from exact integer sums
    (E[f²] - mean² over BIGINTs), one sqrt, one final round per value —
    so the standardized features are again exact BIGINT micros and every
    downstream gradient stays order-free. Zero-variance features
    standardize to 0 (not NULL, not a division blow-up).

    Scale shape: one agg pass (map-side partials) producing a 1-row stats
    frame, broadcast back over the corpus — the data never moves.
    """
    stats = feats.agg(
        F.count(F.lit(1)).alias("__n"),
        *[F.sum(c).alias(f"__s_{c}") for c in feature_cols],
        *[F.sum(F.col(c) * F.col(c)).alias(f"__s2_{c}") for c in feature_cols],
    )
    out = feats.crossJoin(F.broadcast(stats))
    for c in feature_cols:
        mean = F.round(F.col(f"__s_{c}").cast("double") / F.col("__n")).cast(
            "bigint")
        var = (
            F.col(f"__s2_{c}").cast("double") / F.col("__n")
            - (mean * mean).cast("double")
        )
        std = F.round(F.sqrt(F.greatest(var, F.lit(0.0)))).cast("bigint")
        out = out.withColumn(
            c,
            F.when(
                std > 0,
                F.round((F.col(c) - mean).cast("double") * MICRO / std)
                .cast("bigint"),
            ).otherwise(F.lit(0).cast("bigint")),
        )
    return out.drop("__n", *[f"__s_{c}" for c in feature_cols],
                    *[f"__s2_{c}" for c in feature_cols])
