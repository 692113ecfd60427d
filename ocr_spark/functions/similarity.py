"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the correctness baseline; the LSH-bucketed
variant (random-hyperplane signs from deterministic md5-derived planes) is
the scale path — at 100 TB the cross join is replaced by a bucket-local join
keyed on the sign signature.

All math is native: zip_with/aggregate higher-order functions on double
arrays inside whole-stage codegen. Results are rounded before ranking so the
DuckDB oracle (float32 kernels) agrees bit-for-bit on the hashed output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ROUND = 6


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))


def cosine(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(df: DataFrame, id_col: str, vec_col: str,
                     k: int = 5, n_queries: int = 10) -> DataFrame:
    """Top-k cosine neighbors for the first n_queries ids (brute force).

    The query side is tiny -> broadcast; the corpus side streams through one
    codegen'd projection. Ties broken by neighbor id for determinism."""
    from pyspark.sql.window import Window

    base = df.select(
        F.col(id_col).alias("nid"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("nvec"),
    )
    queries = base.filter(F.col("nid") < n_queries).select(
        F.col("nid").alias("qid"), F.col("nvec").alias("qvec")
    )
    scored = base.join(F.broadcast(queries), F.col("nid") != F.col("qid")).select(
        "qid", "nid", F.round(cosine(F.col("qvec"), F.col("nvec")), ROUND).alias("cos")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "nid", "cos", "rank")
    )


def l2sq(a, b):
    """Squared L2 distance, sequential fold (identical op order cross-engine)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0), lambda acc, v: acc + v,
    )


FIXED_POINT = 1 << 30  # int64 fixed-point scale for order-free vector sums


def _seed_centroids(base: DataFrame, n_centroids: int) -> DataFrame:
    """Deterministic seeding: the first ``n_centroids`` vectors by id."""
    return base.filter(F.col("nid") < n_centroids).select(
        F.col("nid").cast("int").alias("cid"), F.col("nvec").alias("cvec")
    )


def _assign_cells(base: DataFrame, cents: DataFrame) -> DataFrame:
    """(nid, nvec, cell): nearest centroid by squared-L2, ties to the lowest
    centroid id. Broadcast fan-out (K small) + one shuffle on nid for the
    argmin — never an all-pairs join."""
    from pyspark.sql.window import Window

    d = base.join(F.broadcast(cents)).select(
        "nid", "nvec", "cid",
        F.round(l2sq(F.col("nvec"), F.col("cvec")), ROUND).alias("dist"),
    )
    w = Window.partitionBy("nid").orderBy(F.asc("dist"), F.asc("cid"))
    return (
        d.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("nid", "nvec", F.col("cid").alias("cell"))
    )


def train_centroids(df: DataFrame, id_col: str, vec_col: str,
                    n_centroids: int = 8, n_iters: int = 2) -> DataFrame:
    """Deterministic fixed-iteration Lloyd's k-means -> (cid, cvec).

    Seeding is the first ``n_centroids`` vectors by id; each iteration
    re-assigns every vector (broadcast centroid fan-out, shuffle on nid)
    and recomputes each centroid as the element-wise mean of its members.
    Cross-engine exactness: components are quantized to int64 fixed-point
    (round(x * 2^30)) before summing, so the per-cell SUM is
    order-independent, and the mean is the fixed final expression
    ``round((sum / 2^30) / count, 6)`` — the DuckDB oracle unrolls the
    same iterations and reproduces every centroid bit-for-bit. Cells left
    empty by an iteration keep their previous centroid.

    Scale shape: per iteration, the heavy side is one pass over the
    vectors plus a (cell, pos) hash aggregation whose result is K x dim
    rows — the classic distributed-k-means reduce; nothing on the driver
    but the plan."""
    base = df.select(
        F.col(id_col).alias("nid"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("nvec"),
    )
    cents = _seed_centroids(base, n_centroids)
    for _ in range(n_iters):
        assigned = _assign_cells(base, cents)
        comp = (
            assigned.select("cell", F.posexplode("nvec").alias("pos", "v"))
            .select(
                "cell", "pos",
                F.round(F.col("v") * FIXED_POINT).cast("bigint").alias("q"),
            )
            .groupBy("cell", "pos")
            .agg(F.sum("q").alias("sq"), F.count(F.lit(1)).alias("n"))
            .select(
                "cell", "pos",
                F.round((F.col("sq") / F.lit(float(FIXED_POINT))) / F.col("n"),
                        ROUND).alias("comp"),
            )
        )
        newc = (
            comp.groupBy("cell")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "comp"))).alias("pc"))
            .select(
                F.col("cell").alias("cid"),
                F.transform(F.col("pc"), lambda s: s["comp"]).alias("cvec"),
            )
        )
        # empty cells keep their previous centroid
        cents = (
            cents.alias("old")
            .join(newc.alias("new"), "cid", "left")
            .select(
                "cid",
                F.coalesce(F.col("new.cvec"), F.col("old.cvec")).alias("cvec"),
            )
        )
    return cents


def ivf_assign(df: DataFrame, id_col: str, vec_col: str,
               n_centroids: int = 8, centroids: DataFrame | None = None) -> DataFrame:
    """IVF coarse quantizer: assign every vector to its nearest centroid
    (argmin squared-L2, ties to the lowest centroid id) -> (nid, nvec, cell).

    ``centroids`` (cid, cvec) defaults to the first-N deterministic seeding;
    pass train_centroids(...) for a k-means-trained quantizer (same plan
    shape: the centroid side stays a broadcast dim table either way).

    Scale shape: vectors x centroids is a broadcast fan-out (K small), one
    codegen'd projection computes K distances per row, and the downstream
    search shuffles on ``cell`` only — never an all-pairs join."""
    base = df.select(
        F.col(id_col).alias("nid"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("nvec"),
    )
    cents = centroids if centroids is not None else _seed_centroids(base, n_centroids)
    return _assign_cells(base, cents)


def ivf_topk(df: DataFrame, id_col: str, vec_col: str, k: int = 5,
             n_queries: int = 10, n_centroids: int = 8, nprobe: int = 2,
             train_iters: int = 2) -> DataFrame:
    """IVF approximate top-k: each query probes only its ``nprobe`` nearest
    cells and ranks exact cosine within them — the inverted-file ANN scale
    path (brute_force_topk is the recall baseline). Returns
    (qid, nid, cos, rank); rank is per-query among probed cells.

    ``train_iters`` Lloyd's iterations train the quantizer (0 = raw first-N
    seeding); trained cells track the data distribution, so the same nprobe
    recovers more true neighbors."""
    from pyspark.sql.window import Window

    base = df.select(
        F.col(id_col).alias("nid"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("nvec"),
    )
    if train_iters > 0:
        cents = train_centroids(df, id_col, vec_col, n_centroids, train_iters)
    else:
        cents = _seed_centroids(base, n_centroids)
    assigned = _assign_cells(base, cents)
    queries = assigned.filter(F.col("nid") < n_queries).select(
        F.col("nid").alias("qid"), F.col("nvec").alias("qvec")
    )
    # probe list: the nprobe nearest centroids per query (tiny x tiny)
    qd = queries.join(F.broadcast(cents)).select(
        "qid", "qvec", "cid",
        F.round(l2sq(F.col("qvec"), F.col("cvec")), ROUND).alias("dist"),
    )
    wq = Window.partitionBy("qid").orderBy(F.asc("dist"), F.asc("cid"))
    probes = (
        qd.withColumn("rk", F.row_number().over(wq))
        .filter(F.col("rk") <= nprobe)
        .select("qid", "qvec", F.col("cid").alias("cell"))
    )
    # search only within probed cells: shuffle key = cell, probe side tiny
    scored = assigned.join(F.broadcast(probes), "cell").filter(
        F.col("nid") != F.col("qid")
    ).select(
        "qid", "nid", F.round(cosine(F.col("qvec"), F.col("nvec")), ROUND).alias("cos")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "nid", "cos", "rank")
    )


def semantic_dedup(df: DataFrame, id_col: str, vec_col: str,
                   n_centroids: int = 8, train_iters: int = 2,
                   threshold: float = 0.97) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023): k-means
    cluster the embedding space, compare vectors pairwise ONLY within a
    cluster, and drop every vector whose cosine similarity to a lower-id
    cluster-mate reaches ``threshold``. Captures paraphrases and
    re-renderings that exact/MinHash dedup never sees. Returns
    (nid, cell, keep) for every input vector.

    Scale shape: the quantizer side is the trained-k-means broadcast dim
    table (train_centroids), assignment is a broadcast fan-out + one
    nid-keyed argmin, and the candidate join shuffles on ``cell`` only —
    pairwise cost is quadratic per cell, never corpus-quadratic, and
    n_centroids is the knob that bounds it (SemDeDup at production scale
    runs K in the tens of thousands so cells hold ~corpus/K vectors; a
    pathological all-same-cell corpus is the same hazard as an LSH
    mega-bucket and shows up in the cell-keyed AQE skew stats)."""
    cents = train_centroids(df, id_col, vec_col, n_centroids, train_iters)
    assigned = ivf_assign(df, id_col, vec_col, centroids=cents)
    a = assigned.select(
        "cell", F.col("nid").alias("keep_id"), F.col("nvec").alias("kvec"))
    b = assigned.select(
        "cell", F.col("nid").alias("drop_id"), F.col("nvec").alias("dvec"))
    drops = (
        a.join(b, "cell")
        .filter(F.col("keep_id") < F.col("drop_id"))
        .filter(
            F.round(cosine(F.col("kvec"), F.col("dvec")), ROUND)
            >= F.lit(threshold))
        .select("drop_id")
        .distinct()
    )
    return (
        assigned.join(drops, assigned["nid"] == drops["drop_id"], "left")
        .select(
            "nid",
            F.col("cell").cast("bigint").alias("cell"),
            F.col("drop_id").isNull().cast("int").alias("keep"),
        )
    )


def hyperplane_lsh_buckets(df: DataFrame, id_col: str, vec_col: str,
                           n_planes: int = 8) -> DataFrame:
    """Sign-LSH bucket id per vector: bit b = sign(dot(vec, plane_b)) where
    plane_b components are deterministic in (b, dim) via md5 — portable, no
    RNG. Bucket-equal vectors are ANN candidates."""
    vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    dim = F.size(vec)
    def _plane_term(b: int):
        # plane component for (b, i): md5 first 4 hex digits mapped to
        # [-1, +1]. Closure factory, not default-arg lambda — pyspark's HOF
        # lambda introspection binds a Column to every declared parameter.
        def term(x, i):
            comp = (
                F.conv(
                    F.substring(F.md5(F.concat_ws(":", F.lit(str(b)), i.cast("string"))), 1, 4),
                    16, 10,
                ).cast("double") / 32767.5 - 1.0
            )
            return x * comp

        return term

    bits = []
    for b in range(n_planes):
        proj = F.aggregate(
            F.zip_with(vec, F.sequence(F.lit(0), dim - 1), _plane_term(b)),
            F.lit(0.0), lambda acc, v: acc + v,
        )
        bits.append(F.when(proj >= 0, F.lit(1 << b)).otherwise(F.lit(0)))
    bucket = bits[0]
    for c in bits[1:]:
        bucket = bucket + c
    return df.select(F.col(id_col).alias("doc"), bucket.alias("bucket"))


def hamming_rerank_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_queries: int = 10,
    n_planes: int = 60,
    shortlist: int = 50,
    k: int = 5,
) -> DataFrame:
    """Two-stage ANN over sign-LSH Hamming codes (Charikar 2002): encode
    every vector as an ``n_planes``-bit code (deterministic md5 planes),
    shortlist per query by xor/popcount Hamming distance, then rerank the
    shortlist with exact cosine — the compress-then-refine pattern that
    makes the coarse pass ~50x cheaper per comparison than float dot
    products and shrinks the scanned table by two orders of magnitude.

    Scale shape: the coarse scan touches only the (id, 8-byte code)
    table — the query codes broadcast, hamming is codegen'd xor+popcount,
    and per-query shortlists are window top-n on the scan output; only
    shortlist*|Q| full vectors are ever fetched (an id-keyed join), so
    the expensive float math runs on a vanishing fraction of the corpus.

    Returns (qid, nid, hamming, cos, rank) with rank over exact cosine.
    """
    from pyspark.sql.window import Window

    codes = hyperplane_lsh_buckets(df, id_col, vec_col, n_planes=n_planes)
    q = codes.filter(F.col("doc") < n_queries).select(
        F.col("doc").alias("qid"), F.col("bucket").alias("qc"))
    h = (
        codes.crossJoin(F.broadcast(q))
        .filter(F.col("doc") != F.col("qid"))
        .select(
            "qid", F.col("doc").alias("nid"),
            F.bit_count(F.col("qc").bitwiseXOR(F.col("bucket")))
            .cast("bigint").alias("hamming"),
        )
    )
    ws = Window.partitionBy("qid").orderBy("hamming", "nid")
    short = h.withColumn("sr", F.row_number().over(ws)).filter(
        F.col("sr") <= shortlist).drop("sr")
    vecs = df.select(
        F.col(id_col).alias("vid"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )
    rer = (
        short.join(vecs.withColumnRenamed("vid", "qid")
                   .withColumnRenamed("v", "qv"), "qid")
        .join(vecs.withColumnRenamed("vid", "nid")
              .withColumnRenamed("v", "nv"), "nid")
        .select(
            "qid", "nid", "hamming",
            F.round(cosine(F.col("qv"), F.col("nv")), 6).alias("cos"),
        )
    )
    wr = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("nid"))
    return rer.withColumn(
        "rank", F.row_number().over(wr).cast("bigint")
    ).filter(F.col("rank") <= k)


def int8_codes(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """Max-abs scalar quantization to int8 codes: (nid, qv) where
    qv[i] = floor(x[i] * 127 / max_j |x[j]|), all-zero vectors mapping to
    all-zero codes. This is the standard 4x memory compression for
    corpus-scale vector search (float32 -> int8); downstream similarity
    becomes an exact int64 dot product — order-free, so partitioning and
    retries can't perturb results (unlike float accumulation).

    floor (not round) keeps the code cross-engine bit-exact: IEEE double
    ops in the same order give the same double everywhere, and floor has
    no tie semantics for engines to disagree on. One codegen'd
    projection, no shuffle, no UDF.
    """
    base = df.select(
        F.col(id_col).alias("nid"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("nvec"),
    )
    m = F.aggregate(
        F.col("nvec"), F.lit(0.0), lambda a, x: F.greatest(a, F.abs(x)))
    return base.withColumn("m", m).select(
        "nid",
        F.when(
            F.col("m") > 0,
            F.transform(
                F.col("nvec"),
                lambda x: F.floor(x * F.lit(127.0) / F.col("m"))
                .cast("bigint"),
            ),
        ).otherwise(
            F.transform(F.col("nvec"), lambda x: F.lit(0).cast("bigint"))
        ).alias("qv"),
    )


def int8_topk(df: DataFrame, id_col: str, vec_col: str,
              k: int = 5, n_queries: int = 10) -> DataFrame:
    """Top-k neighbors under the int8-quantized dot product for the first
    ``n_queries`` ids: (qid, nid, dot_q, rank), ties broken by neighbor
    id. The recall twin of :func:`brute_force_topk` — run both and join
    to measure what 4x compression costs in neighbor quality (see the
    ``int8_recall`` query).

    Scale shape: codes are one no-shuffle projection; the tiny query
    side broadcasts; scoring is one codegen'd int64 fold per pair and
    the per-query top-k is a qid-partitioned window over n_queries
    frames. Swap the broadcast cross for the sign-LSH bucket join at
    corpus scale, exactly as the float path does.
    """
    from pyspark.sql.window import Window

    codes = int8_codes(df, id_col, vec_col)
    queries = codes.filter(F.col("nid") < n_queries).select(
        F.col("nid").alias("qid"), F.col("qv").alias("qqv"))
    dot = F.aggregate(
        F.zip_with(F.col("qqv"), F.col("qv"), lambda x, y: x * y),
        F.lit(0).cast("bigint"), lambda acc, v: acc + v)
    scored = codes.join(
        F.broadcast(queries), F.col("nid") != F.col("qid")
    ).select("qid", "nid", dot.alias("dot_q"))
    w = Window.partitionBy("qid").orderBy(F.desc("dot_q"), F.asc("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "nid", "dot_q", "rank")
    )


POWER_Q = 1 << 20   # power-of-2 fixed-point for components: round() is
                    # exact (no .5 ties exist), mirroring FIXED_POINT
POWER_V = 10**6     # iterate vector normalized to max-abs = POWER_V


def power_iteration(df: DataFrame, id_col: str, vec_col: str,
                    n_iters: int = 3) -> DataFrame:
    """Dominant principal direction of the (uncentered) second-moment
    matrix X^T X by deterministic fixed-point power iteration: returns
    (pos, v) with the direction normalized to max-abs = 1e6 integer
    units. This is the embedding-space structure audit (is one axis
    eating the variance? did a collapse happen after a bad encoder
    push?) and the first step of whitening. Uncentered by design —
    centering adds a mean pass without changing the plan shape; at
    near-zero-mean embedding corpora the directions agree.

    Determinism/exactness: components quantize to int64 at a POWER-OF-2
    scale (exact — a float32-derived double times 2^20 has no .5 round
    ties), every sum is integer (order-free under any partitioning) and
    every normalization is truncate-toward-zero division of bigints, so
    N iterations are bit-identical in any engine. Overflow budget:
    |w_j| <= N_rows * max|q| * 1e6 — int64-safe through ~1e7 vectors at
    these scales; shrink POWER_V for larger corpora (same plan).

    Scale shape: the quantized long form (nid, pos, q) persists ONCE,
    nid-partitioned — after that, no iteration ever shuffles it again.
    Per round: the dot is a BROADCAST join of the dim-sized iterate v
    onto base followed by groupBy(nid) that reuses base's persisted
    partitioning (zero Exchange); the update joins the narrow (nid, d)
    frame back on nid (only that 2-column frame shuffles) and SUMs per
    pos with map-side partials (dim-many groups). The dot frame is
    data-sized, so ITS normalizer is agg+broadcast over a persisted
    frame (never an all-rows window); the dim-sized update frame
    normalizes in-flow.
    The dim-sized iterate is localCheckpoint()ed each round (the same
    lineage-truncation rule as dedup_components / kcore — swap for
    reliable checkpoint() on a real cluster): without it the plan nests
    one level per iteration and deep runs overflow codegen, and with it
    each round's data-sized dot cache can be dropped immediately.
    """
    from pyspark.sql.window import Window

    base = (
        df.select(
            F.col(id_col).alias("nid"),
            F.posexplode(
                F.transform(F.col(vec_col), lambda x: x.cast("double"))
            ).alias("pos", "x"),
        )
        .select(
            "nid", "pos",
            F.round(F.col("x") * F.lit(float(POWER_Q)))
            .cast("bigint").alias("q"),
        )
        # nid-partitioned ONCE at persist time: the per-round dot
        # groupBy("nid") and the nid-keyed update join then reuse this
        # partitioning (zero Exchange on the data-sized side every
        # round); the pos-keyed joins broadcast the dim-sized frame so
        # they never shuffle base either.
        .repartition("nid")
        .persist()
    )
    v = base.select("pos").distinct().select(
        "pos", F.lit(POWER_V).cast("bigint").alias("v"))
    for _ in range(n_iters):
        dot = (
            base.join(F.broadcast(v), "pos")
            .groupBy("nid")
            .agg(F.sum(F.col("q") * F.col("v")).alias("dot"))
            .persist()  # data-sized; read by its normalizer AND the update
        )
        m = dot.agg(
            F.greatest(F.max(F.abs(F.col("dot"))), F.lit(1))
            .cast("bigint").alias("m"))
        dn = dot.crossJoin(F.broadcast(m)).select(
            "nid",
            F.expr(
                f"(dot div greatest(m div {POWER_V}, 1)) * {POWER_V}"
                f" div greatest(m div greatest(m div {POWER_V}, 1), 1)"
            ).cast("bigint").alias("d"),
        )
        w = (
            base.join(dn, "nid")
            .groupBy("pos")
            .agg(F.sum(F.col("q") * F.col("d")).alias("w"))
        )
        wm = F.greatest(
            F.max(F.abs(F.col("w"))).over(Window.partitionBy(F.lit(1))),
            F.lit(1))
        v = w.select(
            "pos", F.col("w").alias("w"), wm.cast("bigint").alias("m")
        ).select(
            "pos",
            F.expr(
                f"(w div greatest(m div {POWER_V}, 1)) * {POWER_V}"
                f" div greatest(m div greatest(m div {POWER_V}, 1), 1)"
            ).cast("bigint").alias("v"),
        ).localCheckpoint(eager=True)
        dot.unpersist()
    base.unpersist()
    return v.select("pos", "v")


def axis_share(df: DataFrame, id_col: str, vec_col: str,
               n_iters: int = 3) -> DataFrame:
    """Share of total second-moment mass on the dominant principal axis,
    in basis points: Rayleigh quotient of the :func:`power_iteration`
    direction over trace(X^T X). Returns one row (n_vecs, n_dims,
    share_bp). share_bp near 10000 = representation collapse; near
    10000/dim = isotropic.

    Exactness: the three aggregates (sum of squared dots, v^T v, trace)
    are DECIMAL(38)/BIGINT integer sums — order-free under any
    partitioning; the single final division is one scalar double op, so
    the result is bit-identical cross-engine. Plan: power_iteration's
    zero-reshuffle rounds, then one broadcast join + two aggs."""
    v = power_iteration(df, id_col, vec_col, n_iters=n_iters)
    base = df.select(
        F.col(id_col).alias("nid"),
        F.posexplode(
            F.transform(F.col(vec_col), lambda x: x.cast("double"))
        ).alias("pos", "x"),
    ).select(
        "nid", "pos",
        F.round(F.col("x") * F.lit(float(POWER_Q))).cast("bigint").alias("q"),
    )
    dot = (
        base.join(F.broadcast(v), "pos")
        .groupBy("nid")
        .agg(F.sum(F.col("q") * F.col("v")).alias("dot"))
    )
    num = dot.agg(
        F.sum(F.col("dot").cast("decimal(38,0)")
              * F.col("dot").cast("decimal(38,0)")).alias("num"),
        F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
    )
    vtv = v.agg(F.sum(F.col("v") * F.col("v")).alias("vtv"),
                F.count(F.lit(1)).cast("bigint").alias("n_dims"))
    trace = base.agg(
        F.sum(F.col("q").cast("decimal(38,0)") * F.col("q")).alias("trace"))
    return (
        num.crossJoin(F.broadcast(vtv)).crossJoin(F.broadcast(trace))
        .select(
            "n_vecs", "n_dims",
            F.expr(
                "CAST(FLOOR(10000.0D * (CAST(num AS DOUBLE)"
                " / (CAST(vtv AS DOUBLE) * CAST(trace AS DOUBLE))))"
                " AS BIGINT)").alias("share_bp"),
        )
    )


def embedding_outliers(df: DataFrame, id_col: str, vec_col: str,
                       group_col: str) -> DataFrame:
    """Per-group embedding-outlier report: vectors whose distance from
    the corpus centroid exceeds 1.5x the RMS distance — encoder-glitch /
    wrong-modality rows that poison ANN recall and k-means training.
    Returns (group, n_vecs, n_outliers, outlier_bp).

    Exactness: components quantize to int64 (round(x * 2^20)); the
    centroid is the truncated integer mean of exact component sums; d²
    sums are DECIMAL(38); the outlier test 4*d²*N > 9*Σd² is a pure
    integer cross-multiplication of the d > 1.5*rms rule — no division,
    no floats, bit-identical cross-engine. Scale shape: one explode +
    (pos) agg builds the dim-sized centroid (broadcast back); one more
    pass computes per-vector d² (shuffle keyed on id); the Σd²/N
    normalizer is an agg + broadcast. Nothing is all-pairs."""
    base = df.select(
        F.col(id_col).alias("nid"),
        F.col(group_col).alias("grp"),
        F.posexplode(
            F.transform(F.col(vec_col), lambda x: x.cast("double"))
        ).alias("pos", "x"),
    ).select(
        "nid", "grp", "pos",
        F.round(F.col("x") * F.lit(float(POWER_Q))).cast("bigint").alias("q"),
    )
    cent = (
        base.groupBy("pos")
        .agg(F.sum("q").alias("s"), F.count(F.lit(1)).alias("n"))
        # truncate-toward-zero for possibly-negative sums: the oracle
        # spells the same sign-CASE over positive //
        .select(
            "pos",
            F.expr("CASE WHEN s >= 0 THEN s div n"
                   " ELSE -((-s) div n) END").alias("c"),
        )
    )
    d2 = (
        base.join(F.broadcast(cent), "pos")
        .groupBy("nid", "grp")
        .agg(
            F.sum(
                (F.col("q") - F.col("c")).cast("decimal(38,0)")
                * (F.col("q") - F.col("c"))
            ).alias("d2")
        )
    )
    tot = d2.agg(F.sum("d2").alias("sum_d2"),
                 F.count(F.lit(1)).cast("bigint").alias("n_all"))
    return (
        d2.crossJoin(F.broadcast(tot))
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
            F.sum(
                F.when(F.lit(4) * F.col("d2") * F.col("n_all")
                       > F.lit(9) * F.col("sum_d2"), 1).otherwise(0)
            ).cast("bigint").alias("n_outliers"),
        )
        .select(
            F.col("grp").alias(group_col), "n_vecs", "n_outliers",
            F.expr("n_outliers * 10000 div n_vecs").alias("outlier_bp"),
        )
    )


JL_DIM = 16


def jl_project(df: DataFrame, id_col: str, vec_col: str,
               out_dim: int = JL_DIM) -> DataFrame:
    """Johnson-Lindenstrauss random projection with deterministic ±1
    signs (parity of a md5 hex nibble keyed on (input pos, output pos)):
    (id, array<bigint> of out_dim components in POWER_Q units). With ±1
    entries E||Sx||² = out_dim·||x||², so downstream distance math
    rescales by out_dim. The dimensionality-reduction front end for ANN
    at corpus scale: 64→16 dims is 4× less shuffle weight on every
    similarity join, with distortion measured (jl_distortion), never
    assumed.

    Exactness: projected components are exact int64 sums of ±q (order
    irrelevant under integer addition); |y| ≤ dim·max|q| keeps far from
    overflow. Shape: explode × out_dim fan-out (md5 sign inside codegen)
    + one id-keyed agg with partials; the sign 'matrix' is an expression,
    not a table — nothing is broadcast, nothing is all-pairs."""
    base = df.select(
        F.col(id_col).alias("nid"),
        F.posexplode(
            F.transform(F.col(vec_col), lambda x: x.cast("double"))
        ).alias("pos", "x"),
    ).select(
        "nid", "pos",
        F.round(F.col("x") * F.lit(float(POWER_Q))).cast("bigint").alias("q"),
    )
    fan = base.select(
        "nid", "pos", "q",
        F.explode(F.sequence(F.lit(0), F.lit(out_dim - 1))).alias("p"),
    )
    sign = F.when(
        F.conv(F.substring(
            F.md5(F.concat_ws("|", F.col("pos"), F.col("p"))), 1, 1),
            16, 10).cast("int") % 2 == 0,
        F.lit(1)).otherwise(F.lit(-1))
    proj = (
        fan.groupBy("nid", "p")
        .agg(F.sum(F.col("q") * sign).alias("y"))
    )
    return (
        proj.groupBy("nid")
        .agg(F.array_sort(F.collect_list(F.struct("p", "y"))).alias("py"))
        .select(
            "nid",
            F.transform(F.col("py"), lambda s: s["y"]).alias("proj"),
        )
    )


def jl_distortion(df: DataFrame, id_col: str, vec_col: str,
                  out_dim: int = JL_DIM, n_pairs: int = 50) -> DataFrame:
    """JL distortion eval on consecutive-id probe pairs: per pair the
    ratio d²_proj / (out_dim · d²_orig) in basis points (10000 = the JL
    expectation; the spread around it is the price of 4× cheaper
    similarity shuffles). Integer-exact: both squared distances are
    DECIMAL(38) sums, the ratio one truncating integer division.

    A probe pair with d²_orig = 0 (identical vectors — real corpora have
    exact re-uploads, and scaled test corpora have verbatim copies at
    consecutive ids) has UNDEFINED distortion and yields NULL rather
    than a division error: the ANSI divide-by-zero was caught by the
    sf1-equivalent sweep, where DuckDB's ``// 0 -> NULL`` silently
    disagreed with Spark's ANSI error.

    Shape: jl_project's keyed aggs + two self-joins on consecutive ids
    restricted to n_pairs probes (broadcast-sized)."""
    pairs = (
        df.select(F.col(id_col).alias("a"))
        .filter(F.col("a") < n_pairs)
        .select("a", (F.col("a") + 1).alias("b"))
    )
    base = df.select(
        F.col(id_col).alias("nid"),
        F.posexplode(
            F.transform(F.col(vec_col), lambda x: x.cast("double"))
        ).alias("pos", "x"),
    ).select(
        "nid", "pos",
        F.round(F.col("x") * F.lit(float(POWER_Q))).cast("bigint").alias("q"),
    )
    d_orig = (
        base.join(F.broadcast(pairs), base["nid"] == pairs["a"])
        .select("a", "b", "pos", F.col("q").alias("qa"))
        .join(base.select(F.col("nid").alias("b2"),
                          F.col("pos").alias("pos2"),
                          F.col("q").alias("qb")),
              (F.col("b") == F.col("b2")) & (F.col("pos") == F.col("pos2")))
        .groupBy("a", "b")
        .agg(F.sum(
            (F.col("qa") - F.col("qb")).cast("decimal(38,0)")
            * (F.col("qa") - F.col("qb"))).alias("d2_orig"))
    )
    proj = jl_project(df, id_col, vec_col, out_dim)
    pl = proj.select(F.col("nid").alias("a"), F.col("proj").alias("pa"))
    pr = proj.select(F.col("nid").alias("b"), F.col("proj").alias("pb"))
    d_proj = (
        pairs.join(pl, "a").join(pr, "b")
        .select(
            "a", "b",
            F.aggregate(
                F.zip_with(F.col("pa"), F.col("pb"),
                           lambda x, y: (x - y) * (x - y)),
                F.lit(0).cast("decimal(38,0)"),
                lambda acc, v: acc + v).alias("d2_proj"),
        )
    )
    return (
        d_orig.join(d_proj, ["a", "b"])
        .select(
            F.col("a").cast("bigint").alias("qid_a"),
            F.col("b").cast("bigint").alias("qid_b"),
            F.expr("CAST(CASE WHEN d2_orig = 0 THEN NULL ELSE"
                   f" d2_proj * 10000 div ({out_dim} * d2_orig)"
                   " END AS BIGINT)").alias("ratio_bp"),
        )
    )


def _tdiv_sql(x: str, s: str) -> str:
    """Truncate-toward-zero integer division as SQL text — Spark ``div``
    truncates but DuckDB ``//`` floors, so negative operands need the
    explicit sign/abs form to agree across engines."""
    return f"(CASE WHEN {x} >= 0 THEN ({x}) div ({s}) ELSE -((-({x})) div ({s})) END)"


def gram_moments(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    label_col: str,
    scale_bits: int = 20,
) -> DataFrame:
    """Augmented normal-equations moment matrix — the distributed half of
    closed-form linear-model training (ridge / linear probe) over an
    embedding column: quantize each vector to int64 fixed point
    (round(x * 2^scale_bits)), append the label as component d+1 on the
    same scale, and aggregate the exact upper-triangle second moments
    SUM(q_i * q_j) over the corpus. Rows (i, j, s_q) for 1 <= i <= j <=
    d+1 carry X^T X (i,j <= d), X^T y (j = d+1), and y^T y (i = j = d+1)
    in one frame; the d+1-square solve happens wherever the result lands
    (driver, notebook) — the data-sized work is all here.

    Scale shape: the pair products build IN-ROW (nested index-aware
    transforms over the augmented array — no self-join, no posexplode
    cross), then one (i, j)-keyed hash agg whose map-side partials reduce
    every partition to <= (d+1)(d+2)/2 rows; the shuffle ships
    #partitions x 2145 longs for d=64, never vectors. Exactness: all
    products/sums are int64; overflow headroom is ~1e6 vectors at d=64 /
    |x| <= 1 — past that, lift the SUM to DECIMAL(38) (the
    length_moments pattern) or shrink scale_bits."""
    scale = 1 << scale_bits
    aug = F.expr(
        f"concat(transform({vec_col}, x -> cast(round(cast(x as double)"
        f" * {scale}) as bigint)), array(cast({label_col} as bigint) * {scale}))"
    )
    pairs = (
        df.select(aug.alias("aug"))
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(aug, (qi, i) -> "
                    "transform(slice(aug, i + 1, size(aug) - i), (qj, j) -> "
                    "struct(i + 1 AS i, i + j + 1 AS j, qi * qj AS p))))"
                )
            ).alias("t")
        )
        .select("t.i", "t.j", "t.p")
    )
    return pairs.groupBy("i", "j").agg(F.sum("p").alias("s_q")).select(
        F.col("i").cast("bigint"),
        F.col("j").cast("bigint"),
        F.col("s_q").cast("bigint"),
    )


def pca_power_projection(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    iters: int = 8,
    scale_bits: int = 20,
) -> DataFrame:
    """Per-vector projection onto the corpus's leading principal direction
    (embedding whitening / outlier axis), computed by deterministic
    INTEGER power iteration so any engine reproduces it bit-for-bit: the
    d x d fixed-point gram matrix aggregates distributed (same in-row
    pair build as :func:`gram_moments`), collects to the driver (d^2 =
    4096 longs for d=64 — the sanctioned small-side collect, exactly the
    IVF-centroid pattern), and ``iters`` rounds of v <- tdiv(G'v,
    max|G'v| >> scale_bits) run in exact int64 arithmetic from the fixed
    all-ones start; the resulting direction folds back as a literal array
    and the projection is one zero-shuffle in-row dot product.

    tdiv is truncate-toward-zero division (sign/abs form) because Spark
    ``div`` truncates while DuckDB ``//`` floors on negatives. G' = G >>
    scale_bits keeps every intermediate under int64 at <= ~1e6 vectors
    (d=64); the DuckDB twin unrolls the same ``iters`` steps as CTEs over
    the mirrored gram frame.

    Returns (id, proj_micro): proj = tdiv(dot(q, v), 2^scale_bits),
    exact int64 micro-units."""
    scale = 1 << scale_bits
    q_arr = F.expr(
        f"transform({vec_col}, x -> cast(round(cast(x as double) * {scale}) as bigint))"
    )
    pairs = (
        df.select(q_arr.alias("q"))
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(q, (qi, i) -> "
                    "transform(slice(q, i + 1, size(q) - i), (qj, j) -> "
                    "struct(i + 1 AS i, i + j + 1 AS j, qi * qj AS p))))"
                )
            ).alias("t")
        )
        .select("t.i", "t.j", "t.p")
    )
    gram_rows = pairs.groupBy("i", "j").agg(F.sum("p").alias("s")).collect()

    d = 0
    for r in gram_rows:
        d = max(d, r["j"])
    g = [[0] * d for _ in range(d)]

    def _tdiv(a: int, b: int) -> int:
        return (abs(a) // b) * (1 if a >= 0 else -1)

    for r in gram_rows:
        v = _tdiv(int(r["s"]), scale)
        g[r["i"] - 1][r["j"] - 1] = v
        g[r["j"] - 1][r["i"] - 1] = v

    vec = [scale] * d
    for _ in range(iters):
        w = [sum(g[i][j] * vec[j] for j in range(d)) for i in range(d)]
        mx = max((abs(x) for x in w), default=0)
        s = max(mx // scale, 1)
        vec = [_tdiv(x, s) for x in w]

    v_lit = "array(" + ", ".join(f"{x}L" for x in vec) + ")"
    return df.select(
        F.col(id_col).cast("bigint").alias("id"),
        F.expr(_tdiv_sql(
            f"aggregate(zip_with(transform({vec_col}, x -> cast(round(cast(x as double)"
            f" * {scale}) as bigint)), {v_lit}, (a, b) -> a * b), 0L, (acc, t) -> acc + t)",
            str(scale),
        )).cast("bigint").alias("proj_micro"),
    )
