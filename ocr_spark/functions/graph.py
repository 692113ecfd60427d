"""Link-graph analytics over crawl-derived host graphs.

PageRank is THE host-authority signal of web-corpus curation (seed-quality
weighting, spam demotion). The implementation is a deterministic
fixed-point variant: ranks are exact BIGINT scale units and every
per-edge contribution is integer floor division, so N iterations produce
bit-identical results on any engine, any partitioning, any retry — no
float accumulation order to drift. (Float PageRank sums are the textbook
nondeterminism example; the integer quantization error is bounded by one
unit per in-edge per iteration and is the price of an exact oracle.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def pagerank(
    edges: DataFrame,
    n_iters: int = 3,
    damping_pct: int = 85,
    scale: int = 10**9,
) -> DataFrame:
    """Fixed-iteration integer PageRank over (src, dst) edges (deduped;
    every src must have out-degree >= 1 — dangling-node mass is not
    redistributed in this variant). Returns (node, rank) where rank is in
    exact BIGINT ``scale`` units; base mass = (100 - damping_pct)% spread
    uniformly, each edge carries (rank * damping_pct) div (100 * outdeg).

    Scale shape: one src-keyed out-degree agg up front, then per
    iteration one src-keyed join (rank onto edges) and one dst-keyed SUM
    (map-side partials) — the classic distributed PageRank step, nothing
    driver-side. Iteration count is a fixed literal, so the whole program
    is one lazy plan; hot dst nodes (link hubs) are plain bigint keys AQE
    skew splitting handles."""
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    tot = nodes.agg(F.count(F.lit(1)).alias("n"))
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("od"))
    e = edges.join(outdeg, "src")
    base = F.expr(f"CAST({(100 - damping_pct) * scale} AS BIGINT) div (100 * n)")
    ranks = nodes.crossJoin(F.broadcast(tot)).select(
        "node", F.expr(f"CAST({scale} AS BIGINT) div n").alias("rank"))
    for _ in range(n_iters):
        contrib = (
            e.join(ranks, e["src"] == ranks["node"])
            .select(
                "dst",
                F.expr(f"(rank * {damping_pct}) div (100 * od)").alias("t"),
            )
            .groupBy("dst")
            .agg(F.sum("t").alias("c"))
        )
        ranks = (
            nodes.crossJoin(F.broadcast(tot))
            .join(contrib, nodes["node"] == contrib["dst"], "left")
            .select(
                "node",
                (base + F.coalesce(F.col("c"), F.lit(0))).cast("bigint")
                .alias("rank"),
            )
        )
    return ranks


def triangle_count(edges: DataFrame) -> DataFrame:
    """Per-node triangle counts over an undirected simple graph given as
    (src, dst) edges (symmetrized and canonicalized internally; self-loops
    dropped).

    Compact-forward strategy: canonical edges (a < b) joined twice —
    e1(a,b) ⋈ e2(b,c) ⋈ e3(a,c) with a < b < c enumerates each triangle
    exactly once, and orienting every edge low->high id bounds the join
    fan-out of a node by its forward degree (the standard mitigation for
    hub skew in distributed triangle counting). Two node-keyed hash-join
    shuffles on plain bigint keys AQE skew-splitting handles; the
    membership count is one node-keyed SUM with map-side partials.

    Returns (node, n_triangles) for every node in the edge set, zeros
    included (n_triangles = the number of triangles the node belongs to).
    """
    und = (
        edges.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    tri = (
        und.alias("e1")
        .join(und.alias("e2"), F.col("e1.b") == F.col("e2.a"))
        .join(
            und.alias("e3"),
            (F.col("e3.a") == F.col("e1.a"))
            & (F.col("e3.b") == F.col("e2.b")),
        )
        .select(
            F.col("e1.a").alias("x"),
            F.col("e1.b").alias("y"),
            F.col("e2.b").alias("z"),
        )
    )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    members = (
        tri.select(F.col("x").alias("node"))
        .unionByName(tri.select(F.col("y").alias("node")))
        .unionByName(tri.select(F.col("z").alias("node")))
    )
    cnt = members.groupBy("node").agg(F.count(F.lit(1)).alias("n_triangles"))
    return nodes.join(cnt, "node", "left").select(
        "node",
        F.coalesce("n_triangles", F.lit(0)).cast("bigint").alias("n_triangles"),
    )


def resolve_redirects(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    rounds: int = 6,
) -> DataFrame:
    """Redirect-chain resolution by pointer doubling: map every source URL
    to the terminal of its redirect chain (the node with no outgoing
    edge), the canonicalization step that precedes URL-level dedup in a
    crawl. Chains that never terminate within 2**rounds hops (cycles,
    self-loops, over-long chains) come back unresolved with a NULL final.

    Shape: each round joins the pointer table with ITSELF
    (ptr2[x] = ptr[ptr[x]] where defined), so the reachable horizon
    DOUBLES per round — ``rounds`` shuffle rounds cover chains of
    2**rounds hops, O(log L) rather than the O(L) rounds of naive
    step-at-a-time following (real crawl chains are short, but one
    pathological host must not add rounds for the whole corpus). Every
    node has exactly ONE successor (MIN-dedup on src), so each round is a
    skew-free equi-join on the pointer; AQE sizes the exchanges. The
    terminal test is one final left anti-style join against the source
    set. Nothing is iterative-on-the-driver beyond the fixed round count;
    no collect.

    Returns (src, final, resolved) for every distinct source node.
    """
    e = (
        edges.groupBy(F.col(src_col).alias("src"))
        .agg(F.min(dst_col).alias("dst"))
    )
    cur = e
    for _ in range(rounds):
        hop = cur.select(
            F.col("src").alias("m_src"), F.col("dst").alias("m_dst"))
        cur = (
            cur.join(hop, cur["dst"] == hop["m_src"], "left")
            .select(
                cur["src"],
                F.coalesce(hop["m_dst"], cur["dst"]).alias("dst"),
            )
        )
    term = e.select(F.col("src").alias("t"))
    return (
        cur.join(term, cur["dst"] == term["t"], "left")
        .select(
            "src",
            F.when(F.col("t").isNull(), F.col("dst")).alias("final"),
            F.col("t").isNull().cast("int").alias("resolved"),
        )
    )


def hits(
    edges: DataFrame,
    n_iters: int = 2,
    scale: int = 10**6,
) -> DataFrame:
    """Deterministic fixed-iteration HITS (Kleinberg hubs & authorities)
    over (src, dst) edges: authority(v) = sum of hub over in-neighbors,
    hub(u) = sum of authority over out-neighbors, each pass re-normalized
    so the maximum score is exactly ``scale``. The directory-page /
    cited-page decomposition PageRank collapses into one number — link
    hubs (directories, sitemaps-as-pages) and link authorities (the pages
    worth crawling first) are different curation signals.

    Determinism: scores are exact BIGINT ``scale`` units and the
    per-pass max-normalization is integer division, so N iterations are
    bit-identical on any engine/partitioning/retry (same rationale as
    :func:`pagerank`). The normalizer first coarsens both sides by
    ``q = max(max_score div scale, 1)`` and then scales exactly —
    ``((x div q) * scale) div (max div q)`` — so the multiply operand
    stays below 2*scale regardless of web-hub in-degrees (no bigint
    overflow), the pass maximum lands on exactly ``scale``, and the
    whole formula is floor division over non-negative ints, identical
    in Spark and DuckDB.

    Scale shape: per iteration one src-keyed join + dst-keyed SUM and
    one dst-keyed join + src-keyed SUM (map-side partials), plus an
    in-flow window max over the |V|-sized score frame (see _norm);
    nothing driver-side, iteration count a fixed literal so the program
    is one lazy plan.

    Returns (node, hub, authority) for every node in the edge set.
    """
    e = edges.select("src", "dst").distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )

    def _norm(df: DataFrame, col: str) -> DataFrame:
        # IN-FLOW all-rows window max: an agg+broadcast normalizer would
        # fork every raw frame into two consumers (2^(2N) prefix
        # recomputes across N iterations) and pay a per-broadcast job
        # barrier — measured 3.4 s -> 1.0 s on the 100-host fixture. The
        # window runs on the |V|-sized score frame; past ~1e8 nodes swap
        # for a two-level partial+final max.
        m0 = F.max(col).over(Window.partitionBy(F.lit(1)))
        return df.select(
            "node",
            F.col(col).alias(col),
            F.greatest(m0, F.lit(1)).cast("bigint").alias("m"),
        ).select(
            "node",
            F.expr(
                f"(({col} div greatest(m div {scale}, 1)) * {scale})"
                f" div (m div greatest(m div {scale}, 1))"
            ).cast("bigint").alias(col),
        )

    hub = nodes.select("node", F.lit(scale).cast("bigint").alias("hub"))
    auth = None
    for _ in range(n_iters):
        a_raw = (
            e.join(hub, e["src"] == hub["node"])
            .groupBy("dst").agg(F.sum("hub").alias("authority"))
        )
        auth = _norm(
            nodes.join(a_raw, nodes["node"] == a_raw["dst"], "left")
            .select("node",
                    F.coalesce("authority", F.lit(0)).alias("authority")),
            "authority",
        )
        h_raw = (
            e.join(auth, e["dst"] == auth["node"])
            .groupBy("src").agg(F.sum("authority").alias("hub"))
        )
        hub = _norm(
            nodes.join(h_raw, nodes["node"] == h_raw["src"], "left")
            .select("node", F.coalesce("hub", F.lit(0)).alias("hub")),
            "hub",
        )
    return hub.join(auth, "node").select("node", "hub", "authority")


def label_propagation(edges: DataFrame, n_iters: int = 4) -> DataFrame:
    """Deterministic synchronous label propagation (community detection)
    over (src, dst) edges: the graph is symmetrized, every node starts
    with its own id as label, and each of ``n_iters`` synchronous rounds
    reassigns every node the MOST FREQUENT label among its neighbors,
    ties broken to the SMALLEST label — the mode-of-neighbors rule that
    separates LPA communities from min-label connected components
    (dedup.connected_components), which merge everything reachable.
    Isolated nodes (and rounds where a node's neighborhood is empty)
    keep the previous label. Synchronous update + total tie-break make
    the result bit-identical on any engine, partitioning, or retry.

    Returns (node, community, community_size).

    Scale shape: per round, one join of the label frame onto the edge
    list keyed on the neighbor end, then one (node, label) hash agg with
    map-side partials and a struct-MAX argmax per node — never a window
    sort. The label frame is node-sized (graph nodes = hosts, orders of
    magnitude below rows), so the per-round cost is edge-count-bound
    with AQE free to re-plan each round's skew."""
    und = (
        edges.select("src", "dst")
        .unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    nodes = (
        und.select(F.col("src").alias("node"))
        .unionByName(und.select(F.col("dst").alias("node")))
        .distinct()
    )
    labels = nodes.select("node", F.col("node").alias("label"))
    for _ in range(n_iters):
        neigh = und.join(
            labels.withColumnRenamed("node", "dst"), "dst"
        ).select(F.col("src").alias("node"), "label")
        counts = neigh.groupBy("node", "label").agg(
            F.count(F.lit(1)).alias("c")
        )
        best = counts.groupBy("node").agg(
            F.max(F.struct(F.col("c"), (-F.col("label")).alias("nl")))
            .alias("b")
        ).select("node", (-F.col("b.nl")).alias("new_label"))
        labels = (
            labels.join(best, "node", "left")
            .select(
                "node",
                F.coalesce("new_label", "label").alias("label"),
            )
        )
    sizes = labels.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("community_size")
    )
    return labels.join(sizes, "label").select(
        "node",
        F.col("label").alias("community"),
        "community_size",
    )


def degree_stats(edges: DataFrame) -> DataFrame:
    """Per-node degree and link-reciprocity stats over deduped (src, dst)
    edges: (node, out_deg, in_deg, n_reciprocal, reciprocity_bp).

    ``n_reciprocal`` counts out-edges whose reverse edge also exists;
    ``reciprocity_bp`` is that count over out_deg in basis points (0 for
    sinks). Low reciprocity with high out-degree is the classic link-farm
    / spam-host shape (farms point at targets that never point back);
    organic site clusters interlink, so curation pipelines read this next
    to PageRank (authority) and triangle counts (local density).

    Shape: out/in degrees are two map-side-partial hash aggs; the
    reciprocal count is one self-join of the edge list on the reversed
    composite key — all keyed on plain bigint pairs, no fan-out beyond
    |E|, hub skew left to AQE. Nothing driver-side.
    """
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    out_deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("out_deg"))
    in_deg = edges.groupBy(F.col("dst").alias("node")).agg(
        F.count(F.lit(1)).alias("in_deg"))
    rev = edges.select(
        F.col("dst").alias("src"), F.col("src").alias("dst"))
    recip = (
        edges.join(rev, ["src", "dst"])
        .groupBy(F.col("src").alias("node"))
        .agg(F.count(F.lit(1)).alias("n_reciprocal"))
    )
    return (
        nodes.join(out_deg, "node", "left")
        .join(in_deg, "node", "left")
        .join(recip, "node", "left")
        .select(
            "node",
            F.coalesce("out_deg", F.lit(0)).cast("bigint").alias("out_deg"),
            F.coalesce("in_deg", F.lit(0)).cast("bigint").alias("in_deg"),
            F.coalesce("n_reciprocal", F.lit(0)).cast("bigint")
            .alias("n_reciprocal"),
        )
        .select(
            "node", "out_deg", "in_deg", "n_reciprocal",
            F.expr(
                "CAST(CASE WHEN out_deg > 0"
                "     THEN (n_reciprocal * 10000) DIV out_deg ELSE 0 END"
                "     AS BIGINT)"
            ).alias("reciprocity_bp"),
        )
    )


def kcore(edges: DataFrame, k: int = 3, max_iters: int = 30) -> DataFrame:
    """k-core decomposition by iterative peel over an undirected simple
    graph given as (src, dst) edges (symmetrized, self-loops dropped):
    repeatedly delete every node of degree < k until none remains, and
    return the surviving (node, degree) — degrees measured INSIDE the
    core. The k-core is the classic dense-subgraph reduction: spam/link
    farms shed at low k while genuinely interlinked host clusters
    survive, and it is the standard prefilter before expensive community
    detection (the fixpoint is unique, so the result is deterministic
    under any partitioning or peel interleaving).

    Scale shape (mirrors :func:`~ocr_spark.functions.dedup.
    connected_components`): each round is one src-keyed degree agg with
    map-side partials + two anti-joins that drop edges touching peeled
    nodes; the live edge set is localCheckpoint()ed per round to
    truncate lineage (swap for reliable checkpoint() on a real cluster)
    and convergence is one count on the already-materialized frame.
    Rounds needed = peel depth (shallow for web graphs); raises past
    ``max_iters`` rather than returning a silent partial core.
    """
    live = (
        edges.select("src", "dst")
        .unionByName(edges.select(F.col("dst").alias("src"),
                                  F.col("src").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iters):
        deg = live.groupBy("src").agg(F.count(F.lit(1)).alias("degree"))
        peel = deg.filter(F.col("degree") < k).select("src").persist()
        n_peel = peel.count()
        if n_peel == 0:
            peel.unpersist()
            return deg.select(
                F.col("src").alias("node"),
                F.col("degree").cast("bigint").alias("degree"),
            )
        live = (
            live.join(peel, "src", "left_anti")
            .join(peel.withColumnRenamed("src", "dst"), "dst", "left_anti")
            .select("src", "dst")
            .localCheckpoint(eager=True)
        )
        peel.unpersist()
    raise RuntimeError(
        f"kcore: did not converge within {max_iters} peel rounds")


def seed_distance(
    edges: DataFrame,
    seeds: DataFrame,
    rounds: int = 4,
) -> DataFrame:
    """Hop distance from a seed set over directed (src, dst) edges by
    ``rounds`` synchronous BFS relaxations: (node, dist) for every node
    reachable within ``rounds`` hops, dist = exact shortest hop count.
    This is the crawl-frontier prioritization signal — distance from
    trusted seeds is the classic spam-demotion/crawl-ordering feature
    (TrustRank's discrete cousin), and nodes absent from the result are
    "beyond the frontier horizon" by construction, not silently zero.

    Determinism: min-of-integers fixpoint per node, so any partitioning
    or evaluation order yields the same table; a fixed round count makes
    the DuckDB twin an exact unroll (converged rounds are no-ops).

    Scale shape: per round one src-keyed join of the frontier table onto
    edges + one node-keyed MIN agg with map-side partials. Each round's
    distance frame feeds TWO consumers (the propagation join and the
    union), so each round persists its frame, and the PRIOR round's
    frame unpersists as soon as the new one is materialized (the
    power_iteration/kcore discipline — without the release, cached
    frames accumulate linearly with rounds; round-3 advice).
    """
    dist = seeds.select(
        F.col("node"), F.lit(0).cast("bigint").alias("dist"))
    for _ in range(rounds):
        cur = dist.persist()
        prop = (
            edges.join(cur, edges["src"] == cur["node"])
            .select(F.col("dst").alias("node"),
                    (F.col("dist") + 1).alias("dist"))
        )
        dist = (
            cur.unionByName(prop)
            .groupBy("node")
            .agg(F.min("dist").cast("bigint").alias("dist"))
            # materialize the round: cur computes once, feeds both
            # consumers from cache, and can be released immediately
            .localCheckpoint(eager=True)
        )
        cur.unpersist()
    return dist


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    n_iters: int = 3,
    damping_pct: int = 85,
    scale: int = 10**9,
) -> DataFrame:
    """Personalized PageRank: identical to :func:`pagerank` except the
    teleport mass returns to the ``seeds`` (node) set instead of
    spreading uniformly — rank becomes 'importance as seen from the
    seeds', the standard crawl-frontier prioritizer (expand outward from
    trusted hubs) and related-host finder. Nodes unreachable from the
    seeds end at rank 0, which is the point.

    Exactness: same integer program as pagerank (BIGINT scale units,
    truncating divisions, fixed iterations) with the seed indicator
    folded into the base term; initial rank = scale div n_seeds on
    seeds, 0 elsewhere. Scale shape: unchanged — per iteration one
    src-keyed join + one dst-keyed SUM with partials; the seed frame is
    dim-sized and broadcast into the base projection."""
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    s = seeds.select(F.col("node").alias("node"),
                     F.lit(1).alias("is_seed")).distinct()
    ns = s.agg(F.count(F.lit(1)).alias("n_seeds"))
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("od"))
    e = edges.join(outdeg, "src")
    marked = (
        nodes.join(F.broadcast(s), "node", "left")
        .crossJoin(F.broadcast(ns))
        .select("node", F.coalesce("is_seed", F.lit(0)).alias("is_seed"),
                "n_seeds")
    )
    base = F.expr(
        f"CAST(is_seed * ({(100 - damping_pct) * scale}"
        " div (100 * n_seeds)) AS BIGINT)")
    ranks = marked.select(
        "node", "is_seed", "n_seeds",
        F.expr(f"CAST(is_seed * ({scale} div n_seeds) AS BIGINT)")
        .alias("rank"),
    )
    for _ in range(n_iters):
        contrib = (
            e.join(ranks.select("node", "rank"), e["src"] == F.col("node"))
            .select(
                "dst",
                F.expr(f"(rank * {damping_pct}) div (100 * od)").alias("t"),
            )
            .groupBy("dst")
            .agg(F.sum("t").alias("c"))
        )
        ranks = (
            marked.join(contrib, marked["node"] == contrib["dst"], "left")
            .select(
                "node", "is_seed", "n_seeds",
                (base + F.coalesce(F.col("c"), F.lit(0))).cast("bigint")
                .alias("rank"),
            )
        )
    return ranks.select("node", "rank")


def link_spam_score(
    edges: DataFrame,
    src_col: str,
    dst_col: str,
    min_links: int = 20,
    max_diversity_bp: int = 2000,
) -> DataFrame:
    """Outlink-spam signal per source host (link-farm detector): a host
    that emits many links over very few distinct targets (low outlink
    diversity — doorway pages hammering one money site) or that sits in a
    reciprocal-link arrangement (A links B, B links A — link exchanges)
    is flagged. The standard webgraph-side complement to content-side
    quality gates in crawl curation.

    Returns one row per source host: (src, n_links, n_targets,
    diversity_bp, n_reciprocal, spam_flag) where diversity_bp is exact
    integer basis points of distinct-targets over links, n_reciprocal is
    the number of this host's link partners that link straight back, and
    spam_flag fires on (n_links >= min_links AND diversity_bp <=
    max_diversity_bp) OR n_reciprocal >= 1.

    Scale shape: one src-keyed hash agg with map-side partials over the
    edge list (counts only — no payload), then reciprocity on the DISTINCT
    host-pair frame: webgraph-of-hosts sized, orders of magnitude below
    the raw link count, self-joined on the reversed pair key. Nothing is
    quadratic in links; the pair self-join is keyed, never cross."""
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    per = e.groupBy("src").agg(
        F.count(F.lit(1)).alias("n_links"),
        F.countDistinct("dst").alias("n_targets"),
    )
    pairs = e.where(F.col("src") != F.col("dst")).select("src", "dst").distinct()
    rev = pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    recip = pairs.join(rev, ["src", "dst"]).groupBy("src").agg(
        F.count(F.lit(1)).alias("n_reciprocal")
    )
    diversity = F.expr("n_targets * 10000 div n_links")
    return (
        per.join(recip, "src", "left")
        .select(
            "src",
            F.col("n_links").cast("bigint"),
            F.col("n_targets").cast("bigint"),
            diversity.cast("bigint").alias("diversity_bp"),
            F.coalesce("n_reciprocal", F.lit(0)).cast("bigint").alias("n_reciprocal"),
            (
                (
                    (F.col("n_links") >= min_links)
                    & (diversity <= max_diversity_bp)
                )
                | (F.coalesce("n_reciprocal", F.lit(0)) >= 1)
            ).cast("int").alias("spam_flag"),
        )
    )


def local_clustering(edges: DataFrame) -> DataFrame:
    """Per-node local clustering coefficient over the undirected simple
    graph of (src, dst) edges — the normalized companion to
    :func:`triangle_count`: coefficient = 2·triangles / (deg·(deg−1)) in
    exact basis points (integer division, truncation toward zero in both
    engines), 0 for degree-<2 nodes where the ratio is undefined.

    A high coefficient on a high-degree host marks a densely
    self-referential cluster (link farm / mirror ring); a low one marks a
    genuine hub whose neighbors don't know each other. Scale shape: the
    triangle join is the compact-forward oriented plan (fan-out bounded
    by forward degree), the degree agg is one node-keyed SUM, and the
    final assembly is two id-keyed joins — nothing quadratic in the
    corpus.

    Returns (node, degree, n_triangles, clustering_bp).
    """
    und = (
        edges.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .unionByName(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("degree"))
    )
    tri = triangle_count(edges)
    return tri.join(deg, "node", "left").select(
        "node",
        F.coalesce("degree", F.lit(0)).cast("bigint").alias("degree"),
        "n_triangles",
        F.expr(
            "CASE WHEN COALESCE(degree, 0) >= 2"
            " THEN n_triangles * 2 * 10000 div (degree * (degree - 1))"
            " ELSE 0 END"
        ).cast("bigint").alias("clustering_bp"),
    )


def degree_assortativity(edges: DataFrame) -> DataFrame:
    """Degree assortativity of the undirected simple graph as a signed
    Pearson coefficient in exact basis points: each undirected edge
    contributes its endpoint-degree pair in BOTH orientations (so the
    marginals of x and y coincide), and r = (M·Σxy − Σx·Σx) /
    (M·Σx² − Σx·Σx) is carried as one integer division — no square
    root needed because the x and y marginals are identical by
    construction.

    Negative assortativity (hubs link to leaves) is the signature of a
    star-shaped scrape or SEO network; positive (hubs link to hubs) of an
    organic core. The whole job is one edge-keyed degree join + a single
    global aggregate — sums fit int64 for any graph with M·maxdeg² <
    2^63/10^4 (~10^14), far beyond the host-graph grain this runs at;
    beyond that, widen the three sums to DECIMAL(38,0).

    Returns one row (n_samples, sum_deg, sum_xy, sum_xx, assort_bp);
    assort_bp = 0 when every degree is equal (variance 0, r undefined).
    """
    und = (
        edges.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .unionByName(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    )
    sym = und.select(F.col("a").alias("u"), F.col("b").alias("v")).unionByName(
        und.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    samp = (
        sym.join(deg.select(F.col("node").alias("u"), F.col("d").alias("x")), "u")
        .join(deg.select(F.col("node").alias("v"), F.col("d").alias("y")), "v")
        .select("x", "y")
    )
    m = samp.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_samples"),
        F.sum("x").cast("bigint").alias("sum_deg"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sum_xy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sum_xx"),
    )
    return m.select(
        "n_samples",
        "sum_deg",
        "sum_xy",
        "sum_xx",
        F.expr(
            "CASE WHEN n_samples * sum_xx - sum_deg * sum_deg = 0 THEN 0"
            " ELSE (n_samples * sum_xy - sum_deg * sum_deg) * 10000"
            " div (n_samples * sum_xx - sum_deg * sum_deg) END"
        ).cast("bigint").alias("assort_bp"),
    )


def boruvka_rounds(
    edges: DataFrame,
    n_rounds: int = 2,
    jump_rounds: int = 2,
) -> DataFrame:
    """Borůvka minimum-spanning-forest rounds over the undirected simple
    graph of (src, dst) edges, weights = md5-derived integers on the
    canonical edge (deterministic, engine-portable, all-distinct with
    overwhelming probability; the (w, a, b) struct-min makes ties total
    anyway). Each round: every component picks its minimum-weight
    CROSS-component incident edge (one comp-keyed struct-min — the
    classic BSP MST step), then chosen edges contract components via
    ``jump_rounds`` fixed min-label pointer-jumping iterations (the
    bounded-round contraction real BSP implementations use; the fixed
    iteration count keeps the result bit-identical on any engine,
    partitioning, or retry — a pathological chain simply finishes
    contracting a round later, visible in n_components_after).

    Returns one row per round: (round, n_components_before,
    n_edges_chosen, total_weight, n_components_after).

    Scale shape: the ENTIRE multi-round program is ONE lazy plan — the
    per-round stats are 1-row aggregates cross-joined into the result,
    so the per-round stats cost no extra passes; the iterative frames
    (edge list, labels, chosen edges, jump labels) are EAGER
    localCheckpoints — lineage MUST be truncated each step or the
    canonicalizer walks a geometrically growing logical tree (persist
    alone measured OOM at jump depth 4); each checkpointed frame is
    node-sized. Per round the work is one edge-relabel join,
    one comp-keyed argmin with map-side partials, and jump_rounds
    comp-grain joins — everything keyed on plain bigints.
    """
    und = (
        edges.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .select(
            "a", "b",
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("mst:"),
                                   F.col("a").cast("string"),
                                   F.lit(":"),
                                   F.col("b").cast("string"))), 1, 12),
                16, 10).cast("bigint").alias("w"),
        )
        .localCheckpoint()
    )
    nodes = (
        und.select(F.col("a").alias("node"))
        .unionByName(und.select(F.col("b").alias("node")))
        .distinct()
    )
    labels = nodes.select("node", F.col("node").alias("comp")) \
        .localCheckpoint()
    stat_frames = []
    for rnd in range(1, n_rounds + 1):
        n_before = labels.agg(
            F.countDistinct("comp").cast("bigint").alias("nb"))
        la = labels.select(F.col("node").alias("a"),
                           F.col("comp").alias("ca"))
        lb = labels.select(F.col("node").alias("b"),
                           F.col("comp").alias("cb"))
        cross = (und.join(la, "a").join(lb, "b")
                 .filter(F.col("ca") != F.col("cb")))
        inc = (cross.select(F.col("ca").alias("comp"), "w", "a", "b",
                            "ca", "cb")
               .unionByName(cross.select(F.col("cb").alias("comp"),
                                         "w", "a", "b", "ca", "cb")))
        pick = (inc.groupBy("comp")
                .agg(F.min(F.struct("w", "a", "b", "ca", "cb"))
                     .alias("e")))
        chosen = pick.select("e.w", "e.a", "e.b", "e.ca", "e.cb") \
            .distinct().localCheckpoint()
        st = chosen.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_edges_chosen"),
            F.coalesce(F.sum("w"), F.lit(0)).cast("bigint")
            .alias("total_weight"))
        cpairs = (chosen.select(F.col("ca").alias("c"),
                                F.col("cb").alias("d"))
                  .unionByName(chosen.select(F.col("cb").alias("c"),
                                             F.col("ca").alias("d"))))
        comps = labels.select(F.col("comp").alias("c")).distinct()
        lbl = comps.select("c", F.col("c").alias("l")).localCheckpoint()
        for _ in range(jump_rounds):
            nb = (cpairs.join(lbl.select(F.col("c").alias("d"),
                                         F.col("l").alias("dl")), "d")
                  .groupBy("c").agg(F.min("dl").alias("nl")))
            lbl = (lbl.join(nb, "c", "left")
                   .select("c", F.least(F.col("l"),
                                        F.coalesce("nl", F.col("l")))
                           .alias("l")).localCheckpoint())
        labels = (labels.join(lbl.select(F.col("c").alias("comp"),
                                         "l"), "comp")
                  .select("node", F.col("l").alias("comp"))
                  .localCheckpoint())
        n_after = labels.agg(
            F.countDistinct("comp").cast("bigint").alias("na"))
        stat_frames.append(
            st.crossJoin(F.broadcast(n_before))
            .crossJoin(F.broadcast(n_after))
            .select(F.lit(rnd).cast("bigint").alias("round"),
                    F.col("nb").alias("n_components_before"),
                    "n_edges_chosen", "total_weight",
                    F.col("na").alias("n_components_after")))
    out = stat_frames[0]
    for f in stat_frames[1:]:
        out = out.unionByName(f)
    return out
