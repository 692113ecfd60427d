"""PageRank semantics tests: mass conservation bounds, authority ordering,
determinism, and the python differential."""

from __future__ import annotations


def _pr_python(edges, n_iters=3, damping=85, scale=10**9):
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    n = len(nodes)
    out = {}
    for s, _ in edges:
        out[s] = out.get(s, 0) + 1
    base = ((100 - damping) * scale) // (100 * n)
    rank = {v: scale // n for v in nodes}
    for _ in range(n_iters):
        c = {}
        for s, d in edges:
            c[d] = c.get(d, 0) + (rank[s] * damping) // (100 * out[s])
        rank = {v: base + c.get(v, 0) for v in nodes}
    return rank


def test_pagerank_matches_python_differential(spark):
    from ocr_spark.functions.graph import pagerank

    edges = [(s, (s * 7 + j * 11) % 17) for s in range(17) for j in (1, 2)]
    edges = sorted({(s, d) for s, d in edges if s != d})
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["node"]: r["rank"] for r in pagerank(df, n_iters=3).collect()}
    want = _pr_python(edges)
    assert got == want


def test_pagerank_hub_outranks_leaf(spark):
    from ocr_spark.functions.graph import pagerank

    # star: everyone links to node 0; node 0 links to node 1
    edges = [(i, 0) for i in range(1, 6)] + [(0, 1)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["node"]: r["rank"] for r in pagerank(df, n_iters=3).collect()}
    assert got[0] > got[1] > got[2]
    assert got[2] == got[3] == got[4] == got[5]


def test_pagerank_partition_invariance(spark):
    from ocr_spark.functions.graph import pagerank

    edges = [(s, (s * 3 + 1) % 10) for s in range(10)] \
        + [(s, (s * 7 + 2) % 10) for s in range(10)]
    edges = sorted({(s, d) for s, d in edges if s != d})
    df = spark.createDataFrame(edges, ["src", "dst"])
    a = {r["node"]: r["rank"] for r in pagerank(df).collect()}
    b = {r["node"]: r["rank"]
         for r in pagerank(df.repartition(7)).collect()}
    assert a == b


def test_hits_star_graph(spark):
    """A directory page linking to N leaves is the max hub; leaves are the
    authorities; the hub has zero authority (no in-links)."""
    from ocr_spark.functions.graph import hits

    edges = spark.createDataFrame(
        [(0, i) for i in (1, 2, 3)] + [(9, 1)], "src long, dst long")
    got = {r.node: (r.hub, r.authority) for r in hits(edges).collect()}
    assert got[0][0] == 10**6          # the 3-leaf directory: max hub
    assert got[0][1] == 0              # nothing links to it
    assert got[9][0] < got[0][0]       # 1-leaf hub is weaker
    assert got[1][1] == 10**6          # leaf fed by both hubs: max authority
    assert got[2][1] == got[3][1] < got[1][1]
    assert got[1][0] == 0              # leaves link nowhere


def test_hits_partition_invariance(spark):
    from ocr_spark.functions.graph import hits

    edges = spark.createDataFrame(
        [(i % 7, (i * 13 + 29) % 7) for i in range(40) if i % 7 != (i * 13 + 29) % 7],
        "src long, dst long")
    a = {(r.node, r.hub, r.authority) for r in hits(edges).collect()}
    b = {(r.node, r.hub, r.authority)
         for r in hits(edges.repartition(13)).collect()}
    assert a == b
