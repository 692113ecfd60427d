"""Unit tests for the crawl-analytics batch: collocations, mirror-host
detection, recrawl change rate, leakage-safe splits. Value assertions on
small frames; the sf0.01 value oracles are the cross-engine gate."""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def test_pmi_collocations_counts_and_rank(spark):
    rows = QUERIES["pmi_collocations"](spark, SF).collect()
    assert rows, "collocation top-k must be non-empty on the test corpus"
    assert all(r.c_xy >= 3 for r in rows)
    # rank is dense 1..n in (c_xy desc, w1, w2) order
    ordered = sorted(rows, key=lambda r: (-r.c_xy, r.w1, r.w2))
    assert [r.rank for r in ordered] == list(range(1, len(rows) + 1))
    # lift components: num/den = c_xy * n_bi / (c_w1 * c_w2) > 0
    assert all(r.lift_num > 0 and r.lift_den > 0 for r in rows)


def test_pmi_collocations_exact_on_tiny_frame(spark, tmp_path):
    d = str(tmp_path / "sf")
    spark.createDataFrame(
        [(1, "a b a b c", "en", "s", 9), (2, "a b x", "en", "s", 5)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{d}/documents.parquet")
    rows = {(r.w1, r.w2): (r.c_xy, r.lift_num, r.lift_den)
            for r in QUERIES["pmi_collocations"](spark, d).collect()}
    # bigrams: (a,b)x3 (b,a)x1 (b,c)x1 (b,x)x1 -> n_bi=6; only (a,b) >= 3
    # marginals over bigram slots: c_a. = 3, c_.b = 3
    assert rows == {("a", "b"): (3, 3 * 6, 3 * 3)}


def test_mirror_hosts_finds_planted_mirrors(spark):
    rows = QUERIES["mirror_hosts"](spark, SF).collect()
    assert rows, "the %3==0 mirror fixture must produce shared hosts"
    for r in rows:
        # every pair involves one primary (h*) and one mirror (m*) host,
        # shares at least 2 fingerprints, and overlap <= each side's total
        assert r.shared >= 2
        assert r.shared <= min(r.n_fp_a, r.n_fp_b)
        assert {r.host_a[0], r.host_b[0]} <= {"h", "m"}
    # mirror m<y> of doc k is h<k%40>'s copy only when k%5 == y%5-compatible:
    # every planted pair must satisfy x % 5 == y for (h<x>, m<y>)
    for r in rows:
        a, b = sorted([r.host_a, r.host_b])
        if a[0] == "h" and b[0] == "m":
            assert int(a[1:]) % 5 == int(b[1:])


def test_recrawl_deltas_change_rate_shape(spark):
    rows = {r.url: r for r in QUERIES["recrawl_deltas"](spark, SF).collect()}
    assert rows
    for r in rows.values():
        assert 0 <= r.n_changes < r.n_visits  # first visit is never a change
        assert r.first_ts <= r.last_ts
    # urls with k=1 (rev advances every visit) change on every revisit when
    # the revision counter increments; verify one concrete url exactly
    import duckdb

    want = duckdb.sql(f"""
      WITH v AS (SELECT 'u' || CAST(doc_id % 97 AS VARCHAR) url,
                        doc_id ts,
                        (doc_id // 97) // ((doc_id % 97) % 3 + 1) rev
                 FROM '{SF}/documents.parquet'),
      d AS (SELECT url, rev, LAG(rev) OVER (PARTITION BY url ORDER BY ts) p FROM v)
      SELECT url, SUM(CASE WHEN p IS NOT NULL AND rev <> p THEN 1 ELSE 0 END) c
      FROM d GROUP BY url
    """).fetchall()
    for url, c in want:
        assert rows[url].n_changes == c


def test_leakage_split_host_level_never_straddles(spark):
    rows = {r.split: r for r in QUERIES["leakage_split"](spark, SF).collect()}
    assert set(rows) == {"train", "val"}
    # the doc-level hash split DOES scatter hosts; the host-level one cannot
    assert rows["train"].naive_straddle_hosts > 0
    total_hosts = rows["train"].n_hosts + rows["val"].n_hosts
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n_hosts_true = docs.select((F.col("doc_id") % 40).alias("h")).distinct().count()
    assert total_hosts == n_hosts_true  # partition of hosts: no overlap, no loss


def test_leakage_split_stable_under_repartition(spark, tmp_path):
    out1 = {(r.split, r.n_docs, r.n_hosts, r.n_tokens)
            for r in QUERIES["leakage_split"](spark, SF).collect()}
    d = str(tmp_path / "sf")
    spark.read.parquet(f"{SF}/documents.parquet").repartition(13).write.parquet(
        f"{d}/documents.parquet")
    out2 = {(r.split, r.n_docs, r.n_hosts, r.n_tokens)
            for r in QUERIES["leakage_split"](spark, d).collect()}
    assert out1 == out2


def test_bpe_merges_hand_computed(spark):
    from ocr_spark.functions.curation import bpe_merges

    # corpus word dict: low x3, lower x2, newest x1 (classic BPE example)
    df = spark.createDataFrame(
        [("low low low lower lower newest",)], "text string")
    got = [(r.rank, r.left, r.right, r.pair_count)
           for r in bpe_merges(df, "text", n_merges=3).collect()]
    got.sort()
    # pairs: l-o 5, o-w 5, w-e 3, e-r 2, ... argmax ties (5) break on
    # left asc: ('l','o') first; after merging -> lo: (lo,w) 5 wins;
    # after -> low: (low,e) 2, (e,r) 2, (w,e) 1(newest)... recount:
    # words: low(5 as lo->low), lower x2 -> l o w e r; newest x1
    # after low merge: lower = "low e r", newest = "n e w e s t"
    # pairs: (low,e) 2, (e,r) 2, (n,e) 1, (e,w) 1, (w,e) 1, (e,s) 1, (s,t) 1
    # argmax tie (2): (e,r) vs (low,e) -> 'e' < 'low' lexicographically
    assert got[0] == (1, "l", "o", 5)
    assert got[1] == (2, "lo", "w", 5)
    assert got[2] == (3, "e", "r", 2)


def test_bpe_merges_partition_invariant(spark):
    from ocr_spark.functions.curation import bpe_merges

    df = spark.read.parquet(f"{SF}/documents.parquet")
    a = {tuple(r) for r in bpe_merges(df.select("text"), "text").collect()}
    b = {tuple(r)
         for r in bpe_merges(df.repartition(13).select("text"), "text").collect()}
    assert a == b and len(a) == 3


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_recrawl_deltas_single_exchange(spark):
    """The lag window and the per-url agg must share ONE url partitioning;
    a second Exchange is a plan regression."""
    plan = _plan(QUERIES["recrawl_deltas"](spark, SF))
    assert plan.count("Exchange") == 1


def test_leakage_split_assignment_is_projection(spark):
    """Split assignment must not shuffle: every Exchange in the plan
    belongs to the two aggs (host-keyed leak counter, split-keyed report)
    and the one-row broadcast — never to assigning rows to splits."""
    plan = _plan(QUERIES["leakage_split"](spark, SF))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    # the leak counter must arrive broadcast, not as a shuffled join
    assert "SortMergeJoin" not in plan


def test_pmi_collocations_no_cartesian_blowup(spark):
    """The only nested-loop join allowed is the broadcast of the ONE-ROW
    totals frame; the bigram/marginal joins must be hash joins."""
    plan = _plan(QUERIES["pmi_collocations"](spark, SF))
    nlj = plan.count("CartesianProduct")
    assert nlj == 0, "cartesian product in the collocation plan"


def test_bpe_merges_no_driver_iteration(spark):
    """The 3-merge program is ONE lazy plan: the argmax frames join back
    as broadcasts (1 row each), never shuffled, never collected."""
    from ocr_spark.functions.curation import bpe_merges

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(bpe_merges(docs.select("text"), "text"))
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_bpe_tokenize_hand_computed(spark):
    from ocr_spark.functions.curation import bpe_tokenize

    df = spark.createDataFrame(
        [(1, "low low low lower lower newest"), (2, "low x% low")],
        "doc_id long, text string")
    got = {r.doc: (r.n_words, r.n_tokens, r.n_skipped)
           for r in bpe_tokenize(df, "doc_id", "text").collect()}
    # corpus merges (incl. doc 2's lows): (l,o)->(lo,w)->... counts: lo 7,
    # then (lo,w) 7, then pairs: (low,e) 2 vs (e,r) 2 -> 'e' wins -> er
    # final syms: low -> [low] (1); lower -> [low,er] (2);
    # newest -> [n,e,w,e,s,t] (6); x% skipped
    assert got[1] == (6, 3 * 1 + 2 * 2 + 6, 0)
    assert got[2] == (2, 2 * 1, 1)


def test_extraction_eval_hand_computed(spark):
    from ocr_spark.functions.curation import extraction_eval

    df = spark.createDataFrame(
        [
            # gold bag {a:2,b:1}, pred bag {a:1,c:1}: overlap 1
            (1, "a c", "A a b"),
            # perfect match incl. case fold
            (2, "X y", "x Y"),
            # empty pred vs non-empty gold
            (3, "   ", "a b"),
            # both empty
            (4, "", " "),
        ],
        "doc long, pred string, gold string",
    )
    rows = {r.doc: r for r in extraction_eval(df, "doc", "pred", "gold").collect()}
    assert (rows[1].pred_n, rows[1].gold_n, rows[1].overlap) == (2, 3, 1)
    assert (rows[1].precision_bp, rows[1].recall_bp) == (5000, 3333)
    assert rows[1].f1_bp == (2 * 5000 * 3333) // (5000 + 3333)  # 4000
    assert (rows[2].precision_bp, rows[2].recall_bp, rows[2].f1_bp) == (
        10000, 10000, 10000)
    assert (rows[3].pred_n, rows[3].precision_bp, rows[3].recall_bp,
            rows[3].f1_bp) == (0, 0, 0, 0)
    assert (rows[4].pred_n, rows[4].gold_n, rows[4].f1_bp) == (0, 0, 0)


def test_extraction_eval_query_degradation_profile(spark, tmp_path):
    from ocr_spark.queries import QUERIES

    d = str(tmp_path / "sf")
    spark.createDataFrame(
        [(1, "a a b c d e f g", "en", "s", 15)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{d}/documents.parquet")
    r = QUERIES["extraction_eval"](spark, d).collect()[0]
    # pred drops token 7 ('f') and appends the 5-token boilerplate tail:
    # pred_n = 7 + 5 = 12, gold_n = 8, overlap = 7
    assert (r.pred_n, r.gold_n, r.overlap) == (12, 8, 7)
    assert (r.precision_bp, r.recall_bp, r.f1_bp) == (5833, 8750, 6999)


def test_surt_key_rules(spark):
    from pyspark.sql import functions as F
    from ocr_spark.functions.curation import surt_key

    cases = {
        # www strip + case fold + label reversal + query sort
        "https://WWW.Sub.Example.COM/A/B?b=2&a=1": "com,example,sub)/a/b?a=1&b=2",
        # bare authority -> explicit root; default port dropped with authority
        "HTTP://Host.org:8080": "org,host)/",
        # IPv6 literal stays verbatim, port dropped
        "http://[2001:DB8::1]:443/x": "2001:db8::1)/x",
        # dotted-quad stays verbatim
        "http://10.0.0.1/p": "10.0.0.1)/p",
        # fragment dropped; single-param query keeps its '?'
        "https://e.com/p?k=v#frag": "com,e)/p?k=v",
    }
    df = spark.createDataFrame([(u,) for u in cases], "url string")
    got = {r.url: r.k for r in df.select("url", surt_key(F.col("url")).alias("k")).collect()}
    assert got == cases


def test_cdx_index_revisit_semantics(spark):
    from ocr_spark.functions.curation import cdx_index

    df = spark.createDataFrame(
        [
            # same key (www/query-order alias), same content: 2nd is a revisit
            (1, "https://www.a.com/x?b=2&a=1", 10, "same"),
            (2, "https://A.com/x?a=1&b=2", 20, "same"),
            # same key, changed content: NOT a revisit
            (3, "https://a.com/x?a=1&b=2", 30, "changed"),
            # other key
            (4, "https://b.com/", 5, "same"),
        ],
        "cap long, url string, ts long, text string",
    )
    rows = {r.capture: r
            for r in cdx_index(df, "cap", "url", "ts", "text").collect()}
    assert rows[1].urlkey == rows[2].urlkey == rows[3].urlkey
    assert (rows[1].is_revisit, rows[2].is_revisit, rows[3].is_revisit) == (0, 1, 0)
    assert rows[1].n_captures == 3 and rows[4].n_captures == 1
    # same-content doc on a DIFFERENT key never counts as a revisit
    assert rows[4].is_revisit == 0


def test_url_patterns_templating(spark):
    from ocr_spark.functions.curation import url_patterns

    urls = (
        [(f"https://t.com/cal?d=20240{i:02d}",) for i in range(1, 21)]  # trap
        + [("https://t.com/page/1",), ("https://t.com/page/1",)]  # repeat, bounded
        + [("https://t.com/s/deadbeef1234",)]  # hex id -> H
    )
    df = spark.createDataFrame(urls, "url string")
    got = {r.pattern: (r.n_urls, r.n_distinct, r.is_trap)
           for r in url_patterns(df, "url").collect()}
    assert got["/cal?d=V"] == (20, 20, 1)
    assert got["/page/N"] == (2, 1, 0)
    assert got["/s/H"] == (1, 1, 0)
