"""Edge-case tests for the round-3i operator batch: embedding outliers,
group entropy, RSS/Atom feed parsing, and hreflang clique grouping."""

from __future__ import annotations

from ocr_spark.functions.curation import feed_parse, group_entropy
from ocr_spark.functions.similarity import embedding_outliers

SF = "/root/testdata/sf0.001"


def test_embedding_outliers_flags_the_planted_glitch(spark):
    # 30 unit-ish vectors + one 100x-magnitude glitch in group 'b'
    rows = [(i, [0.1, 0.1, 0.1, 0.1], "a") for i in range(30)]
    rows += [(99, [10.0, -10.0, 10.0, -10.0], "b")]
    df = spark.createDataFrame(rows, ["vec_id", "emb", "grp"])
    out = {r["grp"]: r.asDict() for r in
           embedding_outliers(df, "vec_id", "emb", "grp").collect()}
    assert out["b"]["n_outliers"] == 1 and out["b"]["outlier_bp"] == 10000
    assert out["a"]["n_outliers"] == 0


def test_embedding_outliers_uniform_corpus_has_none(spark):
    rows = [(i, [0.5, 0.5], "a") for i in range(20)]
    df = spark.createDataFrame(rows, ["vec_id", "emb", "grp"])
    r = embedding_outliers(df, "vec_id", "emb", "grp").collect()[0]
    assert r["n_vecs"] == 20 and r["n_outliers"] == 0


def test_group_entropy_pure_group_is_zero(spark):
    df = spark.createDataFrame([("g", "en")] * 7, ["g", "k"])
    r = group_entropy(df, "g", "k").collect()[0]
    assert r["n_classes"] == 1 and r["entropy_micro"] == 0


def test_group_entropy_uniform_mix_is_ln_k(spark):
    import math

    rows = [("g", lang) for lang in ("en", "de", "fr", "hi") for _ in range(5)]
    df = spark.createDataFrame(rows, ["g", "k"])
    r = group_entropy(df, "g", "k").collect()[0]
    assert r["n_classes"] == 4
    assert abs(r["entropy_micro"] - round(math.log(4) * 1e6)) <= 2


def test_group_entropy_skew_below_uniform(spark):
    rows = [("g", "en")] * 97 + [("g", "de")] * 3
    df = spark.createDataFrame(rows, ["g", "k"])
    r = group_entropy(df, "g", "k").collect()[0]
    assert 0 < r["entropy_micro"] < 693147  # strictly under ln(2)


def test_feed_parse_atom_and_rss_forms(spark):
    atom = ('<feed><entry><title> T1 </title>'
            '<link href="http://a/1"/>'
            '<published>2026-01-01</published></entry></feed>')
    rss = ('<rss><channel><item><title>T2</title>'
           '<link> http://r/2 </link><pubDate>Jan 2</pubDate></item>'
           '<ITEM><TITLE>T3</TITLE></ITEM></channel></rss>')
    junk = "<html>nope</html>"
    df = spark.createDataFrame(
        [("h1", atom), ("h2", rss), ("h3", junk)], ["host", "xml"])
    rows = {(r["host"], r["pos"]): r.asDict()
            for r in feed_parse(df, "host", "xml").collect()}
    assert rows[("h1", 0)]["title"] == "T1"
    assert rows[("h1", 0)]["link"] == "http://a/1"
    assert rows[("h1", 0)]["kind"] == "atom"
    assert rows[("h2", 0)]["link"] == "http://r/2"  # whitespace stripped
    assert rows[("h2", 0)]["published"] == "Jan 2"
    assert rows[("h2", 1)]["title"] == "T3"         # uppercase tags
    assert rows[("h2", 1)]["link"] == ""            # missing link degrades
    assert not [k for k in rows if k[0] == "h3"]    # junk yields no rows


def test_hreflang_groups_cluster_sizes(spark):
    import __spark_entry__ as E

    rows = E.queries()["hreflang_groups"](spark, SF).collect()
    assert rows
    for r in rows:
        assert 1 <= r["n_pages"] <= 4
        assert r["cluster_id"] <= r["first_url"]
