"""Edge-case tests for the round-4 curation batch: CCNet perplexity
buckets, declared-lang audit, and outlink-spam scoring."""

from __future__ import annotations

from ocr_spark.functions.curation import ccnet_buckets, declared_lang_mismatch
from ocr_spark.functions.graph import link_spam_score


def _rows(df, key):
    return {r[key]: r.asDict() for r in df.collect()}


class TestCcnetBuckets:
    def test_terciles_and_drop_set(self, spark):
        # 6 'en' docs: 3 fluent repeats (low self-ppl), 3 unique-gibberish
        # (high self-ppl); 1-word and empty docs land in the NULL drop set.
        rows = [
            (1, "the cat sat on the mat", "en"),
            (2, "the cat sat on the mat", "en"),
            (3, "the cat sat on the mat", "en"),
            (4, "zq vw xj kp qn rm", "en"),
            (5, "bb cc dd ee ff gg", "en"),
            (6, "uu ii oo aa yy ww", "en"),
            (7, "single", "en"),
            (8, "", "en"),
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
        out = _rows(ccnet_buckets(df, "doc_id", "text", "lang"), "doc")
        assert out[7]["bucket"] is None and out[7]["score_micro"] is None
        assert out[8]["bucket"] is None
        # the three identical fluent docs tie on score -> same bucket (head)
        assert out[1]["bucket"] == out[2]["bucket"] == out[3]["bucket"] == "head"
        # gibberish scores strictly higher than the repeats
        assert out[4]["score_micro"] > out[1]["score_micro"]
        # every scored doc got a bucket
        assert all(out[i]["bucket"] in ("head", "middle", "tail")
                   for i in (1, 2, 3, 4, 5, 6))

    def test_languages_bucket_independently(self, spark):
        # one language's score scale must not leak into another's cuts:
        # 'xx' docs all tie -> all land in head regardless of 'en' spread.
        rows = [(i, "the cat sat on the mat", "xx") for i in range(3)]
        rows += [(10, "the cat sat on the mat", "en"),
                 (11, "zq vw xj kp qn rm", "en")]
        df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
        out = _rows(ccnet_buckets(df, "doc_id", "text", "lang"), "doc")
        assert {out[i]["bucket"] for i in range(3)} == {"head"}


class TestDeclaredLangMismatch:
    def test_variants_and_rollup(self, spark):
        rows = [
            (1, '<html lang="en"><body>', "en", "a"),       # match
            (2, '<html lang="en"><body>', "de", "a"),       # mismatch
            (3, '<HTML LANG="DE-at"><body>', "de", "a"),    # case+region match
            (4, "<html><body>", "fr", "a"),                  # undeclared
            (5, '<html  lang = "fr"><body>', "fr", "b"),    # padded attr match
        ]
        df = spark.createDataFrame(rows, ["doc_id", "html", "lang", "source"])
        out = _rows(
            declared_lang_mismatch(df, "doc_id", "html", "lang", "source"), "grp")
        a = out["a"]
        assert a["n_docs"] == 4 and a["n_declared"] == 3 and a["n_mismatch"] == 1
        assert a["mismatch_bp"] == 3333
        b = out["b"]
        assert b["n_mismatch"] == 0 and b["mismatch_bp"] == 0

    def test_no_declared_gives_null_rate(self, spark):
        df = spark.createDataFrame(
            [(1, "<html><body>", "en", "a")], ["doc_id", "html", "lang", "source"])
        out = _rows(
            declared_lang_mismatch(df, "doc_id", "html", "lang", "source"), "grp")
        assert out["a"]["n_declared"] == 0 and out["a"]["mismatch_bp"] is None


class TestLinkSpamScore:
    def test_farm_reciprocal_and_normal(self, spark):
        edges = []
        edges += [("farmhost", "money") for _ in range(30)]     # low diversity
        edges += [("x", "y"), ("y", "x"), ("x", "t1"), ("y", "t2")]  # reciprocal
        edges += [("ok", f"t{i}") for i in range(5)]            # diverse, few
        df = spark.createDataFrame(edges, ["src", "dst"])
        out = _rows(link_spam_score(df, "src", "dst"), "src")
        farm = out["farmhost"]
        assert farm["n_links"] == 30 and farm["n_targets"] == 1
        assert farm["diversity_bp"] == 333 and farm["spam_flag"] == 1
        assert out["x"]["n_reciprocal"] == 1 and out["x"]["spam_flag"] == 1
        assert out["y"]["spam_flag"] == 1
        ok = out["ok"]
        assert ok["diversity_bp"] == 10000 and ok["spam_flag"] == 0

    def test_self_links_do_not_count_as_reciprocal(self, spark):
        df = spark.createDataFrame(
            [("s", "s"), ("s", "t")], ["src", "dst"])
        out = _rows(link_spam_score(df, "src", "dst"), "src")
        assert out["s"]["n_reciprocal"] == 0 and out["s"]["spam_flag"] == 0
