"""Edge-case tests for the round-3o operator batch: the curation filter
funnel and host common-prefix boilerplate detection."""

from __future__ import annotations

import __spark_entry__ as E

SF = "/root/testdata/sf0.001"


def test_filter_funnel_is_monotone(spark):
    r = E.queries()["filter_funnel"](spark, SF).collect()[0]
    assert r["n_total"] >= r["n_quality"] >= r["n_lang"] >= r["n_final"]
    assert r["n_final"] > 0
    for c in ("quality_drop_bp", "lang_drop_bp", "dedup_drop_bp"):
        assert 0 <= r[c] <= 10000


def test_filter_funnel_lang_stage_matches_direct_count(spark):
    import duckdb

    r = E.queries()["filter_funnel"](spark, SF).collect()[0]
    en = duckdb.sql(
        f"SELECT COUNT(*) FROM '{SF}/documents.parquet'"
        " WHERE lang = 'en'").fetchone()[0]
    assert r["n_lang"] <= en  # lang stage can never keep more than en docs


def test_host_common_prefix_lcp_identity(spark):
    from pyspark.sql import functions as F

    # three strings sharing 'abc' prefix: LCP(all) == LCP(min, max)
    rows = [(1, "abcXzz"), (1, "abcQ"), (1, "abcM")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    # reuse the query's building blocks directly on a tiny frame
    mm = df.groupBy("doc_id").agg(
        F.min("text").alias("lo"), F.max("text").alias("hi"))
    pos = mm.select(
        "lo", "hi",
        F.explode(F.sequence(F.lit(1), F.least(
            F.length("lo"), F.length("hi")))).alias("i"))
    lcp = pos.agg(F.coalesce(
        F.min(F.when(F.expr("substr(lo, i, 1) <> substr(hi, i, 1)"),
                     F.col("i") - 1)),
        F.least(F.length(F.first("lo")), F.length(F.first("hi")))
        .cast("bigint")).alias("lcp")).collect()[0]["lcp"]
    assert lcp == 3


def test_host_common_prefix_bounds(spark):
    rows = {r["host"]: r.asDict() for r in
            E.queries()["host_common_prefix"](spark, SF).collect()}
    assert len(rows) == 9
    for h, r in rows.items():
        # every synthetic host shares at least 'NAV hX | home | about | '
        assert r["lcp_len"] >= len(f"NAV {h} | home | about | ")
        assert 0 < r["boilerplate_bp"] <= 10000
    # hosts 0-2 diverge at 'section N' -> their LCP stops there
    assert rows["h0"]["lcp_len"] <= len("NAV h0 | home | about | section ")
