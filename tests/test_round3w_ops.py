"""Edge-case tests for the round-3w operator batch: publish-date
inference, link contexts, and crawl-freshness lag."""

from __future__ import annotations

import __spark_entry__ as E

SF = "/root/testdata/sf0.001"


def test_doc_date_infer_votes_beat_decoy(spark):
    rows = {r["doc_id"]: r.asDict() for r in
            E.queries()["doc_date_infer"](spark, SF).collect()}
    for doc, r in rows.items():
        # the true date appears twice; the decoy (doc % 3 == 0) once
        assert r["votes"] == 2
        assert r["inferred_date"] != "1999-12-31"
        if doc % 3 == 0:
            assert r["n_distinct"] == 2 and r["n_dates"] == 3
        else:
            assert r["n_distinct"] == 1 and r["n_dates"] == 2


def test_link_contexts_extracts_both_urls(spark):
    rows = [r.asDict() for r in
            E.queries()["link_contexts"](spark, SF).collect()
            if r["doc_id"] == 1]
    urls = {r["url"] for r in rows}
    assert "http://h1.example/p1" in urls
    assert "https://h1.example/q" in urls
    by_url = {r["url"]: r for r in rows}
    assert by_url["http://h1.example/p1"]["before_ctx"] == "words see"
    assert by_url["http://h1.example/p1"]["after_ctx"] == "for details"


def test_freshness_lag_bounds(spark):
    rows = E.queries()["freshness_lag"](spark, SF).collect()
    assert rows
    for r in rows:
        # lag = (doc_id % 5) * 3 in the fixture: 0..12 days
        assert 0 <= r["p50_lag_days"] <= r["max_lag_days"] <= 12
        assert r["n_crawled"] > 0
