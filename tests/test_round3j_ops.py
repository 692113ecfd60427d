"""Edge-case tests for the round-3j operator batch: fetch-status rollup,
script-switch runs, URL-token entropy, and BM25 nDCG eval."""

from __future__ import annotations

import __spark_entry__ as E

SF = "/root/testdata/sf0.001"


def test_fetch_status_rollup_accounting(spark):
    rows = {r["host"]: r.asDict() for r in
            E.queries()["fetch_status_rollup"](spark, SF).collect()}
    assert rows
    for r in rows.values():
        assert r["c2xx"] + r["c3xx"] + r["c4xx"] + r["c5xx"] == r["n_fetches"]
        assert 0 <= r["ok_bp"] <= 10000
        # p95 is an actual observed latency value
        assert 1000 <= r["p95_lat_micros"] <= 997000
        assert r["lat_sum_micros"] >= r["n_fetches"] * 1000


def test_script_runs_hand_counts(spark):
    # spot-check the synthetic families at sf0.001:
    # doc 0 (m=0): one देव two слово 汉 three -> classes
    # latin,deva,latin,cyr,han,latin -> 5 switches, 6 words
    rows = {r["doc_id"]: r.asDict() for r in
            E.queries()["script_runs"](spark, SF).collect()}
    assert rows[0]["n_words"] == 6 and rows[0]["n_switches"] == 5
    # doc 3 (m=3): '7 word семь 77 слово' -> digit,latin,cyr,digit,cyr
    assert rows[3]["n_words"] == 5 and rows[3]["n_switches"] == 4
    # doc 2 (m=2): pure-latin document text -> zero switches
    assert rows[2]["n_switches"] == 0


def test_url_token_entropy_traps_rank_highest(spark):
    rows = {r["host"]: r.asDict() for r in
            E.queries()["url_token_entropy"](spark, SF).collect()}
    # hosts h0-h2 mint unique tokens (traps), h3+ reuse five
    trap = min(rows[f"h{i}"]["entropy_micro"] for i in range(3))
    clean = max(rows[f"h{i}"]["entropy_micro"] for i in range(3, 11))
    assert trap > clean
    for i in range(3):
        # unique tokens -> entropy == ln(n) exactly (every count is 1)
        assert rows[f"h{i}"]["n_classes"] == rows[f"h{i}"]["n_rows"]


def test_bm25_ndcg_bounds_and_consistency(spark):
    r = E.queries()["bm25_ndcg"](spark, SF).collect()[0]
    assert 0 < r["ndcg_bp"] <= 10000
    assert r["dcg_micro"] <= r["idcg_micro"]
    # ideal list exists: at least one doc carries a query term
    assert r["idcg_micro"] > 0
