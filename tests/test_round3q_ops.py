"""Edge-case tests for the round-3q operator batch: consistent-hash
rebalance audit and systematic PPS sampling."""

from __future__ import annotations

import __spark_entry__ as E

SF = "/root/testdata/sf0.001"


def test_shard_rebalance_ring_beats_mod(spark):
    rows = {r["strategy"]: r.asDict() for r in
            E.queries()["shard_rebalance"](spark, SF).collect()}
    # modulo growth 8->9 reshuffles most docs; the ring moves ~1/9
    assert rows["mod"]["moved_bp"] > 7000
    assert rows["ring"]["moved_bp"] < 3500
    assert rows["ring"]["n_moved"] < rows["mod"]["n_moved"]
    assert rows["mod"]["n_docs"] == rows["ring"]["n_docs"]


def test_pps_sample_hit_accounting(spark):
    import duckdb

    rows = E.queries()["pps_sample"](spark, SF).collect()
    tw = duckdb.sql(
        f"SELECT SUM(n_chars) FROM '{SF}/documents.parquet'").fetchone()[0]
    step = max(tw // 100, 1)
    total_hits = sum(r["n_hits"] for r in rows)
    # exactly one hit per full step crossed by the cumulative line
    assert total_hits == tw // step
    for r in rows:
        assert r["n_hits"] >= 1
        # a doc can be hit at most ceil(wt/step) + 1 times
        assert r["n_hits"] <= r["wt"] // step + 1


def test_pps_sample_heavy_docs_selected_more(spark):
    rows = E.queries()["pps_sample"](spark, SF).collect()
    multi = [r for r in rows if r["n_hits"] > 1]
    single = [r for r in rows if r["n_hits"] == 1]
    if multi and single:
        assert min(r["wt"] for r in multi) >= min(r["wt"] for r in single)
