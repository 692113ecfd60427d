"""Edge-case tests for the round-3s operator batch: equal-mass binning
and the hash-partitioner chi-square audit."""

from __future__ import annotations

import __spark_entry__ as E

SF = "/root/testdata/sf0.001"


def test_equimass_bins_monotone_and_terminal(spark):
    import duckdb

    rows = {r["decile"]: r["edge"] for r in
            E.queries()["equimass_bins"](spark, SF).collect()}
    assert sorted(rows) == list(range(1, 11))
    edges = [rows[k] for k in range(1, 11)]
    assert edges == sorted(edges)
    vmax = duckdb.sql(
        f"SELECT MAX(n_chars) FROM '{SF}/documents.parquet'").fetchone()[0]
    assert edges[-1] == vmax  # the 10th edge is the max value


def test_equimass_bins_mass_balance(spark):
    import duckdb

    rows = {r["decile"]: r["edge"] for r in
            E.queries()["equimass_bins"](spark, SF).collect()}
    n = duckdb.sql(
        f"SELECT COUNT(*) FROM '{SF}/documents.parquet'").fetchone()[0]
    # ceil rule: at least k*n/10 docs lie at or below edge k
    for k in range(1, 11):
        at_or_below = duckdb.sql(
            f"SELECT COUNT(*) FROM '{SF}/documents.parquet'"
            f" WHERE n_chars <= {rows[k]}").fetchone()[0]
        assert at_or_below * 10 >= k * n


def test_partition_chi2_healthy_hash(spark):
    r = E.queries()["partition_chi2"](spark, SF).collect()[0]
    assert r["uniform_ok"] == 1  # md5 must partition uniformly
    assert r["chi2_scaled"] < 62
    assert r["n_docs"] > 0


def test_partition_chi2_formula(spark):
    r = E.queries()["partition_chi2"](spark, SF).collect()[0]
    assert r["chi2_scaled"] == r["chi2_num"] // (32 * r["n_docs"])
