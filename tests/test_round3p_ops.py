"""Edge-case tests for the round-3p operator batch: entity census,
F1-optimal threshold sweep, and per-source embedding centroid drift."""

from __future__ import annotations

import __spark_entry__ as E

SF = "/root/testdata/sf0.001"


def test_entity_census_planted_counts(spark):
    import duckdb

    rows = E.queries()["entity_census"](spark, SF).collect()
    tot = {k: sum(r[k] for r in rows)
           for k in ("n_docs", "n_email", "n_phone", "n_id12",
                     "n_url", "n_ip")}
    n = duckdb.sql(
        f"SELECT COUNT(*) FROM '{SF}/documents.parquet'").fetchone()[0]
    assert tot["n_docs"] == n
    # each doc_id%3 family plants exactly its entity type
    assert tot["n_email"] >= (n // 3)
    assert tot["n_phone"] >= (n // 3) - 1
    assert tot["n_url"] >= (n // 3) - 1
    assert tot["n_ip"] >= (n // 3) - 1
    assert tot["n_id12"] >= (n // 3) - 1


def test_f1_sweep_beats_trivial_thresholds(spark):
    import duckdb

    r = E.queries()["f1_threshold_sweep"](spark, SF).collect()[0]
    assert 0 < r["f1_bp"] <= 10000
    assert r["tp"] > 0
    # the chosen threshold's F1 must beat predict-everything (thr = min)
    n, n_pos = duckdb.sql(f"""
      SELECT COUNT(*), SUM(CASE WHEN list_contains(
        string_split_regex(lower(trim(text)), '\\s+'), 'the')
        THEN 1 ELSE 0 END)
      FROM '{SF}/documents.parquet'""").fetchone()
    f1_all = 20000 * n_pos // (2 * n_pos + (n - n_pos))
    assert r["f1_bp"] >= f1_all


def test_f1_sweep_identity(spark):
    r = E.queries()["f1_threshold_sweep"](spark, SF).collect()[0]
    assert r["f1_bp"] == 20000 * r["tp"] // (2 * r["tp"] + r["fp"]
                                             + r["fn"])


def test_source_centroid_drift_bounds(spark):
    rows = E.queries()["source_centroid_drift"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r["drift_d2"] >= 0
        assert r["n_vecs"] > 0
    # fixture labels are assigned from the same distribution: no label
    # should drift wildly more than every other (sanity scale check)
    drifts = sorted(r["drift_d2"] for r in rows)
    assert drifts[-1] < 10**15
