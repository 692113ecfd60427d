"""Edge-case tests for the round-3y operator batch: exact length
moments and canonical-vs-content agreement."""

from __future__ import annotations

import __spark_entry__ as E

SF = "/root/testdata/sf0.001"


def test_length_moments_match_numpy(spark):
    import duckdb
    import numpy as np

    rows = {r["source"]: r.asDict() for r in
            E.queries()["length_moments"](spark, SF).collect()}
    data = duckdb.sql(
        f"SELECT source, n_chars FROM '{SF}/documents.parquet'").fetchall()
    by_src = {}
    for s, x in data:
        by_src.setdefault(s, []).append(float(x))
    import math

    for s, xs in by_src.items():
        if s not in rows:
            continue
        a = np.array(xs)
        m2 = ((a - a.mean()) ** 2).mean()
        m3 = ((a - a.mean()) ** 3).mean()
        m4 = ((a - a.mean()) ** 4).mean()
        skew = m3 / m2 ** 1.5
        kurt = m4 / m2 ** 2
        assert abs(rows[s]["skew_micro"] - math.floor(1e6 * skew)) <= 2
        assert abs(rows[s]["kurt_micro"] - math.floor(1e6 * kurt)) <= 2


def test_canonical_content_mismatch_accounting(spark):
    r = E.queries()["canonical_content_mismatch"](spark, SF).collect()[0]
    assert r["n_mismatched"] <= r["n_multi_url"] <= r["n_canonical_groups"]
    # fixture plants cloaked bodies on doc_id % 10 == 9 -> mismatches exist
    assert r["n_mismatched"] > 0
    assert 0 < r["mismatch_bp"] <= 10000


def test_delete_audit_clean_surface_zero_stale_flagged(spark):
    rows = {r["surface"]: r.asDict() for r in
            E.queries()["delete_audit"](spark, SF).collect()}
    assert rows["chunks"]["n_leaked"] == 0
    assert rows["chunks"]["leak_bp"] == 0
    # the stale surface MUST be caught — the audit can fail
    assert rows["stale_postings"]["n_leaked"] > 0
    assert rows["stale_postings"]["n_rows"] > rows["chunks"]["n_rows"]


def test_agg_delta_merge_always_matches_full(spark):
    rows = E.queries()["agg_delta_merge"](spark, SF).collect()
    assert rows
    assert all(r["matches_full"] == 1 for r in rows)
    assert all(r["min_chars"] <= r["max_chars"] for r in rows)


def test_metric_correlation_length_vs_words_strongly_positive(spark):
    rows = E.queries()["metric_correlation"](spark, SF).collect()
    assert rows
    for r in rows:
        # chars and word count are near-linearly related in any corpus
        assert 8000 <= r["corr_bp"] <= 10000


def test_metric_correlation_matches_numpy(spark):
    import duckdb
    import math
    import numpy as np

    rows = {r["source"]: r["corr_bp"] for r in
            E.queries()["metric_correlation"](spark, SF).collect()}
    data = duckdb.sql(f"""
      SELECT source, n_chars,
             len(string_split_regex(trim(text), '\\s+'))
      FROM '{SF}/documents.parquet' WHERE length(trim(text)) > 0
    """).fetchall()
    by = {}
    for s, x, y in data:
        by.setdefault(s, []).append((float(x), float(y)))
    for s, xy in by.items():
        if s not in rows or len(xy) < 3:
            continue
        a = np.array(xy)
        r = np.corrcoef(a[:, 0], a[:, 1])[0, 1]
        assert abs(rows[s] - math.floor(10000 * r)) <= 2


def test_lang_id_accuracy_rollup_consistency(spark):
    rows = {r["labeled_lang"]: r.asDict() for r in
            E.queries()["lang_id_accuracy"](spark, SF).collect()}
    assert set(rows) == {"en", "de", "fr", "es", "zh"}
    for r in rows.values():
        assert 0 <= r["n_correct"] <= r["n_docs"]
        assert r["acc_bp"] == r["n_correct"] * 10000 // r["n_docs"]
    # zh has no marker list -> can never be predicted correctly
    assert rows["zh"]["n_correct"] == 0
