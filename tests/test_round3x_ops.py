"""Edge-case tests for the round-3x operator batch: Luhn card-number
validation and locale-aware numeric parsing."""

from __future__ import annotations

import __spark_entry__ as E

SF = "/root/testdata/sf0.001"


def test_luhn_pii_separates_valid_from_decoy(spark):
    rows = E.queries()["luhn_pii"](spark, SF).collect()
    n_cand = sum(r["n_candidates"] for r in rows)
    n_valid = sum(r["n_luhn_valid"] for r in rows)
    # the fixture plants one valid card per doc%3==0 and one decoy per
    # doc%3==1 — roughly half the candidates validate
    assert 0 < n_valid < n_cand
    for r in rows:
        assert 0 <= r["valid_bp"] <= 10000


def test_locale_numbers_eu_us_agree(spark):
    rows = {r["doc_id"]: r.asDict() for r in
            E.queries()["locale_numbers"](spark, SF).collect()}
    for doc, r in rows.items():
        m = doc % 4
        if m == 0:   # 1.234,5d (EU)
            assert r["cents"] == 100000 + (doc % 1000) * 100 \
                + 50 + doc % 10
            assert r["ambiguous"] == 0
        elif m == 1:  # 1,234.5d (US) — same numeric value
            assert r["cents"] == 100000 + (doc % 1000) * 100 \
                + 50 + doc % 10
        elif m == 2:  # plain dd.dd
            assert r["cents"] == (doc % 90 + 10) * 100 + doc % 100
        else:        # 1,234 — ambiguous, refuse to guess
            assert r["cents"] is None
            assert r["ambiguous"] == 1


def test_locale_numbers_never_1000x_off(spark):
    # the naive-float failure mode: parsing 1.234,56 as 1.234 — assert
    # every parsed EU value is in the expected cents magnitude
    rows = [r for r in
            E.queries()["locale_numbers"](spark, SF).collect()
            if r["doc_id"] % 4 == 0]
    assert all(100000 <= r["cents"] < 300000 for r in rows)
