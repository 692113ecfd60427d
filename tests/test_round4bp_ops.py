"""Unit tests for round-4 batch: Kaplan-Meier life table with
right-censoring."""

from __future__ import annotations

import datetime as dt
import math
import os

from ocr_spark.queries import QUERIES


class TestSurvivalLifeTable:
    def test_censoring_and_exact_terms(self, spark, tmp_path):
        d = str(tmp_path)
        rows = []
        okey = 0

        def order(ck, day):
            nonlocal okey
            rows.append((okey, ck, "O", 10.0,
                         dt.datetime(2024, 1, day), "1-URGENT"))
            okey += 1

        # customer 1: orders day 1, 3 -> one observed gap of 2, then a
        # censored tail of 7 (to the horizon day 10)
        order(1, 1)
        order(1, 3)
        # customer 2: orders day 1, 6 -> observed gap 5, censored 4
        order(2, 1)
        order(2, 6)
        # customer 3: single order day 10 (the horizon) -> zero-length
        # censored span, excluded by t > 0
        order(3, 10)
        spark.createDataFrame(
            rows, ["o_orderkey", "o_custkey", "o_orderstatus",
                   "o_totalprice", "o_orderdate", "o_orderpriority"]
        ).write.parquet(os.path.join(d, "orders.parquet"))
        out = {r["gap_days"]: r.asDict()
               for r in QUERIES["survival_life_table"](spark, d)
               .collect()}
        # only observed-event rows appear: gaps 2 and 5
        assert sorted(out) == [2, 5]
        # at t=2: spans outstanding are 2,7,5,4 -> n_risk 4, one event
        assert out[2]["n_risk"] == 4 and out[2]["n_events"] == 1
        assert out[2]["ln_s_micro"] == round(math.log(3 / 4) * 1e6)
        # at t=5: spans >= 5 are 7,5 -> n_risk 2; the censored 4 has
        # LEFT the risk set without counting as an event
        assert out[5]["n_risk"] == 2 and out[5]["n_events"] == 1
        want = round(math.log(3 / 4) * 1e6) + round(math.log(1 / 2) * 1e6)
        assert out[5]["ln_s_micro"] == want
