"""Unit tests for round-4 batch: MERGE INTO action semantics."""

from __future__ import annotations

import datetime as dt
import os

from ocr_spark.queries import QUERIES


class TestMergeIntoActions:
    def test_all_five_actions(self, spark, tmp_path):
        d = str(tmp_path)
        # keys: base = not %10; updates = %3 (delete when %9)
        #  3: base+update          -> update (cents+500 survives)
        #  9: base+update+delete   -> delete (drops)
        # 30: no base (%10), update, not %9 -> insert
        # 90: no base, update, %9  -> ignore (delete matched nothing)
        #  1: base only            -> keep
        rows = [
            (1, 1, "O", 10.00, dt.datetime(2024, 1, 1), "1-URGENT"),
            (3, 1, "O", 20.00, dt.datetime(2024, 1, 1), "1-URGENT"),
            (9, 1, "O", 30.00, dt.datetime(2024, 1, 1), "1-URGENT"),
            (30, 1, "O", 40.00, dt.datetime(2024, 1, 1), "1-URGENT"),
            (90, 1, "O", 50.00, dt.datetime(2024, 1, 1), "1-URGENT"),
        ]
        spark.createDataFrame(
            rows, ["o_orderkey", "o_custkey", "o_orderstatus",
                   "o_totalprice", "o_orderdate", "o_orderpriority"]
        ).write.parquet(os.path.join(d, "orders.parquet"))
        out = {r["action"]: r.asDict()
               for r in QUERIES["merge_into_actions"](spark, d).collect()}
        assert out["update"]["n_rows"] == 1
        assert out["update"]["surviving_cents"] == 2500  # 2000 + 500
        assert out["delete"]["n_rows"] == 1
        assert out["delete"]["surviving_cents"] == 0
        assert out["insert"]["n_rows"] == 1
        assert out["insert"]["surviving_cents"] == 4500  # 4000 + 500
        assert out["ignore"]["n_rows"] == 1
        assert out["keep"]["n_rows"] == 1
        assert out["keep"]["surviving_cents"] == 1000
