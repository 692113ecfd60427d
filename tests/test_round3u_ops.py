"""Edge-case tests for the round-3u operator batch: HAVING-aggregate
(Q18 analog) and EXISTS semi-join (Q4 analog)."""

from __future__ import annotations

import __spark_entry__ as E

SF = "/root/testdata/sf0.001"


def test_large_orders_threshold_and_order(spark):
    rows = E.queries()["large_orders"](spark, SF).collect()
    assert rows
    qtys = [r["sum_qty"] for r in rows]
    assert qtys == sorted(qtys, reverse=True)
    assert all(q > 150 for q in qtys)


def test_priority_late_orders_is_a_semi_join(spark):
    df = E.queries()["priority_late_orders"](spark, SF)
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in p
    rows = df.collect()
    assert rows and all(r["n_orders"] > 0 for r in rows)


def test_priority_late_orders_counts_each_order_once(spark):
    import duckdb

    rows = E.queries()["priority_late_orders"](spark, SF).collect()
    total = sum(r["n_orders"] for r in rows)
    expect = duckdb.sql(f"""
      SELECT COUNT(DISTINCT o.o_orderkey)
      FROM '{SF}/orders.parquet' o JOIN '{SF}/lineitem.parquet' l
        ON l.l_orderkey = o.o_orderkey
      WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY""").fetchone()[0]
    assert total == expect
