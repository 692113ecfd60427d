"""Edge-case tests for the round-3t operator batch: TPC-H Q10/Q7
analog multi-join queries."""

from __future__ import annotations

import __spark_entry__ as E

SF = "/root/testdata/sf0.001"


def test_returned_revenue_plan_and_ordering(spark):
    df = E.queries()["returned_revenue"](spark, SF)
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in p          # nation broadcasts
    assert "PushedFilters" in p and "l_returnflag" in p
    rows = df.collect()
    revs = [r["revenue_centbp"] for r in rows]
    assert revs == sorted(revs, reverse=True)
    assert len(rows) == 20


def test_nation_trade_flows_excludes_domestic(spark):
    rows = E.queries()["nation_trade_flows"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r["supp_nation"] != r["cust_nation"]
        assert r["volume_centbp"] > 0 and r["n_items"] > 0


def test_nation_trade_flows_conserves_items(spark):
    import duckdb

    rows = E.queries()["nation_trade_flows"](spark, SF).collect()
    total = sum(r["n_items"] for r in rows)
    # every lineitem whose supplier/customer nations differ counts once
    d = SF
    expect = duckdb.sql(f"""
      SELECT COUNT(*) FROM '{d}/lineitem.parquet' l
      JOIN '{d}/supplier.parquet' s ON s.s_suppkey = l.l_suppkey
      JOIN '{d}/orders.parquet' o ON o.o_orderkey = l.l_orderkey
      JOIN '{d}/customer.parquet' c ON c.c_custkey = o.o_custkey
      WHERE s.s_nationkey <> c.c_nationkey""").fetchone()[0]
    assert total == expect
