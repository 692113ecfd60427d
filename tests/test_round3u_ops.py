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


def test_salted_join_equals_unsalted(spark):
    from pyspark.sql import functions as F

    salted = {r["event_type"]: r.asDict() for r in
              E.queries()["salted_join"](spark, SF).collect()}
    dim = spark.createDataFrame(
        [("view", 1), ("click", 3), ("purchase", 10),
         ("signup", 5), ("refund", -8)], ["event_type", "weight"])
    ev = (spark.read.parquet(f"{SF}/events.parquet")
          .select("event_type",
                  F.round(F.col("value") * 100).cast("bigint")
                  .alias("cents")))
    plain = {r["event_type"]: r.asDict() for r in
             ev.join(dim, "event_type").groupBy("event_type").agg(
                 F.count(F.lit(1)).cast("bigint").alias("n"),
                 F.sum(F.col("cents") * F.col("weight")).cast("bigint")
                 .alias("weighted_cents")).collect()}
    assert salted == plain


def test_salted_join_replicates_dim(spark):
    # the salted dim carries 8 copies of each dim row
    df = E.queries()["salted_join"](spark, SF)
    # structural check: every event joins exactly once (n conservation)
    import duckdb

    total = sum(r["n"] for r in df.collect())
    expect = duckdb.sql(
        f"SELECT COUNT(*) FROM '{SF}/events.parquet'"
        " WHERE event_type IN ('view','click','purchase','signup',"
        "'refund')").fetchone()[0]
    assert total == expect
