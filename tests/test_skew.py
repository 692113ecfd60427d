"""Skew-defusal evidence (north rule): crawl inputs cluster by host; the
hash(url) salt repartition must spread a pathologically host-skewed input
evenly across partitions, and the pipeline result must not depend on the
partitioning."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def skewed_pages(spark):
    """90% of pages on one host, arriving sorted by host (crawl order)."""
    rows = []
    for i in range(1000):
        host = "hot-host.example" if i < 900 else f"host-{i % 37}.example"
        rows.append((f"https://{host}/p/{i}", b"<html><body><p>doc %d body text here</p></body></html>" % i))
    return spark.createDataFrame(rows, "url string, html binary").withColumns(
        {"warc_ts": F.current_timestamp(), "text": F.lit(""), "lang": F.lit("en")}
    )


def test_salt_balances_host_skew(spark, skewed_pages):
    salted = skewed_pages.repartition(16, F.xxhash64("url"))
    sizes = [r["n"] for r in salted.groupBy(F.spark_partition_id().alias("p"))
             .agg(F.count(F.lit(1)).alias("n")).collect()]
    assert len(sizes) == 16
    # naive host partitioning would put 900 rows in one partition; the salt
    # must keep every partition within 2x of the mean
    mean = sum(sizes) / len(sizes)
    assert max(sizes) < 2 * mean, sizes
    assert min(sizes) > 0.3 * mean, sizes


def test_pipeline_output_invariant_to_partitioning(spark, skewed_pages):
    from ocr_spark.pipeline import run_pipeline

    a = run_pipeline(spark, pages_path=None, pages_df=skewed_pages, salt_partitions=4)
    b = run_pipeline(spark, pages_path=None, pages_df=skewed_pages, salt_partitions=16)
    ra = {r["url"]: (r["extracted_text"], r["decision"], r["final_score"])
          for r in a.select("url", "extracted_text", "decision", "final_score").collect()}
    rb = {r["url"]: (r["extracted_text"], r["decision"], r["final_score"])
          for r in b.select("url", "extracted_text", "decision", "final_score").collect()}
    assert ra == rb
