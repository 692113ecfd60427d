"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship reference-semantics query (classify →
extract → score → decide) over sf0.001; ``queries()`` / ``oracle_sql()``
expose every implemented operator from SURVEY.md §2 plus the corpus-curation
suite (dedup, similarity, text analysis) with DuckDB oracles.

Implementations live in ``ocr_spark.queries``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from ocr_spark.queries import flagship

    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from ocr_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from ocr_spark.queries import ORACLE

    return dict(ORACLE)
