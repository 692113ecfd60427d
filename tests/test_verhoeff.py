"""Tests for the full Verhoeff checksum validator — the production
implementation of the check the reference stubs (aadhaar.py:170-172)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_spark.functions.extractors import (
    VERHOEFF_D,
    VERHOEFF_P,
    verhoeff_valid,
)

SF = "/root/testdata/sf0.001"


def _py(num: str) -> int:
    c = 0
    for i, ch in enumerate(reversed(num)):
        c = VERHOEFF_D[c][VERHOEFF_P[i % 8][int(ch)]]
    return int(c == 0)


def _check(spark, nums):
    df = spark.createDataFrame([(n,) for n in nums], ["n"])
    return [r["v"] for r in
            df.select(verhoeff_valid(F.col("n")).alias("v")).collect()]


def test_verhoeff_differential_vs_python(spark):
    nums = [str(1234567890 + i * 987) [:12].ljust(12, "7")
            for i in range(40)]
    assert _check(spark, nums) == [_py(n) for n in nums]


def test_verhoeff_catches_single_digit_error(spark):
    # take a valid number, corrupt one digit: must fail
    base = "236"
    # brute the check digit
    valid = next(base + str(d) for d in range(10) if _py(base + str(d)))
    corrupted = ("9" if valid[0] != "9" else "8") + valid[1:]
    assert _check(spark, [valid, corrupted]) == [1, 0]


def test_verhoeff_catches_adjacent_transposition(spark):
    valid = next("1427" + str(d) for d in range(10) if _py("1427" + str(d)))
    swapped = valid[1] + valid[0] + valid[2:]
    if swapped != valid:
        assert _check(spark, [valid, swapped]) == [1, 0]


def test_verhoeff_rejects_non_digits(spark):
    assert _check(spark, ["12a4", ""]) == [0, 0]


def test_verhoeff_query_mix(spark):
    import __spark_entry__ as E

    rows = E.queries()["verhoeff_check"](spark, SF).collect()
    valid = sum(r["valid"] for r in rows)
    # ~1/10 of uniform 12-digit numbers are Verhoeff-valid
    assert 0 < valid < len(rows) // 4
    for r in rows:
        assert r["valid"] == _py(r["num"])
