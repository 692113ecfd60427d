"""Native Column builders for token normalization (reference
validation/normalization.py) — D1-D5 in SURVEY.md §2.8. Pure Catalyst
expressions: translate / regexp / lpad, no Python in the row path."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ocr_spark import config as C


def devanagari_to_arabic(col: Column) -> Column:
    """D1 — normalization.py:42-48."""
    return F.translate(col, C.DEVANAGARI_DIGITS, C.ARABIC_DIGITS)


def normalize_numeric_field(col: Column) -> Column:
    """D2 — normalization.py:17-40: OCR de-confusion then strip non-[0-9.,-]."""
    src = "".join(C.NUMERIC_CONFUSION.keys())
    dst = "".join(C.NUMERIC_CONFUSION.values())
    return F.regexp_replace(F.translate(col, src, dst), r"[^0-9.,\-]", "")


def clean_whitespace(col: Column) -> Column:
    """D3 — normalization.py:9-15 (' '.join(split()))."""
    return F.trim(F.regexp_replace(col, r"\s+", " "))


def normalize_date(col: Column) -> Column:
    """D4 — normalization.py:50-72: to DD/MM/YYYY, else NULL.

    Shape: canonicalize separators once, then pad-in-place — the original
    per-group regexp_extract form referenced the input 8x, and interpreted
    mode re-evaluates the (often expensive, keyword-anchored) input
    expression per reference. Output-identical: DMY with 4-digit year ->
    zero-padded DD/MM/YYYY; YMD flipped likewise; anything else NULL."""
    uni = F.regexp_replace(F.regexp_replace(col, r"[^\d/\-.]", ""), r"[\-.]", "/")

    def pad_dm(x: Column) -> Column:
        # zero-pad 1-digit day then 1-digit month of a D/M/YYYY string
        return F.regexp_replace(
            F.regexp_replace(x, r"^(\d)/", "0$1/"), r"/(\d)/(\d{4})$", "/0$1/$2"
        )

    flip = F.regexp_replace(uni, r"^(\d{4})/(\d{1,2})/(\d{1,2})$", "$3/$2/$1")
    return (
        F.when(uni.rlike(r"^\d{1,2}/\d{1,2}/\d{4}$"), pad_dm(uni))
        .when(uni.rlike(r"^\d{4}/\d{1,2}/\d{1,2}$"), pad_dm(flip))
        .otherwise(F.lit(None).cast("string"))
    )


def is_valid_date(ds: Column, min_year: int = C.DATE_MIN_YEAR) -> Column:
    """Reference date validity (aadhaar.py:292-324 / vehicle_rc.py:382-412):
    day 1-31, month 1-12, 2-digit years mapped >50 -> 19xx else 20xx, year
    within [min_year, 2024] (hardcoded cap replicated)."""
    fmt_ok = ds.rlike(r"^\d{1,2}[/-]\d{1,2}[/-]\d{2,4}")
    parts = F.split(ds, "[/-]")
    three = F.size(parts) == 3
    num_ok = (
        F.get(parts, 0).rlike(r"^\d+$")
        & F.get(parts, 1).rlike(r"^\d+$")
        & F.get(parts, 2).rlike(r"^\d+$")
    )
    # try_cast: ANSI mode errors on cast('') even under a false branch of a
    # boolean AND (no short-circuit in codegen) — null-on-malformed is safe
    # because num_ok already gates the result.
    day = F.get(parts, 0).try_cast("int")
    month = F.get(parts, 1).try_cast("int")
    raw_year = F.get(parts, 2).try_cast("int")
    year = F.when(raw_year < 100, F.when(raw_year > 50, raw_year + 1900).otherwise(raw_year + 2000)).otherwise(raw_year)
    in_range = (
        day.between(1, 31)
        & month.between(1, 12)
        & year.between(min_year, C.DATE_MAX_YEAR)
    )
    return F.coalesce(fmt_ok & three & num_ok & in_range, F.lit(False))


def non_empty(col: Column) -> Column:
    """regexp_extract returns '' on no-match; promote to NULL for coalesce."""
    return F.nullif(col, F.lit(""))
