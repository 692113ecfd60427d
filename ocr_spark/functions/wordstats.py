"""A1-A3 — word statistics and OCR confidence as native higher-order
functions (reference ocr/engine.py:144-244): weighted mean confidence with
stopword 0.3 / numeric 1.5 / alpha 1.0 weights, low-confidence and numeric
counts, and the thresholded confidence score.

The per-word loop of the reference becomes one aggregate() over an
array<struct<w,conf>> column — JVM-side, zero Python."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ocr_spark import config as C


def split_words(text: Column) -> Column:
    """Python str.split() analog: split on runs of whitespace, no empties."""
    trimmed = F.trim(text)
    return F.when(F.length(trimmed) == 0, F.array().cast("array<string>")).otherwise(
        F.split(trimmed, r"\s+")
    )


# the fixed char classes of engine.py's is_numeric, enumerated so translate's
# char-table delete replaces java.util.regex (the predicate runs per word in
# interpreted HOF filters; regex was ~40% of the word_stats wall at 500k docs)
_STRIP_CHARS = ",. \t\n\x0b\x0c\r$€£¥"  # [,.\s$€£¥] with java \s = ASCII ws


def _is_numeric(w: Column) -> Column:
    """engine.py:227-244: strip [,.\\s$€£¥]; digit majority > 0.5.
    Devanagari digits translated first to mirror Python's Unicode isdigit.
    Pure translate/length arithmetic — zero regex: digits = len - nondigits,
    where nondigits survive deleting 0-9 after the Devanagari mapping."""
    cleaned = F.translate(w, _STRIP_CHARS, "")
    arab = F.translate(cleaned, C.DEVANAGARI_DIGITS, C.ARABIC_DIGITS)
    digits = F.length(cleaned) - F.length(F.translate(arab, "0123456789", ""))
    return (F.length(cleaned) > 0) & (digits * 2 > F.length(cleaned))


def _word_weight(w: Column) -> Column:
    return (
        F.when(F.lower(w).isin(C.STOPWORDS), F.lit(C.STOPWORD_WEIGHT))
        .when(_is_numeric(w), F.lit(C.NUMERIC_TOKEN_WEIGHT))
        .otherwise(F.lit(C.ALPHA_TOKEN_WEIGHT))
    )


def word_stat_columns(dom_text: Column, ocr_text: Column, ocr_conf100: Column) -> dict[str, Column]:
    """Build the merged word list (DOM words at confidence 100.0, recognizer
    words at their batch confidence) and fold all stats in one aggregate().

    Two-phase: transform computes each word's (conf, weight, is_numeric)
    ONCE, then the fold is cheap struct arithmetic. Folding directly over the
    words re-evaluated _word_weight (stopword isin + two regexes) four times
    per element in the interpreted HOF path — measured as the single most
    expensive block of the pipeline. The fold's addition ORDER is unchanged,
    so ws/wt bits match the per-word reference oracle exactly."""
    def _entry(conf: Column):
        def build(w: Column) -> Column:
            return F.struct(
                conf.cast("double").alias("conf"),
                _word_weight(w).alias("wt"),
                _is_numeric(w).alias("isnum"),
            )
        return build

    entries = F.concat(
        F.transform(split_words(dom_text), _entry(F.lit(100.0))),
        F.transform(split_words(ocr_text), _entry(ocr_conf100)),
    )
    zero = F.struct(
        F.lit(0.0).alias("ws"), F.lit(0.0).alias("wt"),
        F.lit(0).alias("low"), F.lit(0).alias("num"),
    )
    acc = F.aggregate(
        entries,
        zero,
        lambda a, e: F.struct(
            (a["ws"] + e["conf"] * e["wt"]).alias("ws"),
            (a["wt"] + e["wt"]).alias("wt"),
            (a["low"] + F.when(e["conf"] < C.MIN_WORD_CONFIDENCE, 1).otherwise(0)).alias("low"),
            (a["num"] + F.when(e["isnum"], 1).otherwise(0)).alias("num"),
        ),
    )
    total = F.size(entries)
    mean_conf = F.when(acc["wt"] > 0, acc["ws"] / acc["wt"]).otherwise(F.lit(0.0))
    low_ratio = F.when(total > 0, acc["low"] / total).otherwise(F.lit(0.0))
    numeric_ratio = F.when(total > 0, acc["num"] / total).otherwise(F.lit(0.0))
    # calculate_ocr_confidence_score, engine.py:163-193
    score = (
        F.when(total < C.MIN_WORDS_DETECTED, F.lit(0.0))
        .when(low_ratio > C.LOW_CONF_RATIO_CUTOFF, F.lit(0.0))
        .otherwise(
            F.least(
                F.lit(1.0),
                mean_conf / 100.0
                + F.least(F.lit(C.NUMERIC_BONUS_CAP), numeric_ratio * C.NUMERIC_BONUS_SCALE),
            )
        )
    )
    return {
        "total_words": total,
        "low_confidence_words": acc["low"],
        "numeric_words": acc["num"],
        "mean_confidence": mean_conf,
        "ocr_confidence_score": score,
    }
