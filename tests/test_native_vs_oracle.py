"""Differential tests: the native Catalyst expression library vs the
pure-Python oracle on adversarial strings (regex-dialect edge cases,
ambiguity guards, Devanagari digits, CamelCase, corrupted PANs)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ocr_spark.functions.classify import classify
from ocr_spark.functions.extractors import FIELD_BUILDERS
from ocr_spark.functions.scoring import distribution_score, non_alnum_ratio
from ocr_spark.functions.wordstats import split_words
from ocr_spark.oracle import reference_semantics as R

ADVERSARIAL = [
    "",
    "plain words only nothing else",
    "id 2345 6789 0123 end",
    "id 1345 6789 0123 first digit bad",
    "aadhaar no. 2345-6789-0123 keyword anchored",
    "tokens 2345- 6789 0123 in words",
    "VID 9999 8888 7777 6666 virtual",
    "DOB : 01/02/1990 and issue 03/04/2010",
    "DOB : 01021990 eight digit splice must fail",
    "YOB : 1976 year only",
    "name : ramesh kumar lowercase keyword",
    "Name : Ramesh Kumar capitalized label",
    "RameshKumar merged CamelCase words",
    "pan ABCPE1234F single",
    "ABCPE1234F and XYZPA9876B two pans",
    "ABCPE1234F and ABCPE1234F twice",
    "corrupt ABCPEIZ3AF pan body",
    "split ABCPE 1234F adjacent words",
    "DEPARTMENT GOVERNMENT ten char tokens",
    "reg MH-12-AB-1234 single",
    "MH-12-AB-1234 DL-01-CD-5678 two regs",
    "continuous MH12AB1234 format",
    "spaced MH 12 AB 1234 format",
    "bad XX-12-AB-1234 state",
    "rto MH-00-AB-1234 zero",
    "address : 42 some road city pin 560037 more",
    "address : only text no pin at all here",
    "pin 012345 then 560037 valid",
    "Enrollment 1234/12345/12345 id",
    "पिन ४००००१ devanagari digits",
    "आधार २३४५ ६७८९ ०१२३ devanagari aadhaar",
    "MALE and FEMALE both present",
    "FEMALE only here",
    "TRANSGENDER case",
    "पुरुष hindi male",
    "Owner Name : Anil Raj Gupta. rc style",
    "Engine No : EN12345678K plate",
    "Chassis No : MA1234567890XZ plate",
    "Fuel DIESEL direct",
    "propulsion : electric labeled",
    "Vehicle Class LMV direct",
    "seating cap : 7 people",
    "Father's Name : ANIL RAJ KUMAR. caps",
    "fitness upto 01/02/2024 date",
    "mfg : 02/2019 month year",
    "INCOME TAX DEPARTMENT GOVT. OF INDIA header",
    "government of india unique identification",
    "!!!???@@@ ### $$$ %%% ^^^ &&&",
    "a b c d e f g h i j",
    "the and or but in on at to for stopwords",
]


@pytest.fixture(scope="module")
def adv_df(spark):
    df = spark.createDataFrame([(t,) for t in ADVERSARIAL], ["text"])
    text = F.col("text")
    words = split_words(text)
    lines = F.when(F.length(text) == 0, F.array().cast("array<string>")).otherwise(F.split(text, "\n"))
    cols = {"text": text}
    for t, builder in FIELD_BUILDERS.items():
        for fname, col in builder(text, words, lines).items():
            cols[f"{t}__{fname}"] = col.cast("string")
    cls = classify(text)
    cols["doc_type"] = cls["doc_type"]
    for k in ("aadhaar", "pan", "vehicle_rc"):
        cols[f"clsscore_{k}"] = cls[f"score_{k}"]
    cols["dist_aadhaar"] = distribution_score(text, F.lit("aadhaar"))
    cols["dist_pan"] = distribution_score(text, F.lit("pan"))
    cols["nar"] = non_alnum_ratio(text)
    out = df.select(*[c.alias(n) for n, c in cols.items()])
    return {r["text"]: r for r in out.collect()}


def _norm(v):
    if v is True:
        return "true"
    return None if v is None else str(v)


@pytest.mark.parametrize("text", ADVERSARIAL)
def test_extractors_match_oracle(adv_df, text):
    row = adv_df[text]
    for dtype, fn in (("aadhaar", R.extract_aadhaar), ("pan", R.extract_pan),
                      ("vehicle_rc", R.extract_vehicle_rc)):
        expected = fn(text)
        for fname in expected:
            got = row[f"{dtype}__{fname}"]
            assert got == _norm(expected[fname]), (dtype, fname, text)
        # fields absent in the oracle must be NULL natively too
        for col_name in row.asDict():
            if col_name.startswith(f"{dtype}__"):
                fname = col_name.split("__", 1)[1]
                if fname not in expected:
                    assert row[col_name] is None, (dtype, fname, text, row[col_name])


@pytest.mark.parametrize("text", ADVERSARIAL)
def test_classification_matches_oracle(adv_df, text):
    row = adv_df[text]
    dt, scores = R.classify_with_scores(text)
    assert row["doc_type"] == dt, text
    for k, v in scores.items():
        assert row[f"clsscore_{k}"] == v, (k, text)


@pytest.mark.parametrize("text", ADVERSARIAL)
def test_scores_match_oracle(adv_df, text):
    row = adv_df[text]
    assert abs(row["dist_aadhaar"] - R.distribution_score(text, "aadhaar")) < 1e-9, text
    assert abs(row["dist_pan"] - R.distribution_score(text, "pan")) < 1e-9, text
    assert abs(row["nar"] - R.non_alnum_ratio(text)) < 1e-9, text


def test_clean_text_matches_reference_regex_chain(spark):
    """F10: the native clean_text column must reproduce the reference's
    utils.py:235-251 regex chain byte-for-byte on danda-noise Hindi text."""
    import re

    def ref_clean(text: str) -> str:  # verbatim reference semantics
        text = re.sub(r"[।॥|]+", "", text)
        text = re.sub(r"\s+[-–—]\s+", " ", text)
        text = re.sub(r"[^\w\sऀ-ॿ.,/:()\-]", "", text, flags=re.UNICODE)
        text = re.sub(r"\s+", " ", text)
        return text.strip()

    from ocr_spark.functions.normalize import clean_text

    cases = [
        "सरकार । भारत ॥ कार्यालय | दिल्ली",
        "नाम : रमेश कुमार — पता : दिल्ली - ११०००१",
        "noisy @#$% symbols मिश्रित text (with) pare.ns, क/ख:ग",
        "dash - kept –stray– kept2 — removed — end",
        "।।double danda।। and ||pipes||",
        "पिन ४००००१ और 400001 both digit systems",
        "  leading   trailing   ",
        "",
    ]
    df = spark.createDataFrame([(c,) for c in cases], ["t"]).select(
        "t", clean_text(F.col("t")).alias("c")
    )
    for r in df.collect():
        assert r["c"] == ref_clean(r["t"]), repr(r["t"])


def test_standardize_date_matches_dateutil(spark):
    """D5: on separator-structured inputs the native standardizer must agree
    with the reference's actual dateutil path (normalization.py:74-89)."""
    import re

    pytest.importorskip("dateutil")
    from dateutil import parser

    from ocr_spark.functions.normalize import standardize_date

    abbr = ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
            "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]
    full = ["January", "February", "March", "April", "May", "June",
            "July", "August", "September", "October", "November", "December"]
    cases = []
    for k in range(200):
        dd, mm, yy = 1 + k % 28, 1 + k % 12, 1950 + k % 70
        cases += [
            f"{dd}-{mm}-{yy}", f"{yy}/{mm}/{dd}", f"{mm}.{dd}.{yy}",
            f"{29 + k % 3}-02-{yy}", f"not a date {k}", f"31-04-{yy}",
            f"{dd:02d}/{mm:02d}/{yy}",
            f"{dd} {abbr[mm - 1]} {yy}", f"{full[mm - 1]} {dd}, {yy}",
            f"{dd}-{abbr[mm - 1].lower()}-{yy}", f"31 Feb {yy}",
        ]
    df = spark.createDataFrame([(c,) for c in cases], ["t"]).select(
        "t", standardize_date(F.col("t")).alias("s")
    )
    structured = re.compile(r"^(\d{1,2}|\d{4})-\d{1,2}-(\d{4}|\d{1,2})$")
    months_re = "|".join(abbr + full).lower()
    textual = re.compile(
        rf"^(\d{{1,2}}-({months_re})-\d{{4}}|({months_re})-\d{{1,2}}-\d{{4}})$")
    for r in df.collect():
        clean = re.sub(r"[./]", "-", r["t"])
        tclean = re.sub(r"[.\s/-]+", "-", re.sub(",", " ", r["t"])).lower().strip("-")
        try:
            exp = parser.parse(clean).strftime("%Y-%m-%d")
        except (ValueError, OverflowError):
            exp = None
        if structured.match(clean) or textual.match(tclean):
            assert r["s"] == exp, r["t"]
        else:  # outside the documented surface: native returns NULL
            assert r["s"] is None, r["t"]
