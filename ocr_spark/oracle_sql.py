"""DuckDB-dialect mirrors of the native extraction/scoring expressions.

Each generator returns SQL text that reproduces, operation-for-operation, the
corresponding Column builder in ``ocr_spark.functions`` (same regexes, same
strategy order, same arithmetic order), so the driver's value-hash compare
holds bit-for-bit. Generated from the same ``ocr_spark.config`` constants —
one source of truth for both engines.

Dialect mapping notes (Java regex / Spark -> RE2 / DuckDB):
- replacement backrefs: ``$1`` -> ``\\1``;
- global replace is explicit: ``regexp_replace(..., 'g')``;
- ``rlike`` (find-anywhere) -> ``regexp_matches`` (same semantics);
- array HOFs: transform/filter/exists -> list_transform/list_filter with
  1-based indexing instead of ``F.get``'s 0-based.
"""

from __future__ import annotations

from ocr_spark import config as C

D = "[0-9०-९]"
DEV = C.DEVANAGARI_DIGITS


def arab(x: str) -> str:
    return f"translate({x}, '{DEV}', '0123456789')"


def _valid_aadhaar(c: str) -> str:
    return f"regexp_matches({arab(c)}, '^[2-9][0-9]{{11}}$')"


def _vn(name: str, stoplist: list[str], max_len: int | None = None) -> str:
    """_is_valid_name mirror (extractors.py:35-46)."""
    stops = " OR ".join(f"contains(lower({name}), '{kw}')" for kw in stoplist)
    cond = (
        f"(NOT ({stops}) AND len(string_split({name}, ' ')) >= 2 "
        f"AND len(list_filter(string_split({name}, ' '), "
        f"w -> NOT regexp_matches(w, '^\\p{{L}}{{2,}}$'))) = 0"
    )
    if max_len is not None:
        cond += f" AND length({name}) <= {max_len}"
    return f"COALESCE({cond}), FALSE)"


def _clean_name(raw: str) -> str:
    """_clean_name mirror (extractors.py:113-117)."""
    x = f"regexp_replace(trim({raw}), '[@:.,]', ' ', 'g')"
    x = f"regexp_replace({x}, '([a-z])([A-Z])', '\\1 \\2', 'g')"
    return f"trim(regexp_replace({x}, '\\s+', ' ', 'g'))"


def _camel(t: str) -> str:
    return f"regexp_replace({t}, '([a-z])([A-Z])', '\\1 \\2', 'g')"


def _norm_date(v: str) -> str:
    """normalize_date mirror (normalize.py:30-49)."""
    clean = f"regexp_replace({v}, '[^\\d/\\-.]', '', 'g')"
    dmy = "'^(\\d{1,2})[/\\-.](\\d{1,2})[/\\-.](\\d{4})$'"
    ymd = "'^(\\d{4})[/\\-.](\\d{1,2})[/\\-.](\\d{1,2})$'"
    return (
        f"(CASE WHEN regexp_extract({clean}, {dmy}, 1) != '' THEN "
        f"lpad(regexp_extract({clean}, {dmy}, 1), 2, '0') || '/' || "
        f"lpad(regexp_extract({clean}, {dmy}, 2), 2, '0') || '/' || "
        f"regexp_extract({clean}, {dmy}, 3) "
        f"WHEN regexp_extract({clean}, {ymd}, 1) != '' THEN "
        f"lpad(regexp_extract({clean}, {ymd}, 3), 2, '0') || '/' || "
        f"lpad(regexp_extract({clean}, {ymd}, 2), 2, '0') || '/' || "
        f"regexp_extract({clean}, {ymd}, 1) "
        f"ELSE NULL END)"
    )


def _is_valid_date(ds: str, min_year: int = C.DATE_MIN_YEAR) -> str:
    """is_valid_date mirror (normalize.py:52-76)."""
    parts = f"string_split_regex({ds}, '[/-]')"
    day = f"TRY_CAST({parts}[1] AS INTEGER)"
    month = f"TRY_CAST({parts}[2] AS INTEGER)"
    ry = f"TRY_CAST({parts}[3] AS INTEGER)"
    year = (
        f"(CASE WHEN {ry} < 100 THEN "
        f"(CASE WHEN {ry} > 50 THEN {ry} + 1900 ELSE {ry} + 2000 END) ELSE {ry} END)"
    )
    return (
        f"COALESCE(regexp_matches({ds}, '^\\d{{1,2}}[/-]\\d{{1,2}}[/-]\\d{{2,4}}') "
        f"AND len({parts}) = 3 "
        f"AND regexp_matches({parts}[1], '^\\d+$') "
        f"AND regexp_matches({parts}[2], '^\\d+$') "
        f"AND regexp_matches({parts}[3], '^\\d+$') "
        f"AND {day} BETWEEN 1 AND 31 AND {month} BETWEEN 1 AND 12 "
        f"AND {year} BETWEEN {min_year} AND {C.DATE_MAX_YEAR}, FALSE)"
    )


# ---------------------------------------------------------------------------
# Aadhaar field mirror (extractors.py:58-209). Emits a chained-CTE SQL body;
# caller provides the corpus CTE named `corpus` with (doc_id, text).
# ---------------------------------------------------------------------------

def aadhaar_fields_sql(corpus_sql: str) -> str:
    va_c = _valid_aadhaar("c")
    s1 = (
        f"list_filter(list_transform("
        f"regexp_extract_all(text, '\\b{D}{{4}}[\\s.\\-]+{D}{{4}}[\\s.\\-]+{D}{{4}}\\b', 0), "
        f"m -> regexp_replace(m, '[\\s.\\-]+', '', 'g')), c -> {va_c})[1]"
    )
    s2 = (
        f"list_filter(regexp_extract_all(text, '\\b({D}{{12}})\\b', 1), "
        f"c -> {va_c})[1]"
    )
    s4_pat = f"'(?is)(?:aadhaar|आधार).*?({D}{{4}}[\\s.\\-]*{D}{{4}}[\\s.\\-]*{D}{{4}})'"
    c1_pat = "'(?:name|नाम)\\s*:?\\s*([A-Za-z\\s]{3,50})'"
    c2_pat = "'([A-Z][a-z]+(?:[\\s@:.,]*[A-Z][a-z]+)+)'"
    dob_pat = (
        "'(?i)(?:dob|date\\s+of\\s+birth|yob|year\\s+of\\s+birth)"
        "\\s*[:.\\-]?\\s*(\\d{2}/\\d{2}/\\d{4}|\\d{4})'"
    )
    addr_pat = "'(?is)(?:address|pata)\\s*[:.\\-]\\s*(.+?)(?:\\d{6}|$)'"
    vid_pat = (
        f"'(?is)(?:vid|virtual\\s+id).*?({D}{{4}}\\s*{D}{{4}}\\s*{D}{{4}}\\s*{D}{{4}})'"
    )
    c1_clean = _clean_name(f"regexp_extract(text, {c1_pat}, 1)")
    c2_clean = _clean_name(f"regexp_extract(text, {c2_pat}, 1)")
    s4_clean = "regexp_replace(s4_raw, '[\\s.\\-]+', '', 'g')"
    s4_valid = _valid_aadhaar(s4_clean)
    line_valid = _vn(_camel("trim(l)"), C.NAME_STOPLIST_AADHAAR)
    camel_hit = _camel("trim(line_hits[1])")
    vn_c1 = _vn("c1", C.NAME_STOPLIST_AADHAAR)
    vn_c2 = _vn("c2", C.NAME_STOPLIST_AADHAAR)
    vid_arab = arab("vid_clean")
    nd_dob = _norm_date("dob_val")
    nd_d = _norm_date("d")
    return f"""
WITH corpus AS ({corpus_sql}),
b1 AS (
  SELECT doc_id, text,
         {arab('text')} AS t_arab,
         CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
              ELSE string_split_regex(trim(text), '\\s+') END AS words,
         CASE WHEN length(text) = 0 THEN CAST([] AS VARCHAR[])
              ELSE string_split(text, chr(10)) END AS lines
  FROM corpus),
b2 AS (
  SELECT *,
         list_filter(list_transform(words, w -> regexp_replace(w, '[^0-9०-९]', '', 'g')),
                     w -> length(w) = 4) AS digit_words,
         {c1_clean} AS c1,
         {c2_clean} AS c2,
         regexp_extract(text, {s4_pat}, 1) AS s4_raw,
         regexp_extract(t_arab, {dob_pat}, 1) AS dob_val,
         regexp_extract(text, {addr_pat}, 1) AS addr_raw,
         regexp_replace(regexp_extract(text, {vid_pat}, 1), '\\s+', '', 'g') AS vid_clean
  FROM b1),
b3 AS (
  SELECT *,
         {s1} AS s1,
         {s2} AS s2,
         CASE WHEN len(digit_words) >= 3 THEN
           list_filter(list_transform(generate_series(1, len(digit_words) - 2),
             i -> digit_words[i] || digit_words[i+1] || digit_words[i+2]),
             c -> {va_c})[1]
         ELSE NULL END AS s3,
         CASE WHEN s4_raw != '' AND {s4_valid}
              THEN {s4_clean} END AS s4,
         CASE WHEN len(lines) > 2 THEN
           list_filter(lines[2:4], l -> regexp_matches(trim(l), '^[A-Z][a-z]+.*[A-Z][a-z]+')
                       AND {line_valid})
         ELSE CAST([] AS VARCHAR[]) END AS line_hits
  FROM b2)
SELECT doc_id,
       COALESCE(s1, s2, s3, s4) AS aadhaar_number,
       CASE WHEN regexp_matches({vid_arab}, '^\\d{{16}}$') THEN vid_clean END AS vid,
       COALESCE(
         CASE WHEN c1 != '' AND {vn_c1} THEN c1 END,
         CASE WHEN c2 != '' AND {vn_c2} THEN c2 END,
         CASE WHEN len(line_hits) > 0 THEN {camel_hit} END) AS name,
       CASE WHEN dob_val != '' THEN
         CASE WHEN length(dob_val) = 4 THEN '01/01/' || dob_val
              ELSE {nd_dob} END END AS date_of_birth,
       CASE WHEN regexp_matches(text, '(?i)\\bMALE\\b') THEN 'Male'
            WHEN regexp_matches(text, '(?i)\\bFEMALE\\b') THEN 'Female'
            WHEN regexp_matches(text, '(?i)\\bTRANSGENDER\\b') THEN 'Other'
            WHEN regexp_matches(text, 'पुरुष') THEN 'Male'
            WHEN regexp_matches(text, 'महिला') THEN 'Female' END AS gender,
       list_filter(regexp_extract_all(t_arab, '\\b(\\d{{6}})\\b', 1),
                   p -> substr(p, 1, 1) != '0')[1] AS pin_code,
       nullif(regexp_extract(t_arab, '\\b(\\d{{4}}/\\d{{5}}/\\d{{5}})\\b', 1), '') AS enrollment_id,
       CASE WHEN addr_raw != '' THEN trim(regexp_replace(addr_raw, '\\s+', ' ', 'g')) END AS address,
       list_filter(list_transform(regexp_extract_all(t_arab, '\\b(\\d{{2}}/\\d{{2}}/\\d{{4}})\\b', 1),
                   d -> {nd_d}), d -> d IS NOT NULL)[1] AS issue_date
FROM b3
"""


# ---------------------------------------------------------------------------
# PAN field mirror (extractors.py:216-318)
# ---------------------------------------------------------------------------

_PAN_ALPHA_SRC = "".join(C.PAN_TO_ALPHA.keys())
_PAN_ALPHA_DST = "".join(C.PAN_TO_ALPHA.values())
_PAN_DIGIT_SRC = "".join(C.PAN_TO_DIGIT.keys())
_PAN_DIGIT_DST = "".join(C.PAN_TO_DIGIT.values())


def _valid_pan(c: str) -> str:
    fourth = ", ".join(f"'{x}'" for x in C.PAN_VALID_FOURTH)
    return (
        f"(regexp_matches({c}, '^[A-Z]{{5}}[0-9]{{4}}[A-Z]$') "
        f"AND substr({c}, 4, 1) IN ({fourth}))"
    )


def _fuzzy_pan(c: str) -> str:
    return (
        f"(translate(substr({c}, 1, 5), '{_PAN_ALPHA_SRC}', '{_PAN_ALPHA_DST}') || "
        f"translate(substr({c}, 6, 4), '{_PAN_DIGIT_SRC}', '{_PAN_DIGIT_DST}') || "
        f"translate(substr({c}, 10, 1), '{_PAN_ALPHA_SRC}', '{_PAN_ALPHA_DST}'))"
    )


def pan_fields_sql(corpus_sql: str) -> str:
    father_pat = "'(?i)(?:father''?s?\\s+name|पिता का नाम)\\s*:?\\s*([A-Z][A-Z\\s]{3,50})'"
    dob1_pat = (
        "'(?i)(?:dob|date\\s+of\\s+birth|जन्म\\s+तिथि)\\s*:?\\s*"
        "(\\d{1,2}[/.\\-]\\d{1,2}[/.\\-]\\d{2,4})'"
    )
    dob2_pat = "'(\\d{1,2}[/.\\-]\\d{1,2}[/.\\-]\\d{4})'"
    c1_pat = "'(?:name|नाम)\\s*:?\\s*([A-Z][A-Z\\s]{3,50})'"
    c2_pat = "'([A-Z][A-Z\\s]+(?:[A-Z][A-Z\\s]+)+)'"
    sig_pat = "'(?i)(?:signature|sign|hastakshar|हस्ताक्षर)'"
    return f"""
WITH corpus AS ({corpus_sql}),
b1 AS (
  SELECT doc_id, text, upper(text) AS up,
         CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
              ELSE string_split_regex(trim(text), '\\s+') END AS words,
         CASE WHEN length(text) = 0 THEN CAST([] AS VARCHAR[])
              ELSE string_split(text, chr(10)) END AS lines
  FROM corpus),
b2 AS (
  SELECT *,
         list_distinct(list_filter(
           regexp_extract_all(up, '\\b([A-Z]{{5}}[0-9]{{4}}[A-Z])\\b', 1),
           c -> {_valid_pan('c')})) AS strict,
         list_filter(string_split_regex(up, '[\\s.,:;\\-]+'), t -> length(t) = 10) AS tokens,
         CASE WHEN len(words) >= 2 THEN
           list_filter(list_transform(generate_series(1, len(words) - 1),
             i -> regexp_replace(upper(words[i] || words[i+1]), '[^A-Z0-9]', '', 'g')),
             t -> length(t) = 10)
         ELSE CAST([] AS VARCHAR[]) END AS combos,
         regexp_extract_all(up, '([A-Z]{{5}})([0-9IOZS]{{4}})([A-Z0-9])', 0) AS loose,
         trim(regexp_replace(trim(regexp_extract(text, {c1_pat}, 1)), '\\s+', ' ', 'g')) AS c1,
         trim(regexp_replace(trim(regexp_extract(text, {c2_pat}, 1)), '\\s+', ' ', 'g')) AS c2,
         regexp_extract(text, {father_pat}, 1) AS father_raw,
         regexp_extract(text, {dob1_pat}, 1) AS dob1,
         regexp_extract(text, {dob2_pat}, 1) AS dob2
  FROM b1),
b3 AS (
  SELECT *,
         list_filter(list_transform(tokens || combos, c -> {_fuzzy_pan('c')}),
                     c -> {_valid_pan('c')})[1] AS s2,
         list_filter(list_transform(loose, c -> {_fuzzy_pan('c')}),
                     c -> {_valid_pan('c')})[1] AS s3,
         trim(regexp_replace(trim(father_raw), '\\s+', ' ', 'g')) AS father_name_c,
         list_filter(CASE WHEN len(lines) > 2 THEN list_transform(lines, l -> trim(l))
                          ELSE CAST([] AS VARCHAR[]) END,
                     t -> regexp_matches(t, '^[A-Z][A-Z\\s]{{5,}}$')
                          AND {_vn('t', C.NAME_STOPLIST_PAN, 50)}) AS line_cands
  FROM b2),
b4 AS (
  SELECT *,
         CASE WHEN len(strict) > 1 THEN NULL
              WHEN len(strict) = 1 THEN strict[1]
              ELSE COALESCE(s2, s3) END AS pan_number_c
  FROM b3)
SELECT doc_id,
       pan_number_c AS pan_number,
       pan_number_c AS id_number,
       COALESCE(
         CASE WHEN c1 != '' AND {_vn('c1', C.NAME_STOPLIST_PAN, 50)} THEN c1 END,
         CASE WHEN c2 != '' AND {_vn('c2', C.NAME_STOPLIST_PAN, 50)} THEN c2 END,
         line_cands[1]) AS name,
       CASE WHEN father_raw != '' AND {_vn('father_name_c', C.NAME_STOPLIST_PAN, 50)}
            THEN father_name_c END AS father_name,
       COALESCE(
         CASE WHEN dob1 != '' AND {_is_valid_date('dob1')} THEN dob1 END,
         CASE WHEN dob2 != '' AND {_is_valid_date('dob2')} THEN dob2 END) AS date_of_birth,
       CASE WHEN regexp_matches(text, {sig_pat}) THEN 'true' END AS signature_present
FROM b4
"""


# ---------------------------------------------------------------------------
# Vehicle-RC field mirror (extractors.py:326-479) — core fields
# ---------------------------------------------------------------------------

def _valid_reg(c: str) -> str:
    states = ", ".join(f"'{s}'" for s in C.RC_STATE_CODES)
    return (
        f"(regexp_matches({c}, '^[A-Z]{{2}}\\d{{2}}[A-Z]{{1,2}}\\d{{4}}$') "
        f"AND substr({c}, 1, 2) IN ({states}) AND substr({c}, 3, 2) != '00')"
    )


def rc_fields_sql(corpus_sql: str) -> str:
    fmt = (
        "regexp_replace(c, '^([A-Z]{2})(\\d{2})([A-Z]{1,2})(\\d{4})$', "
        "'\\1-\\2-\\3-\\4')"
    )
    owner_pats = [
        "'(?i)(?:owner|owner''?s?\\s+name|registered\\s+owner)\\s*:?\\s*([A-Z][A-Za-z\\s]{3,50})'",
        "'(?i)(?:name|नाम)\\s*:?\\s*([A-Z][A-Za-z\\s]{3,50})'",
    ]
    engine_pat = "'(?i)(?:engine\\s+(?:no|number)|e\\s*no)\\s*:?\\s*([A-Z0-9]{6,20})'"
    chassis_pat = "'(?i)(?:chassis\\s+(?:no|number)|c\\s*no|vin)\\s*:?\\s*([A-Z0-9]{10,20})'"
    fuel_pat = "'(?i)(?:fuel|propulsion)\\s*:?\\s*([A-Za-z]+)'"
    class_pat = "'(?i)(?:vehicle\\s+class|class)\\s*:?\\s*([A-Z\\-]{2,10})'"
    seat_pat = "'(?i)(?:seating|cap|seat)\\s*(?:cap)?\\s*[:.]?\\s*(\\d{1,2})'"

    owner_cases = []
    for p in owner_pats:
        raw = f"regexp_extract(text, {p}, 1)"
        nm = f"trim(regexp_replace(trim({raw}), '\\s+', ' ', 'g'))"
        owner_cases.append(
            f"CASE WHEN {raw} != '' AND {_vn(nm, C.NAME_STOPLIST_RC)} THEN {nm} END"
        )
    fuel_contains = " OR ".join(f"contains(labeled, '{f}')" for f in C.FUEL_TYPES)
    fuel_chain = " ".join(
        f"WHEN regexp_matches(up, '\\b{f}\\b') THEN '{f}'" for f in C.FUEL_TYPES
    )
    classes = ", ".join(f"'{v}'" for v in C.VEHICLE_CLASSES)
    class_chain = " ".join(
        f"WHEN regexp_matches(up, '\\b{v}\\b') THEN '{v}'" for v in C.VEHICLE_CLASSES
    )
    return f"""
WITH corpus AS ({corpus_sql}),
b1 AS (
  SELECT doc_id, text, upper(text) AS up FROM corpus),
b2 AS (
  SELECT *,
         list_distinct(list_transform(list_filter(
           list_transform(
             regexp_extract_all(up, '\\b[A-Z]{{2}}\\s*-?\\s*\\d{{2}}\\s*-?\\s*[A-Z]{{1,2}}\\s*-?\\s*\\d{{4}}\\b', 0),
             m -> regexp_replace(m, '[\\s\\-]+', '', 'g'))
           || regexp_extract_all(up, '\\b([A-Z]{{2}}\\d{{2}}[A-Z]{{1,2}}\\d{{4}})\\b', 1),
           c -> {_valid_reg('c')}), c -> {fmt})) AS reg_cands,
         upper(regexp_extract(text, {fuel_pat}, 1)) AS labeled,
         upper(regexp_extract(text, {class_pat}, 1)) AS class_labeled,
         regexp_extract(text, {engine_pat}, 1) AS engine_raw,
         regexp_extract(text, {chassis_pat}, 1) AS chassis_raw
  FROM b1)
SELECT doc_id,
       CASE WHEN len(reg_cands) = 1 THEN reg_cands[1] END AS registration_number,
       COALESCE({", ".join(owner_cases)}) AS owner_name,
       CASE WHEN engine_raw != '' AND regexp_matches(upper(trim(engine_raw)), '^[A-Z0-9]{{6,20}}$')
            THEN upper(trim(engine_raw)) END AS engine_number,
       CASE WHEN chassis_raw != '' AND regexp_matches(upper(trim(chassis_raw)), '^[A-Z0-9]{{10,20}}$')
            THEN upper(trim(chassis_raw)) END AS chassis_number,
       CASE WHEN labeled != '' AND ({fuel_contains}) THEN labeled {fuel_chain} END AS fuel_type,
       CASE WHEN class_labeled IN ({classes}) THEN class_labeled {class_chain} END AS vehicle_class,
       nullif(regexp_extract(text, {seat_pat}, 1), '') AS seating_capacity
FROM b2
"""


# ---------------------------------------------------------------------------
# Classification mirror (classify.py) + distribution / non-alnum (scoring.py)
# ---------------------------------------------------------------------------

def _type_score_sql(dtype: str, text: str = "text") -> str:
    terms = []
    for kw in C.TYPE_KEYWORDS[dtype]:
        w = C.KEYWORD_MULTIWORD_WEIGHT if len(kw.split()) > 1 else C.KEYWORD_WEIGHT
        kws = kw.lower().replace("'", "''")
        terms.append(f"CASE WHEN contains(lower({text}), '{kws}') THEN {w} ELSE 0 END")
    for pat in C.TYPE_PATTERNS[dtype]:
        p = pat.replace("'", "''")
        terms.append(f"CASE WHEN regexp_matches({text}, '(?i){p}') THEN {C.PATTERN_WEIGHT} ELSE 0 END")
    return "(" + " + ".join(terms) + ")"


def classify_sql(text: str = "text") -> dict[str, str]:
    scores = {t: _type_score_sql(t, text) for t in C.TYPE_KEYWORDS}
    mx = f"greatest({scores['aadhaar']}, {scores['pan']}, {scores['vehicle_rc']})"
    chain = f"CASE WHEN {mx} = 0 THEN '{C.CLASSIFY_DEFAULT}'"
    for t in C.CLASSIFY_PRIORITY[:-1]:
        chain += f" WHEN {scores[t]} = {mx} THEN '{t}'"
    chain += f" ELSE '{C.CLASSIFY_PRIORITY[-1]}' END"
    return {"doc_type": chain, **{f"score_{t}": s for t, s in scores.items()}}


def dbl(x: float) -> str:
    """DuckDB float literal forced to DOUBLE: bare literals parse as DECIMAL
    and constant-fold exactly, diverging bitwise from Spark's doubles."""
    return f"CAST({x!r} AS DOUBLE)"


def distribution_score_sql(text: str, doc_type_sql: str) -> str:
    """distribution_score mirror (scoring.py:56-75) — same operation order."""
    total = f"length({text})"
    numeric = f"({total} - length(regexp_replace({text}, '\\p{{N}}', '', 'g')))"
    special = f"length(regexp_replace({text}, '[\\p{{L}}\\p{{N}}\\s]', '', 'g'))"
    nr = f"({numeric} / {total})"
    sr = f"({special} / {total})"
    branches = []
    for dt, prof in C.DISTRIBUTION_PROFILES.items():
        mn, mxs = dbl(prof["min_numeric_ratio"]), dbl(prof["max_special_char_ratio"])
        score = (
            f"({dbl(1.0)} - (CASE WHEN {nr} < {mn} THEN ({mn} - {nr}) / {mn} * {dbl(C.DIST_NUMERIC_PENALTY)} "
            f"ELSE {dbl(0.0)} END) - (CASE WHEN {sr} > {mxs} THEN ({sr} - {mxs}) / ({dbl(1.0)} - {mxs}) "
            f"* {dbl(C.DIST_SPECIAL_PENALTY)} ELSE {dbl(0.0)} END))"
        )
        branches.append(f"WHEN {doc_type_sql} = '{dt}' THEN greatest({dbl(0.0)}, {score})")
    chain = "CASE " + " ".join(branches) + f" ELSE {dbl(1.0)} END"
    return f"(CASE WHEN {total} = 0 THEN {dbl(0.0)} ELSE {chain} END)"


def non_alnum_ratio_sql(text: str) -> str:
    total = f"length({text})"
    alnum = f"(length({text}) - length(regexp_replace({text}, '[\\p{{L}}\\p{{N}}\\s]', '', 'g')))"
    return f"(CASE WHEN {total} = 0 THEN {dbl(0.0)} ELSE {dbl(1.0)} - {alnum} / {total} END)"
