"""PDF text-layer extraction for UNCOMPRESSED content streams.

The PDF text-showing operators live in content streams as
``BT ... (string) Tj ... [(a)(b)-250(c)] TJ ... ET`` blocks; when the
stream is not Flate-compressed (linearized simple PDFs, many generated
invoices/receipts — and every fixture this engine synthesizes), the
text layer is directly regex-addressable with zero native dependencies.
Compressed streams are OUT of this operator's scope by design: the
router (sources/sniff.mime_sniff) sends those payloads down the
OCR/rasterize path (extraction/recognizer.py), which is the reference
pipeline's behavior for image-only PDFs anyway. That split — text layer
when present and readable, OCR otherwise — is exactly how production
extraction tiers treat PDFs.

Reference parity anchor: the reference repo OCRs every PDF page
unconditionally (api/server.py renders PDFs to images before
paddle infer); this operator is the beyond-reference fast path that
avoids rasterizing born-digital documents.

Extraction rules (deterministic, documented):
- every ``(...) Tj`` emits its string as one run;
- every ``[...] TJ`` array concatenates its strings, inserting a space
  where a kerning adjustment <= -180 thousandths appears between them
  (the standard word-gap heuristic);
- runs join with single spaces in stream order;
- string escapes ``\\(``, ``\\)``, ``\\\\`` unescape (octal escapes of
  any length 1-3 and hex strings <...> — whether before ``Tj`` or inside
  a ``TJ`` array — are rejected to NULL: observable, never silent).

Everything is codegen'd regexp/HOF projection: no shuffle, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# a text block body between BT/ET
_BT_RE = r"(?s)BT(.*?)ET"
# (string) Tj  |  [ ... ] TJ — captured with their operator
_SHOW_RE = r"(?s)(\((?:[^()\\]|\\.)*\)\s*Tj|\[(?:[^\]\\]|\\.)*\]\s*TJ)"
# one literal string inside a TJ array, with the kern number after it
_TJ_PART_RE = r"(?s)\((?:[^()\\]|\\.)*\)|-?[0-9]+(?:\.[0-9]+)?"


def _unescape(c: Column) -> Column:
    return F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(c, r"\\\(", "("), r"\\\)", ")"),
        r"\\\\", r"\\")


def _strip_parens(c: Column) -> Column:
    return _unescape(F.regexp_replace(c, r"(?s)^\((.*)\)$", "$1"))


def pdf_text_extract(df: DataFrame, id_col: str, pdf_col: str) -> DataFrame:
    """(id, n_blocks, n_runs, text) from an uncompressed-PDF string
    column; rows whose payload contains hex strings or octal escapes in
    text position return NULL text with rejected=1 (the OCR-path
    hand-off marker)."""
    pdf = F.col(pdf_col)
    # Reject-to-NULL guard (the OCR-path hand-off): a hex string <...>
    # in show position — before a Tj OR anywhere inside a [...] TJ array
    # — or ANY octal escape \d, \dd, \ddd inside a literal string. All
    # three forms are legal PDF this extractor does not decode; passing
    # them through would silently drop/mangle text, so they must mark
    # the row rejected instead (round-3 advice: a <hex> inside a TJ
    # array previously slipped past and parsed as kern numbers).
    rejected = (
        pdf.rlike(r"(?s)BT.*<[0-9A-Fa-f\s]*>\s*Tj")
        | pdf.rlike(
            r"(?s)BT.*\[(?:[^\]\\]|\\.)*<[0-9A-Fa-f\s]*>(?:[^\]\\]|\\.)*\]\s*TJ")
        | pdf.rlike(r"(?s)\((?:[^()\\]|\\.)*\\[0-7]")
    ).cast("int")
    blocks = F.regexp_extract_all(pdf, F.lit(_BT_RE), F.lit(1))
    shows = F.flatten(F.transform(
        blocks,
        lambda b: F.regexp_extract_all(b, F.lit(_SHOW_RE), F.lit(1)),
    ))

    def run_text(s: Column) -> Column:
        # a Tj: one literal string. a TJ: fold parts, spacing on kerns.
        tj = _strip_parens(
            F.regexp_replace(s, r"(?s)\s*Tj$", ""))
        parts = F.regexp_extract_all(s, F.lit(_TJ_PART_RE), F.lit(0))
        tj_arr = F.aggregate(
            parts,
            F.lit(""),
            lambda acc, p: F.when(
                p.startswith("("),
                F.concat(acc, _strip_parens(p)),
            ).otherwise(
                F.when(p.cast("double") <= -180.0, F.concat(acc, F.lit(" ")))
                .otherwise(acc)
            ),
        )
        return F.when(s.rlike(r"(?s)\]\s*TJ$"), tj_arr).otherwise(tj)

    runs = F.transform(shows, run_text)
    return df.select(
        F.col(id_col).alias("doc"),
        F.size(blocks).cast("bigint").alias("n_blocks"),
        F.size(runs).cast("bigint").alias("n_runs"),
        F.when(rejected == 1, F.lit(None).cast("string"))
        .otherwise(F.array_join(runs, " ")).alias("text"),
        rejected.alias("rejected"),
    )


def reading_order(df: DataFrame, id_col: str,
                  x_col: str, y_col: str, word_col: str,
                  min_gap: int = 200) -> DataFrame:
    """Reading-order reconstruction from word boxes with column
    detection: find the largest horizontal gap between distinct word x
    positions per document — if it reaches ``min_gap``, the page is
    two-column and words order (column, y, x); otherwise (y, x). This
    is the layout step between OCR word boxes and linear text that
    naive y-then-x ordering gets wrong on every two-column PDF/scan
    (it interleaves the columns line by line).

    Returns (doc, n_words, n_cols, ordered_text). Deterministic: gap
    argmax ties break to the LEFTMOST gap; the final ordering ties
    break on x then word. Shape: one distinct-x per-doc window pass for
    the gap scan (x-histogram-sized), one doc agg with an in-row
    array_sort for the ordering — the per-doc word list is page-sized,
    which is exactly the granularity OCR emits."""
    base = df.select(
        F.col(id_col).alias("doc"),
        F.col(x_col).cast("bigint").alias("x"),
        F.col(y_col).cast("bigint").alias("y"),
        F.col(word_col).alias("w"),
    )
    from pyspark.sql.window import Window

    xs = base.select("doc", "x").distinct()
    wlag = Window.partitionBy("doc").orderBy("x")
    gaps = (
        xs.withColumn("px", F.lag("x").over(wlag))
        .filter(F.col("px").isNotNull())
        .select("doc", (F.col("x") - F.col("px")).alias("gap"),
                F.col("px").alias("left_x"))
    )
    split = (
        gaps.groupBy("doc")
        .agg(F.max(F.struct(F.col("gap"), (-F.col("left_x")).alias("nl"),
                            F.col("left_x"), F.col("gap").alias("g")))
             .alias("b"))
        .select(
            "doc",
            F.when(F.col("b.gap") >= min_gap,
                   F.col("b.left_x") + F.col("b.g") / 2)
            .cast("bigint").alias("split_x"),
        )
    )
    placed = (
        base.join(split, "doc", "left")
        .select(
            "doc", "y", "x", "w",
            F.when(F.col("split_x").isNotNull()
                   & (F.col("x") > F.col("split_x")), 1)
            .otherwise(0).alias("col"),
        )
    )
    return (
        placed.groupBy("doc")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            (F.max("col") + 1).cast("bigint").alias("n_cols"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(
                        F.struct("col", "y", "x", "w"))),
                    lambda s: s["w"]),
                " ").alias("ordered_text"),
        )
    )


def table_from_boxes(df: DataFrame, id_col: str,
                     x_col: str, y_col: str, word_col: str,
                     x_gap: int = 60, y_gap: int = 15) -> DataFrame:
    """Table-structure reconstruction from word boxes: x gaps >= x_gap
    between distinct word x positions open column bands, y gaps >= y_gap
    open row bands; every word lands in (row band, column band) and each
    cell concatenates its words in (y, x) order. Returns per doc
    (doc, n_rows, n_cols, grid) with the grid rendered row-major as
    'cell|cell||cell|cell' (| between cells, || between rows) — the
    deterministic text rendering of the reconstructed table, the step
    between OCR boxes and html_tables-style structured rows.

    Shape: the band scan runs per doc over DISTINCT x (resp. y) values
    with one lag window each (histogram-sized); band boundaries come
    back as per-doc arrays through a doc-keyed join, so cell assignment
    is an in-row filter count, never a range join."""
    from pyspark.sql.window import Window

    base = df.select(
        F.col(id_col).alias("doc"),
        F.col(x_col).cast("bigint").alias("x"),
        F.col(y_col).cast("bigint").alias("y"),
        F.col(word_col).alias("w"),
    )

    def bands(col: str, gap: int):
        xs = base.select("doc", col).distinct()
        wl = Window.partitionBy("doc").orderBy(col)
        return (
            xs.withColumn("p", F.lag(col).over(wl))
            .filter(F.col("p").isNotNull()
                    & (F.col(col) - F.col("p") >= gap))
            .groupBy("doc")
            .agg(F.array_sort(F.collect_list(F.col(col)))
                 .alias(f"{col}_bounds"))
        )

    placed = (
        base.join(bands("x", x_gap), "doc", "left")
        .join(bands("y", y_gap), "doc", "left")
        .select(
            "doc", "x", "y", "w",
            F.size(F.filter(
                F.coalesce("x_bounds", F.array().cast("array<bigint>")),
                lambda b: b <= F.col("x"))).alias("col"),
            F.size(F.filter(
                F.coalesce("y_bounds", F.array().cast("array<bigint>")),
                lambda b: b <= F.col("y"))).alias("row"),
        )
    )
    cells = (
        placed.groupBy("doc", "row", "col")
        .agg(F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("y", "x", "w"))),
                lambda s: s["w"]),
            " ").alias("cell"))
    )
    return (
        cells.groupBy("doc")
        .agg(
            (F.max("row") + 1).cast("bigint").alias("n_rows"),
            (F.max("col") + 1).cast("bigint").alias("n_cols"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(
                        F.struct("row", "col", "cell"))),
                    lambda s: F.concat(
                        F.when((s["col"] == 0) & (s["row"] > 0),
                               F.lit("||")).otherwise(
                            F.when(s["col"] > 0, F.lit("|"))
                            .otherwise(F.lit(""))),
                        s["cell"]),
                ), "").alias("grid"),
        )
    )


def dehyphenate(text) -> "F.Column":
    """Repair hyphenation at line breaks: ``exam-\\nple`` rejoins to
    ``example`` when the continuation starts lowercase (the standard
    conservative rule — 'Berlin-\\nWest' style proper-noun breaks keep
    the hyphen as 'Berlin-West', and an explicit double hyphen
    ``--\\n`` is preserved as punctuation). Pure regexp projection."""
    # rejoin lowercase continuations: word- \n lower -> wordlower
    out = F.regexp_replace(
        text, r"([a-z])-\n([a-z])", "$1$2")
    # proper-noun breaks: keep the hyphen, drop the line break
    out = F.regexp_replace(out, r"([A-Za-z])-\n([A-Z])", "$1-$2")
    return out


def ocr_vote(df: DataFrame, id_col: str,
             words_a: str, conf_a: str,
             words_b: str, conf_b: str) -> DataFrame:
    """Confidence-weighted word-level merge of two OCR engines' output
    (position-aligned arrays): per slot take the word whose engine
    reported higher confidence, ties to engine A (the reference
    engine's dual-pass merge J1 applies this at field level; this is
    the word-level generalization). Returns (doc, n_words, n_from_b,
    merged) — n_from_b is the audit count of slots engine B won.
    Zero shuffle: one zip_with over four in-row arrays."""
    picked = F.zip_with(
        F.arrays_zip(F.col(words_a), F.col(conf_a)),
        F.arrays_zip(F.col(words_b), F.col(conf_b)),
        lambda a, b: F.struct(
            F.when(b[conf_b] > a[conf_a], b[words_b])
            .otherwise(a[words_a]).alias("w"),
            F.when(b[conf_b] > a[conf_a], 1).otherwise(0).alias("fb"),
        ),
    )
    return df.select(
        F.col(id_col).alias("doc"),
        F.size(F.col(words_a)).cast("bigint").alias("n_words"),
        F.aggregate(picked, F.lit(0),
                    lambda acc, s: acc + s["fb"]).cast("bigint")
        .alias("n_from_b"),
        F.array_join(F.transform(picked, lambda s: s["w"]), " ")
        .alias("merged"),
    )


# a literal-string value after a given Info key: /Key (value)
def _info_field(pdf: Column, key: str) -> Column:
    pat = r"/" + key + r"\s*\((?:[^()\\]|\\.)*\)"
    raw = F.regexp_extract(pdf, r"(?s)" + pat, 0)
    val = F.regexp_extract(raw, r"(?s)\(((?:[^()\\]|\\.)*)\)", 1)
    return F.when(raw != "", _unescape(val))


def pdf_info_metadata(df: DataFrame, id_col: str, pdf_col: str) -> DataFrame:
    """Parse the PDF document-information dictionary (``<< /Title (..)
    /Author (..) /Producer (..) /CreationDate (D:YYYYMMDDHHMMSS..) >>``)
    into typed columns — the metadata sidecar of the born-digital fast
    path (pdf_text_extract handles the text layer, this the Info dict a
    crawl pipeline indexes for dating/attribution). Literal-string
    escapes unescape exactly as in the text layer; the PDF date accepts
    the spec's prefix truncation (``D:YYYY`` minimum) with missing parts
    defaulting to 01-01 00:00:00, and any trailing timezone suffix is
    ignored (dates stay as-authored, not shifted). Missing fields are
    NULL, not ''; a payload with no Info dict returns has_info = 0.

    Returns (id, has_info, title, author, producer, created).

    Scale shape: pure codegen'd regexp projection — zero shuffle, zero
    Python; at 10^12 docs this is scan-bound and pairs with the same
    mime_sniff routing as pdf_text_extract."""
    pdf = F.col(pdf_col)
    has_info = F.regexp_extract(pdf, r"(?s)<<(.*?)>>", 0) != ""
    d = F.regexp_extract(
        pdf,
        r"/CreationDate\s*\(D:([0-9]{4})([0-9]{2})?([0-9]{2})?"
        r"([0-9]{2})?([0-9]{2})?([0-9]{2})?",
        0)
    def g(i: int, dflt: str) -> Column:
        v = F.regexp_extract(
            d,
            r"D:([0-9]{4})([0-9]{2})?([0-9]{2})?"
            r"([0-9]{2})?([0-9]{2})?([0-9]{2})?",
            i)
        return F.when(v != "", v).otherwise(F.lit(dflt))
    created = F.when(
        d != "",
        F.concat(g(1, ""), F.lit("-"), g(2, "01"), F.lit("-"), g(3, "01"),
                 F.lit(" "), g(4, "00"), F.lit(":"), g(5, "00"),
                 F.lit(":"), g(6, "00")))
    return df.select(
        F.col(id_col),
        has_info.cast("int").alias("has_info"),
        _info_field(pdf, "Title").alias("title"),
        _info_field(pdf, "Author").alias("author"),
        _info_field(pdf, "Producer").alias("producer"),
        created.alias("created"),
    )
