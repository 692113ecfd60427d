"""Content-type sniffing from leading byte signatures — the dispatch an
ingestion pipeline runs before routing a payload to the HTML extractor,
the PDF rasterizer, or the image decoder. Declared Content-Type headers
lie constantly at crawl scale; magic bytes don't.

Zero shuffle: one hex projection + a prefix CASE, codegen'd, fused into
the scan; the payload is pruned immediately after. No binary-to-string
cast anywhere — arbitrary bytes are not valid UTF-8, and a cast that
errors (or silently mangles) on them is a dead job at corpus scale; the
HTML markers are matched as explicit upper/lower hex variants instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (type, uppercase hex prefix of the magic bytes); first match wins.
SIGNATURES = [
    ("pdf", "255044462D"),            # %PDF-
    ("gzip", "1F8B"),
    ("png", "89504E470D0A1A0A"),
    ("jpeg", "FFD8FF"),
    ("zip", "504B0304"),
    ("html", "3C21444F4354595045"),   # <!DOCTYPE
    ("html", "3C21646F6374797065"),   # <!doctype
    ("html", "3C48544D4C"),           # <HTML
    ("html", "3C68746D6C"),           # <html
]


def sniff_type(payload: Column) -> Column:
    """Sniffed type for a binary column; 'unknown' when nothing matches."""
    hx = F.upper(F.hex(payload))
    expr = F.lit("unknown")
    for name, sig in reversed(SIGNATURES):
        expr = F.when(hx.startswith(sig), F.lit(name)).otherwise(expr)
    return expr


def mime_sniff(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """(doc, sniffed) for every row — the router's dispatch column."""
    return df.select(
        F.col(id_col).alias("doc"),
        sniff_type(F.col(payload_col)).alias("sniffed"),
    )
