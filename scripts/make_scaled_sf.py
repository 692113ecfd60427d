"""Build a deterministically scaled documents table for parity runs in the
non-fixed-overhead regime (round-3 verdict item 4: word_stats 1.34x and
extract_pan 1.06x vs DuckDB at sf0.1 are sub-second micro-queries where
job overhead dominates — compare at 100x instead).

Expansion: cross documents x range(mult); copy i keeps the text but
appends a per-copy suffix token (so dedup-ish ops don't collapse copies)
and remaps doc_id = doc_id * mult + i (stays unique, same distribution
mod k for the synth-corpus CASE branches).

Usage: python scripts/make_scaled_sf.py [mult] [out_dir] [src_sf_dir]
"""

from __future__ import annotations

import os
import sys

import duckdb


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    out = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/sf_scaled_{mult}x"
    src = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"

    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"""
        COPY (
          SELECT d.doc_id * {mult} + r.i AS doc_id,
                 d.text || ' v' || CAST(r.i AS VARCHAR) AS text,
                 d.lang, d.source,
                 d.n_chars + 2 + len(CAST(r.i AS VARCHAR)) AS n_chars
          FROM read_parquet('{src}/documents.parquet') d,
               (SELECT unnest(generate_series(0, {mult - 1})) AS i) r
        ) TO '{out}/documents.parquet'
        (FORMAT PARQUET, ROW_GROUP_SIZE 65536)
    """)
    n = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{out}/documents.parquet')"
    ).fetchone()[0]
    print(f"{out}/documents.parquet: {n} rows ({mult}x)")

    # orders drives the synthetic extraction corpus (synth.py reads only
    # o_orderkey); okey*mult+i keeps keys unique and the mode = okey % 3
    # distribution uniform, so all three extraction doc types scale together
    con.execute(f"""
        COPY (
          SELECT o.o_orderkey * {mult} + r.i AS o_orderkey
          FROM read_parquet('{src}/orders.parquet') o,
               (SELECT unnest(generate_series(0, {mult - 1})) AS i) r
        ) TO '{out}/orders.parquet'
        (FORMAT PARQUET, ROW_GROUP_SIZE 131072)
    """)
    n = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{out}/orders.parquet')"
    ).fetchone()[0]
    print(f"{out}/orders.parquet: {n} rows ({mult}x)")


if __name__ == "__main__":
    main()
