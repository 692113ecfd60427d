"""Build a deterministically scaled sf dir for parity / sweep runs in the
non-fixed-overhead regime (round-3 verdict item 4: word_stats 1.34x and
extract_pan 1.06x vs DuckDB at sf0.1 are sub-second micro-queries where
job overhead dominates — compare at 100x instead; round-3 verdict item 8:
one full-suite sweep at sf1-equivalent scale).

Expansion: cross each fact table x range(mult); copy i remaps every key
column k -> k * mult + i, which keeps keys unique, preserves every
foreign-key relationship (copy i of an order points at copy i of its
customer), and keeps mod-k distributions uniform (the synth-corpus CASE
branches key on o_orderkey % 3). documents' text gets a per-copy suffix
token so dedup-ish ops don't collapse copies; region/nation are bounded
dimensions and are copied unscaled, exactly like TPC-H's own scaling.

Usage: python scripts/make_scaled_sf.py [mult] [out_dir] [src_sf_dir] [--all]

Default builds only documents+orders (the parity-straggler inputs);
--all builds every table for a full-suite sweep.
"""

from __future__ import annotations

import os
import sys

import duckdb


def _scale_table(con, src: str, out: str, name: str, mult: int,
                 key_cols: list[str], extra: str = "") -> None:
    """Cross with range(mult), remapping each key column k -> k*mult + i."""
    cols = [c[0] for c in con.execute(
        f"DESCRIBE SELECT * FROM read_parquet('{src}/{name}.parquet')"
    ).fetchall()]
    sel = ", ".join(
        f"t.{c} * {mult} + r.i AS {c}" if c in key_cols else f"t.{c}"
        for c in cols
    )
    con.execute(f"""
        COPY (
          SELECT {sel} FROM read_parquet('{src}/{name}.parquet') t,
                 (SELECT unnest(generate_series(0, {mult - 1})) AS i) r
          {extra}
        ) TO '{out}/{name}.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE 131072)
    """)
    n = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{out}/{name}.parquet')"
    ).fetchone()[0]
    print(f"{out}/{name}.parquet: {n} rows ({mult}x)")


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    args = [a for a in sys.argv[2:] if a != "--all"]
    build_all = "--all" in sys.argv
    out = args[0] if args else f"/tmp/sf_scaled_{mult}x"
    src = args[1] if len(args) > 1 else "/root/testdata/sf0.1"

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

    if not build_all:
        return
    # full-suite sweep dir: every table, FK-consistent key remaps
    con.execute(f"""COPY (SELECT * FROM read_parquet('{src}/region.parquet'))
                    TO '{out}/region.parquet' (FORMAT PARQUET)""")
    con.execute(f"""COPY (SELECT * FROM read_parquet('{src}/nation.parquet'))
                    TO '{out}/nation.parquet' (FORMAT PARQUET)""")
    print(f"{out}/region.parquet, nation.parquet: copied unscaled (dims)")
    _scale_table(con, src, out, "customer", mult, ["c_custkey"])
    _scale_table(con, src, out, "supplier", mult, ["s_suppkey"])
    _scale_table(con, src, out, "part", mult, ["p_partkey"])
    # orders was written key-only above; rewrite with all columns for sweeps
    _scale_table(con, src, out, "orders", mult, ["o_orderkey", "o_custkey"])
    _scale_table(con, src, out, "lineitem", mult,
                 ["l_orderkey", "l_partkey", "l_suppkey"])
    _scale_table(con, src, out, "events", mult, ["event_id", "user_id"])
    _scale_table(con, src, out, "embeddings", mult, ["vec_id"])


if __name__ == "__main__":
    main()
