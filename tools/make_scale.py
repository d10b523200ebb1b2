"""Synthesize larger scale factors by replicating an existing testdata
SF with id offsets (no generator is shipped for sf>0.1). FK columns are
offset consistently (orders.o_custkey follows customer, lineitem
follows orders/part/supplier); the tiny fixed dimensions (region,
nation) are copied unchanged, as TPC-H does. Document/embedding ids
stay below the 1e6 mutant offset used by the dedup family.

Replication makes each copy an EXACT duplicate of the base corpus, so
at x10 every LSH/shingle bucket grows by 10 and every dedup cluster is
a real 10-member clique — a deliberately harder (more skewed) shape
than an organic corpus, which is what a scale smoke test wants.

Usage: python tools/make_scale.py [--mult 10] [--src /root/testdata/sf0.1]
                                  [--dst /root/repo/.scale/sf1]
"""

from __future__ import annotations

import argparse
import os

import duckdb

# table -> columns to offset by copy_idx * stride(col's own table)
OFFSET_COLS = {
    "region": {},
    "nation": {},
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {"l_orderkey": "orders", "l_partkey": "part",
                 "l_suppkey": "supplier"},
    "events": {"event_id": "events", "user_id": "events_user"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}

# stride source: (table, id column) whose max+1 is the stride
STRIDES = {
    "customer": ("customer", "c_custkey"),
    "supplier": ("supplier", "s_suppkey"),
    "part": ("part", "p_partkey"),
    "orders": ("orders", "o_orderkey"),
    "events": ("events", "event_id"),
    "events_user": ("events", "user_id"),
    "documents": ("documents", "doc_id"),
    "embeddings": ("embeddings", "vec_id"),
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="/root/repo/.scale/sf1")
    ap.add_argument("--salt-doc-tokens", action="store_true",
                    help="suffix every documents.text token with the "
                         "replica index, making each copy's text "
                         "globally unique: the corpus DUPLICATION RATE "
                         "stays constant as size grows (each replica "
                         "keeps only the base corpus's internal "
                         "duplication), instead of every span becoming "
                         "mult-way duplicated. The fixture that "
                         "separates output-growth effects from plan "
                         "defects for span/dedup queries (round-8 "
                         "verdict note 7a).")
    args = ap.parse_args()
    os.makedirs(args.dst, exist_ok=True)

    con = duckdb.connect()
    strides = {}
    for name, (tbl, col) in STRIDES.items():
        strides[name] = con.execute(
            f"SELECT MAX({col}) + 1 FROM "
            f"read_parquet('{args.src}/{tbl}.parquet')").fetchone()[0]
    print("strides:", strides)

    for tbl, offs in OFFSET_COLS.items():
        src = f"{args.src}/{tbl}.parquet"
        dst = f"{args.dst}/{tbl}.parquet"
        if not offs:
            con.execute(f"COPY (SELECT * FROM read_parquet('{src}')) "
                        f"TO '{dst}' (FORMAT PARQUET)")
            print(f"{tbl}: copied unchanged")
            continue
        cols = [r[0] for r in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{src}')").fetchall()]
        sel = ", ".join(
            f"{c} + i * {strides[offs[c]]} AS {c}" if c in offs
            else (f"regexp_replace({c}, '(\\S+)', "
                  f"'\\1r' || CAST(i AS VARCHAR), 'g') AS {c}"
                  if args.salt_doc_tokens and tbl == "documents"
                  and c == "text" else c)
            for c in cols)
        con.execute(
            f"COPY (SELECT {sel} FROM read_parquet('{src}') "
            f"CROSS JOIN (SELECT unnest(generate_series(0, {args.mult - 1}))"
            f" AS i) ORDER BY i) TO '{dst}' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{dst}')").fetchone()[0]
        print(f"{tbl}: x{args.mult} -> {n} rows")

    # sanity: document ids must stay below the dedup mutant offset
    mx = con.execute(f"SELECT MAX(doc_id) FROM "
                     f"read_parquet('{args.dst}/documents.parquet')"
                     ).fetchone()[0]
    assert mx < 1_000_000, mx
    print("doc_id max:", mx, "(< 1e6 mutant offset, ok)")


if __name__ == "__main__":
    main()
