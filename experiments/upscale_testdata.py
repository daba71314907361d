#!/usr/bin/env python
"""Synthesize a 3x-sf0.1 ("sf0.3") stress dataset for the >2^53 cast audit.

r13's sf0.1 sweep caught stats_spearman's decimal->double one-ULP divergence
only because its integer moments crossed 2^53 at n≈6e5 — the bug class is
invisible until the data is big enough. This script triples sf0.1 by
unioning three KEY-SHIFTED copies of every fact table (dims region/nation
stay as-is, FK deltas applied consistently so every join keeps working),
tripling n and pushing superlinear integer terms (rank moments ~n^3 grow
27x) toward and past the 2^53 cast boundary and the int64 edge — the
executable proof VERDICT r13 item 2 asked for.

Distributions are preserved exactly (copies are identical modulo ids), so
any spark-vs-oracle divergence on this data is an arithmetic/cast hazard,
never a data-shape artifact.

    python experiments/upscale_testdata.py [--out /tmp/sf0.3synth] [--copies 3]
"""

from __future__ import annotations

import argparse
import os

import duckdb

SRC = "/root/testdata/sf0.1"

# table -> columns shifted by (delta of which table's key-space)
SHIFTS: dict[str, dict[str, str]] = {
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
    "events": {"event_id": "events", "user_id": "events_user"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}
KEY_OF = {
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "events": "event_id",
    "events_user": "user_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}
DIMS = ("region", "nation")


def check(out: str) -> None:
    """Validate the synthesized output: key uniqueness and FK containment.

    The stress sweep's value rests on the data being a VALID instance of
    the schema — a broken FK would make join-family divergences look like
    engine bugs. Raises on the first violation."""
    con = duckdb.connect()
    uniq = {
        "customer": "c_custkey",
        "supplier": "s_suppkey",
        "part": "p_partkey",
        "orders": "o_orderkey",
        "events": "event_id",
        "documents": "doc_id",
        "embeddings": "vec_id",
    }
    for t, k in uniq.items():
        n, d = con.execute(
            f"SELECT COUNT(*), COUNT(DISTINCT {k}) FROM '{out}/{t}.parquet'"
        ).fetchone()
        assert n == d, f"{t}.{k}: {n} rows, {d} distinct"
    fks = [
        ("orders", "o_custkey", "customer", "c_custkey"),
        ("lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem", "l_partkey", "part", "p_partkey"),
        ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
        ("customer", "c_nationkey", "nation", "n_nationkey"),
        ("supplier", "s_nationkey", "nation", "n_nationkey"),
        ("nation", "n_regionkey", "region", "r_regionkey"),
    ]
    for ct, ck, pt, pk in fks:
        orphans = con.execute(
            f"SELECT COUNT(*) FROM '{out}/{ct}.parquet' c "
            f"ANTI JOIN '{out}/{pt}.parquet' p ON c.{ck} = p.{pk}"
        ).fetchone()[0]
        assert orphans == 0, f"{ct}.{ck} -> {pt}.{pk}: {orphans} orphans"
    print("check OK: keys unique, FKs contained")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/sf0.3synth")
    ap.add_argument("--copies", type=int, default=3)
    ap.add_argument("--check", action="store_true", help="validate only")
    args = ap.parse_args()
    if args.check:
        check(args.out)
        return
    os.makedirs(args.out, exist_ok=True)
    con = duckdb.connect()

    deltas: dict[str, int] = {}
    for space, col in KEY_OF.items():
        tbl = "events" if space == "events_user" else space
        deltas[space] = (
            con.execute(f"SELECT MAX({col}) + 1 FROM '{SRC}/{tbl}.parquet'").fetchone()[0]
        )

    for t in DIMS:
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{args.out}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: copied as-is")

    for t, shifts in SHIFTS.items():
        cols = [
            r[0]
            for r in con.execute(f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'").fetchall()
        ]
        parts = []
        for k in range(args.copies):
            sel = ", ".join(
                f"{c} + {k * deltas[shifts[c]]} AS {c}" if c in shifts else c
                for c in cols
            )
            parts.append(f"SELECT {sel} FROM '{SRC}/{t}.parquet'")
        con.execute(
            f"COPY ({' UNION ALL '.join(parts)}) TO '{args.out}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(f"SELECT COUNT(*) FROM '{args.out}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows ({args.copies} shifted copies)")
    check(args.out)


if __name__ == "__main__":
    main()
