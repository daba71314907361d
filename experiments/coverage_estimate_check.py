#!/usr/bin/env python
"""Honesty check for dedup_coverage_estimate's Lincoln-Petersen claim.

If the estimator is honest, N_LP = n_A * n_B / |A n B| should sit AT OR
ABOVE every observable union of independent detectors — including a
THIRD detector the estimate never saw. Run against the DuckDB oracles
(pure SQL, no Spark) at both test SFs.

Measured (2026-08-15, fixture data):
  sf0.001: A=28 (MinHash-LSH), B=26 (SimHash<=3), overlap=21,
           LP=34.7 vs 2-union 33 vs 3-union (adding exact n-gram
           Jaccard pairs) 33 -> the third detector found NOTHING beyond
           the union, and LP predicts ~1.7 pairs still unseen.
  sf0.01:  A=25, B=25, overlap=22, LP=28.4 vs unions 28/28.
The estimate brackets the observable truth from above at both scales —
the behavior a curator needs from a missed-duplicate bound.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import wri_data_processing_spark.registry as registry
from tests.oracle_harness import duck_con

registry.load_all()


def pair_set(con, sql: str) -> set:
    return set(map(tuple, con.execute(sql).fetchall()))


def main() -> None:
    for sf in ("0.001", "0.01"):
        con = duck_con(f"/root/testdata/sf{sf}")
        a = pair_set(
            con,
            f"SELECT doc_a, doc_b FROM ({registry.ORACLE['dedup_minhash_lsh']})",
        )
        b = pair_set(
            con,
            f"""
            WITH h AS ({registry.ORACLE['dedup_simhash']}),
            bands AS (
              SELECT doc_id, simhash, j, (simhash >> (15*j)) & 32767 AS band
              FROM h, unnest(generate_series(0,3)) u(j)),
            cand AS (
              SELECT DISTINCT x.doc_id da, y.doc_id db,
                     x.simhash ha, y.simhash hb
              FROM bands x JOIN bands y
                ON x.j = y.j AND x.band = y.band AND x.doc_id < y.doc_id)
            SELECT da, db FROM cand WHERE bit_count(xor(ha, hb)) <= 3
            """,
        )
        c = pair_set(
            con,
            f"SELECT doc_a, doc_b FROM ({registry.ORACLE['dedup_ngram_jaccard']})",
        )
        m = len(a & b)
        lp = len(a) * len(b) / m
        print(
            f"sf{sf}: A={len(a)} B={len(b)} overlap={m} LP={lp:.1f} "
            f"2-union={len(a | b)} 3-union={len(a | b | c)} "
            f"honest={'YES' if lp >= len(a | b | c) else 'NO'}"
        )


if __name__ == "__main__":
    main()
