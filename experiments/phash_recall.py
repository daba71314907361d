#!/usr/bin/env python
"""Measure banded pHash near-dup recall/precision vs exact Hamming pairs.

VERDICT r9 item 7: `multimodal_phash_dedup` ships with a *proof* that the
16 x 4-bit banding has recall 1.0 for any pair under 16 differing bits
(pigeonhole: fewer than 16 flipped bits cannot touch all 16 bands), but no
*measured* log like experiments/ann_log.csv gives the ANN family. This
script generates synthetic image populations at two sizes (the fixture
generator family scaled up), computes the ALL-INTEGER pHash for each, and
compares

  truth      = all pairs with Hamming(phash_a, phash_b) <= threshold (12)
  candidates = pairs sharing at least one of the 16 4-bit bands
  emitted    = candidates filtered to Hamming <= threshold (the op's output)

Recall of `emitted` vs `truth` must be exactly 1.0 (the proof, observed);
precision of `emitted` is 1.0 by construction (same filter as truth). The
engineering number banding buys is the CANDIDATE fraction: how much of the
N*(N-1)/2 pair space the band join actually materializes — that is the
quadratic term the 100 TB path avoids. Results append to phash_log.csv:

  population,n_pairs_total,n_true,n_candidates,recall,candidate_frac

Pure Python on purpose — the hash and banding arithmetic is identical to
the engine's (module constants imported, not copied), and no Spark session
is needed to audit set algebra over 64-bit ints.
"""

from __future__ import annotations

import csv
import os
import sys
from itertools import combinations

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wri_data_processing_spark.queries.multimodal import (
    _PHASH_BANDS,
    _PHASH_THRESHOLD,
    _phash64,
)


def _base_px(i: int):
    """Scaled-up cousin of the fixture generator: six per-image integer
    coefficients drive three channel polynomials, giving structurally
    distinct images whose hashes land far apart (probed >= 16 bits)."""
    a = 3 + (i * 7) % 23
    b = 5 + (i * 11) % 19
    c = 2 + (i * 13) % 29
    d = 7 + (i * 17) % 13
    e = 1 + (i * 19) % 31
    f = 4 + (i * 23) % 11

    def px(x: int, y: int) -> tuple[int, int, int]:
        return (
            (x * a + y * b + (x * y) % 7 * 31) % 256,
            (x * c + y * d + (x + y) * (x + y) % 11 * 19) % 256,
            (x * e + y * f + (x * 3 + y * 2) % 5 * 43) % 256,
        )

    return px


def _perturb(pxf, w: int, kind: int):
    """Three perturbation families a near-dup detector must survive:
    brightness band (kind 0), mild global brightness (kind 1), single
    corner blotch (kind 2)."""

    def px(x: int, y: int) -> tuple[int, int, int]:
        r, g, b = pxf(x, y)
        if kind == 0 and x < max(w // 9, 1):
            return (min(r + 60, 255), min(g + 60, 255), min(b + 60, 255))
        if kind == 1:
            return (min(r + 12, 255), min(g + 12, 255), min(b + 12, 255))
        if kind == 2 and x < 3 and y < 3:
            return (255 - r, 255 - g, 255 - b)
        return (r, g, b)

    return px


def _population(n_base: int) -> list[tuple[int, int]]:
    """Return [(image_id, phash)] with one perturbed sibling per 2nd base."""
    out = []
    mid = 0
    for i in range(n_base):
        w, h = 18 + 2 * (i % 8), 16 + (i % 4) * 2
        base = _base_px(i)
        out.append((mid, _phash64(base, w, h)))
        mid += 1
        if i % 2 == 0:
            out.append((mid, _phash64(_perturb(base, w, i % 3), w, h)))
            mid += 1
    return out


def _bands(h: int) -> list[tuple[int, int]]:
    u = h & ((1 << 64) - 1)  # two's complement -> unsigned, like the SQL >>
    return [(j, (u >> (4 * j)) & 15) for j in range(_PHASH_BANDS)]


def hamming(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def run(n_base: int) -> dict:
    pop = _population(n_base)
    pairs = list(combinations(pop, 2))
    true = {
        (a[0], b[0]) for a, b in pairs if hamming(a[1], b[1]) <= _PHASH_THRESHOLD
    }
    cand = {
        (a[0], b[0])
        for a, b in pairs
        if set(_bands(a[1])) & set(_bands(b[1]))
    }
    emitted = {
        (ai, bi)
        for (ai, bi) in cand
        if hamming(dict(pop)[ai], dict(pop)[bi]) <= _PHASH_THRESHOLD
    }
    recall = 1.0 if not true else len(emitted & true) / len(true)
    return {
        "population": len(pop),
        "n_pairs_total": len(pairs),
        "n_true": len(true),
        "n_candidates": len(cand),
        "recall": round(recall, 6),
        "candidate_frac": round(len(cand) / max(len(pairs), 1), 6),
    }


def main() -> None:
    rows = [run(n) for n in (8, 64, 256)]
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "phash_log.csv")
    with open(path, "w", newline="") as fh:
        w = csv.DictWriter(fh, fieldnames=list(rows[0]))
        w.writeheader()
        w.writerows(rows)
    for r in rows:
        print(r)
    assert all(r["recall"] == 1.0 for r in rows), "banding recall proof violated"


if __name__ == "__main__":
    main()
