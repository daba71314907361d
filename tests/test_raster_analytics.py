"""Raster analytics vs an independent Python reference.

The DuckDB oracles prove ENGINE parity; these tests prove SEMANTICS with a
third implementation written the naive way (dict lookups, per-cell loops).
If the DataFrame plan and its oracle ever encoded the same misunderstanding
(e.g. both dropping edge cells wrongly, both flipping a gradient sign), the
cross-engine hash would still pass — this reference would not.
"""

from __future__ import annotations

import math
from decimal import Decimal

import pytest

from wri_data_processing_spark import registry
from wri_data_processing_spark.queries.geo import _cells

registry.load_all()

TOL = 2e-6  # engine outputs are ROUND(.,6); reference compares unrounded


@pytest.fixture(scope="module")
def cell_map(spark, sf_dir):
    rows = _cells(spark, sf_dir).collect()
    return {
        (r["layer_id"], r["x"], r["y"]): (Decimal(str(r["s"])), r["n"]) for r in rows
    }


def _val(cm, key):
    s, n = cm[key]
    return float(s) / n


def test_zonal_stats_vs_reference(spark, sf_dir, cell_map):
    zones: dict = {}
    for (lid, x, y), (s, n) in cell_map.items():
        z = zones.setdefault((lid, x // 8, y // 8), [0, Decimal(0), 0, None, None])
        z[0] += 1
        z[1] += s
        z[2] += n
        v = _val(cell_map, (lid, x, y))
        z[3] = v if z[3] is None else min(z[3], v)
        z[4] = v if z[4] is None else max(z[4], v)
    got = {
        (r["layer_id"], r["zone_x"], r["zone_y"]): r
        for r in registry.REGISTRY["geo_zonal_stats"](spark, sf_dir).collect()
    }
    assert set(got) == set(zones)
    for k, (nc, ssum, nsum, mn, mx) in zones.items():
        r = got[k]
        assert r["n_cells"] == nc
        assert abs(r["zone_mean"] - float(ssum) / nsum) <= TOL
        assert abs(r["min_cell"] - mn) <= TOL and abs(r["max_cell"] - mx) <= TOL


def test_focal_mean_vs_reference(spark, sf_dir, cell_map):
    got = {
        (r["layer_id"], r["x"], r["y"]): r
        for r in registry.REGISTRY["geo_focal_mean"](spark, sf_dir).collect()
    }
    # Reference: every target within the grid receiving >= 1 contribution.
    expect = {}
    for (lid, x, y) in cell_map:
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                tx, ty = x + dx, y + dy
                if 0 <= tx <= 63 and 0 <= ty <= 63:
                    e = expect.setdefault((lid, tx, ty), [0, Decimal(0), 0])
                    e[0] += 1
                    s, n = cell_map[(lid, x, y)]
                    e[1] += s
                    e[2] += n
    assert set(got) == set(expect)
    for k, (nn, ssum, nsum) in expect.items():
        assert got[k]["n_neighbors"] == nn
        assert abs(got[k]["focal_mean"] - float(ssum) / nsum) <= TOL


def test_slope_and_hillshade_vs_reference(spark, sf_dir, cell_map):
    slope = {
        (r["layer_id"], r["x"], r["y"]): r
        for r in registry.REGISTRY["geo_slope"](spark, sf_dir).collect()
    }
    hs = {
        (r["layer_id"], r["x"], r["y"]): r["hillshade"]
        for r in registry.REGISTRY["geo_hillshade"](spark, sf_dir).collect()
    }
    lx, ly, lz = -0.5, 0.5, 0.7071067811865476
    expect_keys = set()
    for (lid, x, y) in cell_map:
        # Engine semantics: emit only where the CENTER cell exists AND all
        # four axis neighbors exist (nodata stays nodata).
        if all(
            (lid, x + dx, y + dy) in cell_map
            for dx, dy in [(-1, 0), (1, 0), (0, -1), (0, 1)]
        ) and 0 <= x <= 63 and 0 <= y <= 63:
            expect_keys.add((lid, x, y))
            # Mirror the engine's 2-addend form — a cell scattering to
            # offset -1 is the EAST neighbor of that target, so dz/dx =
            # 0.5*east + (-0.5)*west = (east - west)/2, as documented.
            dzdx = 0.5 * _val(cell_map, (lid, x + 1, y)) + (-0.5) * _val(
                cell_map, (lid, x - 1, y)
            )
            dzdy = 0.5 * _val(cell_map, (lid, x, y + 1)) + (-0.5) * _val(
                cell_map, (lid, x, y - 1)
            )
            r = slope[(lid, x, y)]
            assert abs(r["dzdx"] - dzdx) <= TOL and abs(r["dzdy"] - dzdy) <= TOL
            assert abs(r["slope"] - math.sqrt(dzdx * dzdx + dzdy * dzdy)) <= TOL
            shade = 255.0 * max(
                0.0,
                ((-dzdx) * lx - dzdy * ly + lz)
                / math.sqrt(dzdx * dzdx + dzdy * dzdy + 1.0),
            )
            assert abs(hs[(lid, x, y)] - shade) <= TOL
    # Interior-cell predicate: the engine emits exactly the cells whose four
    # axis neighbors exist (nx = ny = 2), no more, no fewer.
    assert set(slope) == expect_keys and set(hs) == expect_keys


def test_raster_algebra_vs_reference(spark, sf_dir, cell_map):
    got = {
        (r["x"], r["y"]): r["ndi"]
        for r in registry.REGISTRY["geo_raster_algebra"](spark, sf_dir).collect()
    }
    expect = {}
    for (lid, x, y) in cell_map:
        if lid != "A" or ("N", x, y) not in cell_map:
            continue
        va, vb = _val(cell_map, ("A", x, y)), _val(cell_map, ("N", x, y))
        if va + vb != 0:
            expect[(x, y)] = (va - vb) / (va + vb)
    assert set(got) == set(expect)
    for k, v in expect.items():
        assert abs(got[k] - v) <= TOL
