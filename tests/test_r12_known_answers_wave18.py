"""Round-12 known-answer certification, wave 18: the reference-derived
scalar classification functions replayed from the DOCUMENTED utils.R
rules (classification priority, domain resolution order, the no_mask
naming quirk, relative-tolerance equality) — not from either engine's
regex spelling.

The synthetic path fixture is restated here verbatim (it is part of the
op contract: every branch of the reference logic is exercised by some
doc_id residue class)."""

from __future__ import annotations

import re
from collections import Counter

import pandas as pd

from wri_data_processing_spark import registry

registry.load_all()

_DOMAIN_DIRS = [
    "air_quality",
    "biodiversity",
    "carbon",
    "communities",
    "infrastructure",
    "livelihoods",
    "natural_habitats",
    "sense_of_place",
    "sensitivity_analysis",
    "species",
    "water",
]


def _path(i: int) -> str:
    return [
        f"data/livelihoods/indicators/ind_{i}_resistance_x.tif",
        f"data/water/indicators/ind_{i}_recovery_x.tif",
        f"data/species/indicators_no_mask/ind_{i}_status_x.tif",
        f"data/archive/old_{i}.tif",
        f"data/air_quality/agg_{i}_domain_score.tif",
        f"data/communities/agg_{i}_resilience.tif",
        f"out/run{i}/WRI_score.tif",
        f"data/retro_2005/ind_{i}.tif",
        f"data/misc/natural_habitats_{i}_status.tif",
        f"data/carbon/indicators/ind_{i}.tif",
    ][i % 10]


def _classify(path: str) -> str:
    if re.search(r"/retro_|/archive/|/final_checks/", path):
        return "exclude"
    if "/indicators/" in path:
        return "indicator"
    if re.search(r"WRI_score\.tif$", path):
        return "final_score"
    if re.search(r"_(domain_score|resilience|resistance|status)\.tif$", path):
        return "aggregate"
    return "exclude"


def _basename(path: str) -> str:
    return path.rsplit("/", 1)[-1]


def _stem(path: str) -> str:
    return re.sub(r"\.[^./]*$", "", _basename(path))


def _domain(path: str) -> str:
    parts = path.split("/")
    if "indicators" in parts and parts.index("indicators") > 0:
        return parts[parts.index("indicators") - 1]
    for d in _DOMAIN_DIRS:  # priority = list order (utils.R:116-120)
        if d in parts:
            return d
    fname = _basename(path)
    for d in _DOMAIN_DIRS:
        if d in fname:
            return d
    return "unknown"


def _dimension(data_type: str, fname: str):
    if data_type == "indicator":
        for tok in ("resistance", "recovery", "status"):
            if f"_{tok}_" in fname:
                return tok
        return None
    if data_type == "aggregate":
        for tok in ("domain_score", "resilience", "resistance", "status"):
            if tok in fname:
                return tok
        return None
    return None


def _doc_ids(sf_dir):
    d = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    return [int(i) for i in d["doc_id"]]


class TestReferenceScalarFns:
    def test_classify_data_type(self, spark, sf_dir):
        got = {
            r["doc_id"]: (r["path"], r["data_type"])
            for r in registry.REGISTRY["fn_classify_data_type"](spark, sf_dir).collect()
        }
        for i in _doc_ids(sf_dir):
            p = _path(i)
            assert got[i] == (p, _classify(p)), i
        # the fixture exercises every class
        assert {v[1] for v in got.values()} == {
            "exclude", "indicator", "final_score", "aggregate",
        }

    def test_extract_domain(self, spark, sf_dir):
        got = {
            r["doc_id"]: r["wri_domain"]
            for r in registry.REGISTRY["fn_extract_domain"](spark, sf_dir).collect()
        }
        for i in _doc_ids(sf_dir):
            assert got[i] == _domain(_path(i)), (i, _path(i))
        # fixture covers: dir-before-/indicators/, dir-in-parts,
        # filename-fallback, and unknown
        assert "unknown" in set(got.values())
        assert "natural_habitats" in set(got.values())  # filename fallback

    def test_classify_dimension(self, spark, sf_dir):
        got = {
            r["doc_id"]: (r["data_type"], r["wri_dimension"])
            for r in registry.REGISTRY["fn_classify_dimension"](spark, sf_dir).collect()
        }
        for i in _doc_ids(sf_dir):
            p = _path(i)
            dt = _classify(p)
            assert got[i] == (dt, _dimension(dt, _basename(p))), (i, p)

    def test_make_output_name(self, spark, sf_dir):
        got = {
            r["doc_id"]: r["cog_filename"]
            for r in registry.REGISTRY["fn_make_output_name"](spark, sf_dir).collect()
        }
        for i in _doc_ids(sf_dir):
            p = _path(i)
            suffix = "_no_mask.tif" if "/indicators_no_mask/" in p else ".tif"
            assert got[i] == _stem(p) + suffix, (i, p)
        assert any(v.endswith("_no_mask.tif") for v in got.values())

    def test_path_parts(self, spark, sf_dir):
        got = {
            r["doc_id"]: (r["filename"], r["stem"], r["dirname"])
            for r in registry.REGISTRY["fn_path_parts"](spark, sf_dir).collect()
        }
        for i in _doc_ids(sf_dir):
            p = f"data/src{i}/sub/file_{i}.tar.gz"
            # stem strips ONE extension: file.tar.gz -> file.tar
            assert got[i] == (f"file_{i}.tar.gz", f"file_{i}.tar", f"data/src{i}/sub")

    def test_near_tolerance(self, spark, sf_dir):
        li = pd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_quantity"])
        want = Counter()
        for q in li["l_quantity"]:
            # R all.equal semantics: RELATIVE tolerance vs the target
            tol = 1e-6 * max(abs(q), 1.0)
            want[
                (abs(q * 1.0000005 - q) <= tol, abs(q * 1.01 - q) <= tol)
            ] += 1
        got = {
            (r["near_small"], r["near_big"]): r["n"]
            for r in registry.REGISTRY["fn_near_tolerance"](spark, sf_dir).collect()
        }
        assert got == dict(want)
        # the two scales sit on opposite sides of the tolerance: a live gate
        assert (True, False) in got
