"""Negative self-tests for experiments/degen_sweep.py — the committed
DEGEN_r{N}.json artifacts are only evidence if the harness visibly records
a vacuous fixture, an all-NULL column, an unlisted constant boolean, and a
crashing oracle, and if gate_violations() turns the gate-SF findings red.
Same discipline as test_full_sweep_harness.py."""

from __future__ import annotations

from experiments.degen_sweep import gate_violations, sweep_sf
from wri_data_processing_spark import registry

registry.load_all()

_FAKES = {
    "zz_degen_live": "SELECT 1 AS id, TRUE AS flag UNION ALL "
    "SELECT 2, FALSE",  # live rows, live boolean -> no findings
    "zz_degen_empty": "SELECT 1 AS id WHERE 1 = 0",
    "zz_degen_allnull": "SELECT 1 AS id, CAST(NULL AS DOUBLE) AS v",
    "zz_degen_constbool": "SELECT 1 AS id, TRUE AS dead_flag",
    "zz_degen_crash": "SELECT * FROM zz_no_such_table",
}


def test_sweep_records_each_failure_shape(sf_dir):
    saved = dict(registry.ORACLE)
    try:
        registry.ORACLE.clear()
        registry.ORACLE.update(_FAKES)
        rec = sweep_sf(sf_dir, spark=None)
    finally:
        registry.ORACLE.clear()
        registry.ORACLE.update(saved)

    assert "zz_degen_live" not in rec["degeneracy"]
    assert "zz_degen_live" not in rec["boolean_constants"]
    assert rec["degeneracy"]["zz_degen_empty"] == [
        "0 rows — vacuous fixture (0==0 hash-match)"
    ]
    assert any("100% NULL" in p for p in rec["degeneracy"]["zz_degen_allnull"])
    cb = rec["boolean_constants"]["zz_degen_constbool"]["dead_flag"]
    assert cb == {"value": True, "allowlisted": False, "expected": None}
    assert "zz_no_such_table" in rec["errors"]["zz_degen_crash"]

    viol = gate_violations(rec)
    assert any("zz_degen_empty" in v for v in viol)
    assert any("zz_degen_allnull" in v for v in viol)
    assert any("zz_degen_constbool.dead_flag" in v for v in viol)
    assert any("zz_degen_crash" in v for v in viol)
    assert not any("zz_degen_live" in v for v in viol)


def test_allowlisted_constant_is_not_a_violation():
    rec = {
        "degeneracy": {},
        "errors": {},
        "boolean_constants": {
            "drift_positive_control": {
                "drifted": {"value": True, "allowlisted": True, "expected": True}
            }
        },
    }
    assert gate_violations(rec) == []


def test_wrong_polarity_allowlisted_constant_is_a_violation():
    rec = {
        "degeneracy": {},
        "errors": {},
        "boolean_constants": {
            "drift_positive_control": {
                "drifted": {"value": False, "allowlisted": True, "expected": True}
            }
        },
    }
    viol = gate_violations(rec)
    assert len(viol) == 1 and "pins True" in viol[0]
