"""Negative self-tests for experiments/full_sweep.py — the committed
SWEEP_r{N}.json artifacts are only evidence if the harness visibly fails on
a wrong oracle, records a crash as an error row (not a dead sweep), and
respects the --only scope filter. Same discipline as the degeneracy and
boolean gates' non-vacuous proofs."""

from __future__ import annotations

from pyspark.sql import functions as F

from experiments.full_sweep import sweep_sf
from wri_data_processing_spark import registry

registry.load_all()

_FAKES = {
    "zz_selftest_pass": (
        lambda spark, sf: spark.range(3).select(F.col("id").cast("long").alias("id")),
        "SELECT * FROM (VALUES (0), (1), (2)) t(id)",
    ),
    "zz_selftest_fail": (
        lambda spark, sf: spark.range(3).select(F.col("id").cast("long").alias("id")),
        "SELECT * FROM (VALUES (0), (1), (7)) t(id)",
    ),
    "zz_selftest_error": (
        lambda spark, sf: (_ for _ in ()).throw(RuntimeError("boom")),
        "SELECT 1 AS id",
    ),
    "zz_selftest_rows_only": (
        lambda spark, sf: spark.range(2),
        None,
    ),
}


def test_sweep_classifies_pass_fail_error_rows(spark, sf_dir):
    added = []
    try:
        for name, (fn, sql) in _FAKES.items():
            registry.REGISTRY[name] = fn
            if sql is not None:
                registry.ORACLE[name] = sql
            added.append(name)
        out = sweep_sf(spark, sf_dir, only=("zz_selftest_",))
        assert set(out) == set(_FAKES)
        assert out["zz_selftest_pass"]["status"] == "pass"
        assert out["zz_selftest_fail"]["status"] == "fail"
        assert out["zz_selftest_fail"]["problems"], "fail row must carry evidence"
        assert out["zz_selftest_error"]["status"] == "error"
        assert "boom" in out["zz_selftest_error"]["error"]
        assert out["zz_selftest_rows_only"]["status"] == "rows_only"
        assert out["zz_selftest_rows_only"]["rows"] == 2
    finally:
        for name in added:
            registry.REGISTRY.pop(name, None)
            registry.ORACLE.pop(name, None)


def test_only_filter_scopes_the_sweep(spark, sf_dir):
    out = sweep_sf(spark, sf_dir, only=("q6_",))
    assert set(out) == {"q6_forecast_revenue"}
    assert out["q6_forecast_revenue"]["status"] == "pass"
