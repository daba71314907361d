"""Known-answer tests: statistic-level correctness vs independent numpy.

ADVICE r10 (high) found stats_jarque_bera / stats_skewness_kurtosis carried
algebraically wrong sqrt(n)/n factors that the mirrored DuckDB oracle could
not catch (both sides computed the same wrong tree). These tests break that
symmetry: numpy computes the population skewness g1 = M3n/M2n^1.5 and excess
kurtosis g2 = M4n/M2n^2 - 3 (Mkn = mean((x-mean)^k)) DIRECTLY from the raw
parquet values, with no shared code path with the engine.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from wri_data_processing_spark import registry

registry.load_all()


def _numpy_shape_stats(sf_dir: str) -> pd.DataFrame:
    ev = pd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "value"])
    ev = ev[ev["value"].notna()]
    # mirror the engine's exact centi-unit quantization so the comparison
    # is about the MOMENT ALGEBRA, not float parsing of the raw column
    ci = (ev["value"].astype("float64").round(2) * 100).round().astype("int64")
    out = []
    for etype, grp in ci.groupby(ev["event_type"]):
        x = grp.to_numpy(dtype="float64")
        d = x - x.mean()
        m2n = np.mean(d**2)
        g1 = np.mean(d**3) / m2n**1.5
        g2 = np.mean(d**4) / m2n**2 - 3.0
        n = float(len(x))
        jb = n * (g1**2 / 6.0 + g2**2 / 24.0)
        out.append((etype, int(n), g1, g2, jb))
    return pd.DataFrame(
        out, columns=["event_type", "n", "skewness", "kurtosis_excess", "jb"]
    ).sort_values("event_type").reset_index(drop=True)


def test_skewness_kurtosis_matches_numpy(spark, sf_dir):
    got = (
        registry.REGISTRY["stats_skewness_kurtosis"](spark, sf_dir)
        .toPandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    want = _numpy_shape_stats(sf_dir)
    assert list(got["event_type"]) == list(want["event_type"])
    assert list(got["n"]) == list(want["n"])
    np.testing.assert_allclose(got["skewness"], want["skewness"], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        got["kurtosis_excess"], want["kurtosis_excess"], rtol=1e-5, atol=1e-5
    )


def test_jarque_bera_matches_numpy(spark, sf_dir):
    got = (
        registry.REGISTRY["stats_jarque_bera"](spark, sf_dir)
        .toPandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    want = _numpy_shape_stats(sf_dir)
    assert list(got["event_type"]) == list(want["event_type"])
    # engine snaps S and K to 1e-6 before composing JB (cross-engine ULP
    # discipline); at n~1e4 that moves JB by at most ~n*|K|*1e-6/6 — allow it
    n = want["n"].to_numpy(dtype="float64")
    slack = n * (np.abs(want["skewness"]) + np.abs(want["kurtosis_excess"])) * 1e-6
    assert np.all(np.abs(got["jb"].to_numpy() - want["jb"].to_numpy()) <= slack + 1e-4)
    # the chi2(2) gate must now be a REAL decision, not vacuously true:
    # recompute it from the numpy JB and require agreement
    assert list(got["normal_rejected"]) == [bool(v > 5.991465) for v in want["jb"]]


def test_jarque_bera_gate_not_vacuous_on_normal_data(spark):
    """A near-normal sample must NOT reject: the pre-fix JB (inflated ~n^2)
    rejected everything, making the gate meaningless. Deterministic
    normal-ish sample via the inverse-CDF-free sum-of-uniforms (Irwin-Hall;
    48 uniforms keeps excess kurtosis at -6/(5*48) = -0.0125, invisible to
    JB at n=20000 — 12 uniforms' -0.1 is NOT, probed), pinned seed."""
    rng = np.random.default_rng(7)  # fixture-only RNG, pinned seed
    x = (rng.random((20000, 48)).sum(axis=1) - 24.0) * 5.0 + 100.0
    ci = np.round(np.round(x, 2) * 100).astype("int64").astype("float64")
    d = ci - ci.mean()
    m2n = np.mean(d**2)
    g1 = np.mean(d**3) / m2n**1.5
    g2 = np.mean(d**4) / m2n**2 - 3.0
    jb = ci.size * (g1**2 / 6.0 + g2**2 / 24.0)
    assert jb < 5.991465  # sanity: the reference computation accepts
    # and the engine tree, run over the same values, agrees
    pdf = pd.DataFrame({"event_type": "x", "value": np.round(x, 2)})
    sdf = spark.createDataFrame(pdf)
    from pyspark.sql import functions as F

    cic = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    g = sdf.select("event_type", cic.alias("ci")).groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("ci").cast("long").alias("s1"),
        F.sum(F.col("ci") * F.col("ci")).cast("long").alias("s2"),
        F.sum(F.col("ci").cast("decimal(38,0)") * F.col("ci") * F.col("ci")).alias("s3"),
        F.sum(
            F.col("ci").cast("decimal(38,0)") * F.col("ci") * F.col("ci") * F.col("ci")
        ).alias("s4"),
    )
    nd = F.col("n").cast("double")
    d1, d2_, d3, d4 = (F.col(c).cast("double") for c in ("s1", "s2", "s3", "s4"))
    m2 = nd * d2_ - d1 * d1
    m3 = nd * nd * d3 - F.lit(3.0) * nd * d1 * d2_ + F.lit(2.0) * d1 * d1 * d1
    m4 = (
        nd * nd * nd * d4
        - F.lit(4.0) * nd * nd * d1 * d3
        + F.lit(6.0) * nd * d1 * d1 * d2_
        - F.lit(3.0) * d1 * d1 * d1 * d1
    )
    s = m3 / (m2 * F.sqrt(m2))
    k = m4 / (m2 * m2) - F.lit(3.0)
    row = g.select((nd * (s * s / F.lit(6.0) + k * k / F.lit(24.0))).alias("jb")).first()
    assert abs(row["jb"] - jb) < 1e-6 * max(1.0, jb)
    assert row["jb"] < 5.991465
