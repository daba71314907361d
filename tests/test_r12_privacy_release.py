"""Round-12 known-answer certification: the release-shape privacy audits.

privacy_k_anonymity and privacy_l_diversity re-derived in pure pandas from
the raw customer parquet — independent floor/band arithmetic, groupby
class tables, threshold sweeps and gates rebuilt with zero shared code
(the mirrored-oracle blind spot this round's certification program
exists to close). Plus the structural properties a privacy auditor
relies on: monotonicity of the at-risk population in the threshold and
gate consistency with the minimum statistic.
"""

from __future__ import annotations

import math

import pandas as pd

from wri_data_processing_spark import registry

registry.load_all()

_K = (2, 5, 10, 25)
_L = (2, 5, 8, 12)


def _customer(sf_dir):
    return pd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_nationkey", "c_mktsegment", "c_acctbal"],
    )


class TestKAnonymity:
    def test_known_answer(self, spark, sf_dir):
        c = _customer(sf_dir)
        sizes = list(
            c.groupby(
                [
                    c["c_nationkey"],
                    c["c_mktsegment"],
                    c["c_acctbal"].map(lambda x: math.floor(x / 1000)),
                ]
            ).size()
        )
        total = sum(sizes)
        got = {
            r["k"]: r
            for r in registry.REGISTRY["privacy_k_anonymity"](spark, sf_dir).collect()
        }
        assert set(got) == set(_K)
        for k in _K:
            rows_below = sum(n for n in sizes if n < k)
            r = got[k]
            assert r["n_classes"] == len(sizes)
            assert r["min_class_size"] == min(sizes)
            assert r["classes_below_k"] == sum(1 for n in sizes if n < k)
            assert r["rows_below_k"] == rows_below
            # abs-diff tolerance, not exact ==: Python round() is banker's
            # rounding while Spark's F.round is HALF_UP — a tie at the 6th
            # decimal would fail an exact compare spuriously (ADVICE r12)
            assert abs(r["pct_rows_at_risk"] - rows_below / total) < 5e-7
            assert r["k_anonymous"] == (min(sizes) >= k)

    def test_at_risk_monotone_in_k(self, spark, sf_dir):
        rows = sorted(
            registry.REGISTRY["privacy_k_anonymity"](spark, sf_dir).collect(),
            key=lambda r: r["k"],
        )
        below = [r["rows_below_k"] for r in rows]
        assert below == sorted(below)
        # the fixture is NOT k-anonymous at any swept k (singleton classes
        # exist at every sf) — the gate must be a live decision, not a
        # vacuous constant
        assert not any(r["k_anonymous"] for r in rows)
        assert all(r["rows_below_k"] > 0 for r in rows)


class TestLDiversity:
    def test_known_answer(self, spark, sf_dir):
        c = _customer(sf_dir)
        g = c.groupby(
            [
                c["c_mktsegment"],
                c["c_acctbal"].map(lambda x: math.floor(x / 500)),
            ]
        )["c_nationkey"]
        classes = list(zip(g.size(), g.nunique()))
        total = sum(n for n, _ in classes)
        got = {
            r["l"]: r
            for r in registry.REGISTRY["privacy_l_diversity"](spark, sf_dir).collect()
        }
        assert set(got) == set(_L)
        for lv in _L:
            rows_below = sum(n for n, d in classes if d < lv)
            r = got[lv]
            assert r["n_classes"] == len(classes)
            assert r["min_diversity"] == min(d for _, d in classes)
            assert r["classes_below_l"] == sum(1 for _, d in classes if d < lv)
            assert r["rows_below_l"] == rows_below
            # abs-diff tolerance, not exact ==: Python round() is banker's
            # rounding while Spark's F.round is HALF_UP — a tie at the 6th
            # decimal would fail an exact compare spuriously (ADVICE r12)
            assert abs(r["pct_rows_at_risk"] - rows_below / total) < 5e-7
            assert r["l_diverse"] == (min(d for _, d in classes) >= lv)

    def test_gate_consistency(self, spark, sf_dir):
        rows = sorted(
            registry.REGISTRY["privacy_l_diversity"](spark, sf_dir).collect(),
            key=lambda r: r["l"],
        )
        below = [r["rows_below_l"] for r in rows]
        assert below == sorted(below)
        for r in rows:
            assert r["l_diverse"] == (r["min_diversity"] >= r["l"])
            assert (r["classes_below_l"] == 0) == (r["rows_below_l"] == 0)
