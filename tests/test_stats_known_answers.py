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


def _daily_frame(sf_dir):
    """(d -> (count, Decimal revenue)) — the _daily_traffic_revenue fixture
    re-derived independently (Decimal(18,6) quantization per value)."""
    from collections import defaultdict
    from decimal import Decimal

    ev = pd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "value"])
    ev["d"] = ev["ts"].dt.date
    cnt = defaultdict(int)
    rev = defaultdict(lambda: Decimal(0))
    for d, grp in ev.groupby("d"):
        cnt[d] = len(grp)
        for v in grp["value"]:
            if pd.notna(v):
                rev[d] += Decimal(repr(float(v))).quantize(Decimal("0.000001"))
    days = sorted(cnt)
    return [(cnt[d], rev[d]) for d in days]


class TestR10StatsAudit:
    """Non-mirrored known-answer audit of the r9/r10 pairwise-stats family
    (the Brunner-Munzel lesson applied retroactively: engine-oracle
    symmetry cannot catch shared-formula algebra errors)."""

    def test_kendall_tau_b(self, spark, sf_dir):
        import math

        daily = _daily_frame(sf_dir)
        n = len(daily)
        c = d = tx = ty = tb = 0
        for i in range(n):
            for j in range(i + 1, n):
                dx = (daily[i][0] > daily[j][0]) - (daily[i][0] < daily[j][0])
                dy = (daily[i][1] > daily[j][1]) - (daily[i][1] < daily[j][1])
                if dx == 0 and dy == 0:
                    tb += 1
                elif dx == 0:
                    tx += 1
                elif dy == 0:
                    ty += 1
                elif dx == dy:
                    c += 1
                else:
                    d += 1
        tau = (c - d) / math.sqrt((c + d + ty) * (c + d + tx))
        got = registry.REGISTRY["stats_kendall_tau"](spark, sf_dir).first()
        assert (got["concordant"], got["discordant"]) == (c, d)
        assert (got["tie_x"], got["tie_y"], got["tie_both"]) == (tx, ty, tb)
        assert abs(got["tau_b"] - tau) < 1e-6

    def test_ccc_lin(self, spark, sf_dir):
        daily = _daily_frame(sf_dir)
        x = np.array([t[0] for t in daily], dtype="float64")
        y = np.array([float(t[1]) for t in daily], dtype="float64")
        r = np.corrcoef(x, y)[0, 1]
        ccc = (
            2 * np.cov(x, y, ddof=0)[0, 1]
            / (x.var(ddof=0) + y.var(ddof=0) + (x.mean() - y.mean()) ** 2)
        )
        got = registry.REGISTRY["stats_ccc_lin"](spark, sf_dir).first()
        assert abs(got["pearson_r"] - r) < 1e-6
        assert abs(got["ccc"] - ccc) < 1e-6

    def test_mood_median(self, spark, sf_dir):
        ev = pd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "value"])
        ev = ev[ev["event_type"].isin(["purchase", "click"]) & ev["value"].notna()]
        ci = (ev["value"].astype("float64").round(2) * 100).round().astype("int64")
        pooled = np.sort(ci.to_numpy())
        med = pooled[(len(pooled) + 1) // 2 - 1]  # lower median, exact rank
        a = ci[ev["event_type"] == "purchase"].to_numpy()
        b = ci[ev["event_type"] == "click"].to_numpy()
        cells = [
            (a > med).sum(), (a <= med).sum(), (b > med).sum(), (b <= med).sum()
        ]
        got = registry.REGISTRY["stats_mood_median"](spark, sf_dir).first()
        assert abs(got["pooled_median"] * 100 - med) < 0.5
        assert [got["a_above"], got["a_below"], got["b_above"], got["b_below"]] == [
            int(v) for v in cells
        ]
        aab, abl, bab, bbl = (float(v) for v in cells)
        n = aab + abl + bab + bbl
        chi2 = 0.0
        for obs, rtot, ctot in [
            (aab, aab + abl, aab + bab),
            (abl, aab + abl, abl + bbl),
            (bab, bab + bbl, aab + bab),
            (bbl, bab + bbl, abl + bbl),
        ]:
            e = rtot * ctot / n
            chi2 += (obs - e) ** 2 / e
        assert abs(got["chi2"] - chi2) < 1e-5
        assert got["medians_differ"] == (chi2 > 3.841459)

    def test_hodges_lehmann(self, spark, sf_dir):
        ev = pd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "event_type"])
        ev["d"] = ev["ts"].dt.date
        a = ev[ev["event_type"] == "purchase"].groupby("d").size().to_numpy()
        b = ev[ev["event_type"] == "click"].groupby("d").size().to_numpy()
        diffs = np.sort((a[:, None] - b[None, :]).ravel())
        m = len(diffs)
        hl = (
            float(diffs[m // 2])
            if m % 2
            else (float(diffs[m // 2 - 1]) + float(diffs[m // 2])) / 2.0
        )
        got = registry.REGISTRY["stats_hodges_lehmann"](spark, sf_dir).first()
        assert got["n_pairs"] == m
        assert abs(got["hl_shift"] - hl) < 1e-9

    def test_cronbach_alpha(self, spark, sf_dir):
        ev = pd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "user_id"])
        d0 = ev["ts"].dt.date.min()
        ev["w"] = ev["ts"].dt.date.map(lambda d: (d - d0).days // 7)
        ev = ev[ev["w"] <= 3]
        mat = (
            ev.groupby(["user_id", "w"]).size().unstack(fill_value=0)
            .reindex(columns=[0, 1, 2, 3], fill_value=0)
        )
        k = 4
        item_vars = mat.var(axis=0, ddof=0).sum()
        total_var = mat.sum(axis=1).var(ddof=0)
        alpha = k / (k - 1) * (1 - item_vars / total_var)
        got = registry.REGISTRY["stats_cronbach_alpha"](spark, sf_dir).first()
        assert got["n_users"] == len(mat) and got["k_items"] == k
        assert abs(got["alpha"] - alpha) < 1e-6

    def test_mann_kendall(self, spark, sf_dir):
        import math
        from collections import Counter

        ev = pd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])
        x = ev.groupby(ev["ts"].dt.date).size().sort_index().to_numpy()
        n = len(x)
        s = sum(
            int(np.sign(x[j] - x[i])) for i in range(n) for j in range(i + 1, n)
        )
        ties = Counter(x)
        v18 = n * (n - 1) * (2 * n + 5) - sum(
            t * (t - 1) * (2 * t + 5) for t in ties.values()
        )
        v = v18 / 18.0
        z = (s - 1) / math.sqrt(v) if s > 0 else ((s + 1) / math.sqrt(v) if s < 0 else 0.0)
        got = registry.REGISTRY["stats_mann_kendall"](spark, sf_dir).first()
        assert got["mk_s"] == s and got["n_days"] == n
        assert abs(got["z"] - z) < 1e-6

    def test_theil_sen(self, spark, sf_dir):
        ev = pd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "event_type"])
        ev["d"] = ev["ts"].dt.date
        got = {
            r["event_type"]: r
            for r in registry.REGISTRY["stats_theil_sen"](spark, sf_dir).collect()
        }
        for et, grp in ev.groupby("event_type"):
            counts = grp.groupby("d").size().sort_index()
            days = [(d - counts.index[0]).days for d in counts.index]
            x = counts.to_numpy(dtype="float64")
            slopes = sorted(
                (x[j] - x[i]) / (days[j] - days[i])
                for i in range(len(x))
                for j in range(i + 1, len(x))
            )
            m = len(slopes)
            med = slopes[m // 2] if m % 2 else (slopes[m // 2 - 1] + slopes[m // 2]) / 2
            assert got[et]["n_pairs"] == m, et
            assert abs(got[et]["slope"] - med) < 1e-9, et


class TestEvalMetricsAudit:
    """Same non-mirrored audit for the r10 eval family: the sha-uniform
    stand-in score is recomputed with hashlib and the metrics with plain
    Python/numpy."""

    def _scores(self, sf_dir):
        import hashlib

        ev = pd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "event_type"])
        u = np.array(
            [
                int(hashlib.sha256(f"cal:{e}".encode()).hexdigest()[:15], 16)
                % (1 << 30)
                for e in ev["event_id"]
            ],
            dtype="int64",
        )
        y = (ev["event_type"] == "purchase").to_numpy(dtype="int64")
        return u, y

    def test_brier(self, spark, sf_dir):
        u, y = self._scores(sf_dir)
        p = u / float(1 << 30)
        bs = float(np.mean((p - y) ** 2))
        rate = y.mean()
        ref = rate * (1 - rate)
        got = registry.REGISTRY["eval_brier_score"](spark, sf_dir).first()
        assert got["n"] == len(y) and got["npos"] == int(y.sum())
        assert abs(got["brier"] - bs) < 1e-6
        assert abs(got["brier_ref"] - ref) < 1e-6
        assert abs(got["brier_skill"] - (1 - bs / ref)) < 1e-5

    def test_log_loss(self, spark, sf_dir):
        u, y = self._scores(sf_dir)
        p = (u + 1) / float((1 << 30) + 2)
        loss = -np.log(np.where(y == 1, p, 1 - p))
        got = registry.REGISTRY["eval_log_loss"](spark, sf_dir).first()
        assert got["n"] == len(y)
        # engine floor-scales per row to 1e-12 before the mean: slack 1e-6
        assert abs(got["log_loss"] - float(loss.mean())) < 1e-6

    def test_ece(self, spark, sf_dir):
        u, y = self._scores(sf_dir)
        bins = (u * 10) // (1 << 30)
        gap = 0
        n = len(y)
        used = 0
        for b in range(10):
            m = bins == b
            if m.any():
                used += 1
                gap += abs(int(y[m].sum()) * (1 << 30) - int(u[m].sum()))
        got = registry.REGISTRY["eval_ece"](spark, sf_dir).first()
        assert got["n"] == n and got["n_bins"] == used
        assert abs(got["ece"] - gap / (n * float(1 << 30))) < 1e-6

    def test_average_precision(self, spark, sf_dir):
        u, y = self._scores(sf_dir)
        npos = int(y.sum())
        order = np.argsort(-u, kind="mergesort")
        us, ys = u[order], y[order]
        # pessimistic tie convention: whole distinct-score block enters
        # before precision is read
        ap = 0.0
        k = tp = 0
        i = 0
        n = len(us)
        while i < n:
            j = i
            while j + 1 < n and us[j + 1] == us[i]:
                j += 1
            blk_tp = int(ys[i : j + 1].sum())
            k += j - i + 1
            tp += blk_tp
            if blk_tp:
                # engine truncates each block term to 1e-12 (integral div)
                ap += (blk_tp * tp * 10**12) // (k * npos) / 1e12
            i = j + 1
        got = registry.REGISTRY["eval_average_precision"](spark, sf_dir).first()
        assert got["n"] == n and got["npos"] == npos
        assert abs(got["average_precision"] - ap) < 1e-6


class TestR9AgreementAudit:
    """Non-mirrored audit of the r9 agreement/association ops."""

    def test_mcnemar(self, spark, sf_dir):
        ev = pd.read_parquet(
            f"{sf_dir}/events.parquet", columns=["ts", "user_id", "event_type"]
        )
        ev["d"] = ev["ts"].dt.date
        ev["am"] = (ev["event_type"] == "purchase") & (ev["ts"].dt.hour < 12)
        ev["pm"] = (ev["event_type"] == "purchase") & (ev["ts"].dt.hour >= 12)
        g = ev.groupby(["user_id", "d"]).agg(am=("am", "max"), pm=("pm", "max"))
        n11 = int((g["am"] & g["pm"]).sum())
        n10 = int((g["am"] & ~g["pm"]).sum())
        n01 = int((~g["am"] & g["pm"]).sum())
        n00 = int((~g["am"] & ~g["pm"]).sum())
        chi2 = (n10 - n01) ** 2 / (n10 + n01)
        got = registry.REGISTRY["stats_mcnemar"](spark, sf_dir).first()
        assert (got["n11"], got["n10"], got["n01"], got["n00"]) == (n11, n10, n01, n00)
        assert got["n_pairs"] == len(g)
        assert abs(got["mcnemar_chi2"] - chi2) < 1e-5

    def test_cohens_kappa(self, spark, sf_dir):
        import hashlib

        docs = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"])
        ra = (docs["n_chars"] >= 400).to_numpy()
        u = np.array(
            [
                int(hashlib.sha256(f"kap:{d}".encode()).hexdigest()[:15], 16)
                % (1 << 30)
                for d in docs["doc_id"]
            ]
        )
        rb = np.where(u * 5 < (1 << 30), ~ra, ra)
        n = len(docs)
        n11 = int((ra & rb).sum()); n10 = int((ra & ~rb).sum())
        n01 = int((~ra & rb).sum()); n00 = int((~ra & ~rb).sum())
        po = (n11 + n00) / n
        pe = ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)) / n**2
        kappa = (po - pe) / (1 - pe)
        got = registry.REGISTRY["stats_cohens_kappa"](spark, sf_dir).first()
        assert (got["n11"], got["n10"], got["n01"], got["n00"]) == (n11, n10, n01, n00)
        assert abs(got["po"] - po) < 1e-6 and abs(got["pe"] - pe) < 1e-6
        assert abs(got["kappa"] - kappa) < 1e-5

    def test_mutual_info(self, spark, sf_dir):
        ev = pd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "event_type"])
        ev["tod"] = ev["ts"].dt.hour // 6
        cells = ev.groupby(["event_type", "tod"]).size()
        n = len(ev)
        r = cells.groupby(level=0).sum()
        c = cells.groupby(level=1).sum()
        mi = sum(
            (v / n) * np.log(v * n / (r[et] * c[tod]))
            for (et, tod), v in cells.items()
        )
        got = registry.REGISTRY["stats_mutual_info"](spark, sf_dir).first()
        assert got["n_cells"] == len(cells)
        assert abs(got["mi_nats"] - mi) < 1e-5

    def test_hhi(self, spark, sf_dir):
        import duckdb

        con = duckdb.connect()
        rows = con.execute(
            f"""
            SELECT r.r_name AS region, n.n_name AS nation,
                   SUM(CAST(o.o_totalprice AS DECIMAL(18,6))) AS rev
            FROM read_parquet('{sf_dir}/orders.parquet') o
            JOIN read_parquet('{sf_dir}/customer.parquet') c
              ON o.o_custkey = c.c_custkey
            JOIN read_parquet('{sf_dir}/nation.parquet') n
              ON c.c_nationkey = n.n_nationkey
            JOIN read_parquet('{sf_dir}/region.parquet') r
              ON n.n_regionkey = r.r_regionkey
            GROUP BY 1, 2
            """
        ).fetchall()
        from collections import defaultdict

        shares = defaultdict(list)
        for region, _, rev in rows:
            shares[region].append(int(rev * 1_000_000))
        got = {
            r["region"]: r
            for r in registry.REGISTRY["stats_hhi_concentration"](spark, sf_dir).collect()
        }
        assert set(got) == set(shares)
        for region, revs in shares.items():
            tot = sum(revs)
            hhi = sum(v * v for v in revs) / (tot * tot)
            g = got[region]
            assert g["n_nations"] == len(revs)
            assert abs(g["total_rev"] - tot / 1e6) < 0.01
            assert abs(g["hhi"] - hhi) < 1e-6, region


class TestR7DriftAudit:
    """Non-mirrored audit of the r7/r8 drift & rank-test ops."""

    def _vc(self, sf_dir):
        ev = pd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "value"])
        ev = ev[ev["event_type"].isin(["view", "click"]) & ev["value"].notna()]
        a = ev.loc[ev["event_type"] == "view", "value"].to_numpy()
        b = ev.loc[ev["event_type"] == "click", "value"].to_numpy()
        return a, b

    def test_ks(self, spark, sf_dir):
        a, b = self._vc(sf_dir)
        allv = np.unique(np.concatenate([a, b]))
        fa = np.searchsorted(np.sort(a), allv, side="right")
        fb = np.searchsorted(np.sort(b), allv, side="right")
        d_scaled = int(np.max(np.abs(len(b) * fa - len(a) * fb)))
        got = registry.REGISTRY["stats_ks_test"](spark, sf_dir).first()
        assert (got["n1"], got["n2"]) == (len(a), len(b))
        assert got["d_scaled"] == d_scaled
        assert abs(got["ks_d"] - d_scaled / (len(a) * len(b))) < 1e-12

    def test_psi(self, spark, sf_dir):
        a, b = self._vc(sf_dir)
        ba = np.minimum(np.floor(a / 10.0), 19).astype(int)
        bb = np.minimum(np.floor(b / 10.0), 19).astype(int)
        psi = 0.0
        used = skipped = 0
        for k in sorted(set(ba) | set(bb)):
            ca, cb = int((ba == k).sum()), int((bb == k).sum())
            if ca > 0 and cb > 0:
                used += 1
                p, q = ca / len(a), cb / len(b)
                psi += (p - q) * np.log(p / q)
            else:
                skipped += 1
        got = registry.REGISTRY["stats_psi"](spark, sf_dir).first()
        assert (got["n_bins_used"], got["n_bins_skipped"]) == (used, skipped)
        assert abs(got["psi"] - psi) < 1e-5

    def test_jsd(self, spark, sf_dir):
        ev = pd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "user_id"])
        ref = ev[ev["user_id"] % 2 == 0]["event_type"].value_counts()
        cur = ev[ev["user_id"] % 2 == 1]["event_type"].value_counts()
        cats = sorted(set(ref.index) | set(cur.index))
        na, nb = ref.sum(), cur.sum()
        jsd = 0.0
        for c in cats:
            p = ref.get(c, 0) / na
            q = cur.get(c, 0) / nb
            if p > 0:
                jsd += 0.5 * p * np.log(2 * p / (p + q))
            if q > 0:
                jsd += 0.5 * q * np.log(2 * q / (p + q))
        got = registry.REGISTRY["stats_jensen_shannon"](spark, sf_dir).first()
        assert (got["n_ref"], got["n_cur"], got["k_cats"]) == (na, nb, len(cats))
        assert abs(got["jsd"] - jsd) < 1e-5

    def test_mann_whitney(self, spark, sf_dir):
        import math
        from collections import Counter

        a, b = self._vc(sf_dir)
        n1, n2 = len(a), len(b)

        def midrank(x):
            order = np.argsort(x, kind="mergesort")
            ranks = np.empty(len(x))
            sx = x[order]
            i = 0
            while i < len(sx):
                j = i
                while j + 1 < len(sx) and sx[j + 1] == sx[i]:
                    j += 1
                ranks[order[i : j + 1]] = (i + j) / 2.0 + 1.0
                i = j + 1
            return ranks

        r = midrank(np.concatenate([a, b]))
        r1 = float(r[:n1].sum())
        u1 = r1 - n1 * (n1 + 1) / 2.0
        u2 = n1 * n2 - u1
        ties = Counter(np.concatenate([a, b]).tolist())
        tie3 = sum(t**3 - t for t in ties.values())
        n = n1 + n2
        var = n1 * n2 / 12.0 * ((n + 1) - tie3 / (n * (n - 1)))
        mu = n1 * n2 / 2.0
        # the op's stated convention: asymptotic z WITHOUT the 0.5
        # continuity correction (scipy defaults to use_continuity=True;
        # this audit verified the difference is exactly the 0.5 shift)
        z = (u1 - mu) / math.sqrt(var)
        got = registry.REGISTRY["stats_mann_whitney"](spark, sf_dir).first()
        assert (got["n1"], got["n2"]) == (n1, n2)
        assert got["u1_x2"] == round(2 * u1) and got["u2_x2"] == round(2 * u2)
        assert abs(got["z"] - z) < 1e-5

    def test_spearman(self, spark, sf_dir):
        li = pd.read_parquet(
            f"{sf_dir}/lineitem.parquet", columns=["l_quantity", "l_extendedprice"]
        )
        x = li["l_quantity"].to_numpy()
        y = li["l_extendedprice"].to_numpy()

        def midrank(v):
            order = np.argsort(v, kind="mergesort")
            ranks = np.empty(len(v))
            sv = v[order]
            i = 0
            while i < len(sv):
                j = i
                while j + 1 < len(sv) and sv[j + 1] == sv[i]:
                    j += 1
                ranks[order[i : j + 1]] = (i + j) / 2.0 + 1.0
                i = j + 1
            return ranks

        rx, ry = midrank(x), midrank(y)
        rho = np.corrcoef(rx, ry)[0, 1]
        got = registry.REGISTRY["stats_spearman"](spark, sf_dir).first()
        assert got["n"] == len(x)
        assert abs(got["rho"] - rho) < 5e-7  # rho emitted ROUND-6 since r13


class TestR8TestsAudit:
    """Non-mirrored audit of the r8 classical-test ops."""

    def test_anova_oneway(self, spark, sf_dir):
        ev = pd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "value"])
        ev = ev[ev["value"].notna()]
        groups = [g["value"].to_numpy("float64") for _, g in ev.groupby("event_type")]
        k = len(groups)
        n = sum(len(g) for g in groups)
        grand = np.concatenate(groups).mean()
        ssb = sum(len(g) * (g.mean() - grand) ** 2 for g in groups)
        ssw = sum(((g - g.mean()) ** 2).sum() for g in groups)
        f = (ssb / (k - 1)) / (ssw / (n - k))
        got = registry.REGISTRY["stats_anova_oneway"](spark, sf_dir).first()
        assert (got["k"], got["n_tot"]) == (k, n)
        assert abs(got["ss_between"] - ssb) < 1e-3
        assert abs(got["ss_within"] - ssw) < 1e-2
        assert abs(got["f_stat"] - f) < 1e-5

    def test_levene_bf(self, spark, sf_dir):
        ev = pd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "value"])
        ev = ev[ev["value"].notna()]
        zs = []
        for _, g in ev.groupby("event_type"):
            v = np.sort(g["value"].to_numpy("float64"))
            med = v[int(np.ceil(len(v) / 2)) - 1]  # exact lower median rank
            zs.append(np.abs(g["value"].to_numpy("float64") - med))
        k = len(zs)
        n = sum(len(z) for z in zs)
        grand = np.concatenate(zs).mean()
        ssb = sum(len(z) * (z.mean() - grand) ** 2 for z in zs)
        ssw = sum(((z - z.mean()) ** 2).sum() for z in zs)
        w = (ssb / (k - 1)) / (ssw / (n - k))
        got = registry.REGISTRY["stats_levene_bf"](spark, sf_dir).first()
        assert (got["k"], got["n_tot"]) == (k, n)
        assert abs(got["w_stat"] - w) < 1e-5

    def test_welch_ttest(self, spark, sf_dir):
        ev = pd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "value"])
        a = ev[ev["event_type"] == "purchase"]["value"].dropna().to_numpy("float64")
        b = ev[ev["event_type"] == "view"]["value"].dropna().to_numpy("float64")
        got = registry.REGISTRY["stats_welch_ttest"](spark, sf_dir).first()
        # probe whether NULLs are dropped before counting: engine n1=202
        # equals the non-null purchase count
        assert (got["n1"], got["n2"]) == (len(a), len(b))
        va, vb = a.var(ddof=1), b.var(ddof=1)
        se2 = va / len(a) + vb / len(b)
        t = (a.mean() - b.mean()) / np.sqrt(se2)
        df = se2**2 / (
            (va / len(a)) ** 2 / (len(a) - 1) + (vb / len(b)) ** 2 / (len(b) - 1)
        )
        assert abs(got["mean_diff"] - (a.mean() - b.mean())) < 1e-6
        assert abs(got["t_stat"] - t) < 1e-6
        assert abs(got["welch_df"] - df) < 1e-3

    def test_chi2_and_cramers_v(self, spark, sf_dir):
        ev = pd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "user_id"])
        tab = ev.groupby(["event_type", ev["user_id"] % 4]).size()
        n = len(ev)
        rt = tab.groupby(level=0).sum()
        ct = tab.groupby(level=1).sum()
        chi2 = sum(
            (v - rt[a] * ct[b] / n) ** 2 / (rt[a] * ct[b] / n)
            for (a, b), v in tab.items()
        )
        got = registry.REGISTRY["stats_chi2_independence"](spark, sf_dir).first()
        assert got["n_cells"] == len(tab)
        assert got["dof"] == (len(rt) - 1) * (len(ct) - 1)
        assert abs(got["chi2"] - chi2) < 1e-4

        docs = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang", "source"])
        tab2 = docs.groupby(["lang", "source"]).size()
        n2 = len(docs)
        rt2 = tab2.groupby(level=0).sum()
        ct2 = tab2.groupby(level=1).sum()
        chi2b = 0.0
        for a in rt2.index:
            for b in ct2.index:
                e = rt2[a] * ct2[b] / n2
                o = tab2.get((a, b), 0)
                chi2b += (o - e) ** 2 / e
        dof = (len(rt2) - 1) * (len(ct2) - 1)
        v = np.sqrt(chi2b / (n2 * min(len(rt2) - 1, len(ct2) - 1)))
        gv = registry.REGISTRY["stats_cramers_v"](spark, sf_dir).first()
        assert (gv["n"], gv["n_langs"], gv["n_sources"], gv["dof"]) == (
            n2, len(rt2), len(ct2), dof
        )
        # note: engine counts only OBSERVED cells in n_cells but chi2 must
        # still include the zero-cell expected terms IF it matches chi2b;
        # if it matches the observed-only sum instead, that is a finding
        chi2_obs_only = sum(
            (v2 - rt2[a] * ct2[b] / n2) ** 2 / (rt2[a] * ct2[b] / n2)
            for (a, b), v2 in tab2.items()
        )
        assert (
            abs(gv["chi2"] - chi2b) < 1e-4 or abs(gv["chi2"] - chi2_obs_only) < 1e-4
        )
        full = abs(gv["chi2"] - chi2b) < 1e-4
        assert full, (
            f"cramers_v chi2 sums OBSERVED cells only ({gv['chi2']} vs full "
            f"{chi2b:.5f}, observed-only {chi2_obs_only:.5f}) — zero cells "
            "contribute expected^2/expected = expected, so dropping them "
            "understates chi2"
        )

    def test_linear_regression(self, spark, sf_dir):
        ev = pd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"])
        ev = ev[ev["value"].notna()]
        ev["x"] = ev["ts"].dt.date.map(lambda d: (d - pd.Timestamp("1970-01-01").date()).days)
        got = {
            r["event_type"]: r
            for r in registry.REGISTRY["stats_linear_regression"](spark, sf_dir).collect()
        }
        for et, g in ev.groupby("event_type"):
            x = g["x"].to_numpy("float64")
            y = g["value"].to_numpy("float64")
            slope, intercept = np.polyfit(x, y, 1)
            yhat = slope * x + intercept
            ssr = ((y - yhat) ** 2).sum()
            sst = ((y - y.mean()) ** 2).sum()
            r2 = 1 - ssr / sst
            row = got[et]
            assert row["n"] == len(x)
            assert abs(row["slope"] - slope) < 1e-5, et
            assert abs(row["intercept"] - intercept) < 1e-2, et
            assert abs(row["r2"] - r2) < 1e-5, et


    def test_runs_test(self, spark, sf_dir):
        import math

        ev = pd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "event_type"])
        ev["d"] = ev["ts"].dt.date
        got = {
            r["event_type"]: r
            for r in registry.REGISTRY["stats_runs_test"](spark, sf_dir).collect()
        }
        for et, g in ev.groupby("event_type"):
            counts = g.groupby("d").size().sort_index().to_numpy()
            dirs = [
                counts[i] > counts[i - 1]
                for i in range(1, len(counts))
                if counts[i] != counts[i - 1]
            ]
            n_up = sum(dirs)
            n_down = len(dirs) - n_up
            runs = 1 + sum(1 for i in range(1, len(dirs)) if dirs[i] != dirs[i - 1])
            n1, n2 = n_up, n_down
            mu = 2 * n1 * n2 / (n1 + n2) + 1
            var = (
                2 * n1 * n2 * (2 * n1 * n2 - n1 - n2)
                / ((n1 + n2) ** 2 * (n1 + n2 - 1))
            )
            z = (runs - mu) / math.sqrt(var)
            row = got[et]
            assert (row["n_up"], row["n_down"], row["n_runs"]) == (n_up, n_down, runs), et
            assert abs(row["z"] - z) < 1e-6, et


    def test_wilson_ci(self, spark, sf_dir):
        import math

        ev = pd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type"])
        n = len(ev)
        x = int((ev["event_type"] == "purchase").sum())
        p = x / n
        z = 1.959964
        denom = 1 + z * z / n
        center = p + z * z / (2 * n)
        half = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n))
        got = registry.REGISTRY["stats_wilson_ci"](spark, sf_dir).first()
        assert (got["n"], got["x"]) == (n, x)
        assert abs(got["wilson_lo95"] - (center - half) / denom) < 1e-6
        assert abs(got["wilson_hi95"] - (center + half) / denom) < 1e-6
        assert abs(got["wald_lo95"] - (p - z * math.sqrt(p * (1 - p) / n))) < 1e-6

    def test_macro_f1(self, spark, sf_dir):
        # Independent recompute STRAIGHT FROM RAW PARQUET (r12, ADVICE
        # fix): re-derives the marker-word prediction in pure Python
        # (padded non-overlapping substring counts — the exact semantics
        # of both engines' replace-length trick), then scores per-class
        # F1 on the sklearn FULL-UNION class axis (labeled ∪ predicted;
        # support-0 classes keep F1=0 and their fp in the micro totals).
        # Zero shared code with eval_metrics.py / eval_classifier_report.
        from collections import Counter

        markers = {
            "en": ["the", "and", "with"],
            "es": ["el", "la", "con"],
            "fr": ["le", "la", "avec"],
            "de": ["der", "und", "mit"],
        }

        def predict(text):
            padded = f" {text} "
            score = {
                lang: sum(padded.count(f" {w} ") for w in ws)
                for lang, ws in markers.items()
            }
            if score["en"] >= max(score["es"], score["fr"], score["de"]) and score["en"] > 0:
                return "en"
            if score["es"] >= max(score["fr"], score["de"]) and score["es"] > 0:
                return "es"
            if score["fr"] >= score["de"] and score["fr"] > 0:
                return "fr"
            if score["de"] > 0:
                return "de"
            return "unknown"

        docs = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang", "text"])
        support = Counter(docs["lang"])
        preds = [predict(t) for t in docs["text"]]
        pred_total = Counter(preds)
        tp_c = Counter(
            lab for lab, pred in zip(docs["lang"], preds) if lab == pred
        )
        classes = sorted(set(support) | set(pred_total))
        f1s, wsum = [], 0.0
        tp = fp = fn = 0
        for c in classes:
            c_tp = tp_c.get(c, 0)
            c_fp = pred_total.get(c, 0) - c_tp
            c_fn = support.get(c, 0) - c_tp
            denom = 2 * c_tp + c_fp + c_fn
            c_f1 = 2 * c_tp / denom if denom > 0 else 0.0
            f1s.append(c_f1)
            wsum += support.get(c, 0) * c_f1
            tp += c_tp; fp += c_fp; fn += c_fn
        n = len(docs)
        accuracy = sum(tp_c.values()) / n
        got = registry.REGISTRY["eval_macro_f1"](spark, sf_dir).first()
        assert got["n_classes"] == len(classes) and got["n_docs"] == n
        assert abs(got["macro_f1"] - sum(f1s) / len(f1s)) < 1e-6
        assert abs(got["micro_f1"] - 2 * tp / (2 * tp + fp + fn)) < 1e-6
        # the identity the union axis restores (single-label): micro == accuracy
        assert abs(got["micro_f1"] - accuracy) < 1e-6
        assert abs(got["weighted_f1"] - wsum / n) < 1e-6
