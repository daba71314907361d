"""Round-12 known-answer certification, wave 2: proactive widening.

Wave 1 (test_r12_known_answers.py) closed the nine mirrored-only ops the
r11 verdict named — and in DERIVING the Wilcoxon reference for this wave
the method caught its FOURTH real shared-formula bug: the signed-rank z
denominator carried a spurious extra factor 2 (2*sqrt(Var(W2+)) =
4*sigma(W+)), emitting exactly z/2; the mirrored oracle shared the error
so the correctness harness was structurally blind to it (engine -0.59636
vs textbook -1.19272 on the sf0.001 fixture; fixed engine+oracle
together in the same commit as this file).

This wave re-derives fifteen more formula-bearing statistics in pure
Python/numpy/pandas from raw parquet, zero shared code with the engine
or the oracle SQL: Kruskal-Wallis (tie-corrected H), Wilcoxon
signed-rank (post-fix), TOST equivalence, two-proportion z, the effect
size panel (Cohen d / Hedges g / Cliff delta by brute-force pairs),
Durbin-Watson (OLS residuals), multiclass MCC (Gorodkin R_K), pass@k
(falling-factorial estimator), Benford deviations, per-user Shannon
entropy top-100, burstiness (dispersion index + Goh-Barabasi B),
day-of-week eta-squared seasonality strength, Holt linear forecast,
the A/B sample-size planner, and the SRM chi-squared guard.
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

import numpy as np
import pandas as pd
import pytest

from wri_data_processing_spark import registry

registry.load_all()


def _round6(x: float) -> float:
    """Spark's double round: HALF_UP on the shortest decimal repr."""
    return float(Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP))


def _events(sf_dir, cols):
    return pd.read_parquet(f"{sf_dir}/events.parquet", columns=cols)


def _epoch_secs(ts: pd.Series) -> pd.Series:
    """Floored epoch seconds, independent of the parquet timestamp unit
    (pandas reads TIMESTAMP(NANOS) as datetime64[us] here — a bare
    .astype('int64') // 1e9 would be off by the unit factor)."""
    return (ts - pd.Timestamp(0)) // pd.Timedelta(seconds=1)


class TestRankFamilyWave2:
    def test_kruskal_wallis(self, spark, sf_dir):
        ev = _events(sf_dir, ["event_type", "value"])
        ev = ev[ev["value"].notna()]
        ranks = ev["value"].rank(method="average")
        n_tot = len(ev)
        k = ev["event_type"].nunique()
        s4 = 0.0
        for _, grp in ranks.groupby(ev["event_type"]):
            s4 += grp.sum() ** 2 / len(grp)
        h = 12.0 / (n_tot * (n_tot + 1)) * s4 - 3.0 * (n_tot + 1)
        tie3 = sum(t**3 - t for t in Counter(ev["value"]).values())
        c = 1.0 - tie3 / (n_tot**3 - n_tot)
        got = registry.REGISTRY["stats_kruskal_wallis"](spark, sf_dir).first()
        assert (got["k"], got["n_tot"]) == (k, n_tot)
        assert abs(got["h"] - h) < 1e-5
        assert abs(got["h_tie"] - h / c) < 1e-5

    def test_wilcoxon_signed_rank(self, spark, sf_dir):
        ev = _events(sf_dir, ["ts", "user_id", "value"])
        ev = ev[ev["value"].notna()]
        secs = _epoch_secs(ev["ts"])
        mid = int(secs.min()) + (int(secs.max()) - int(secs.min())) // 2

        def q6(v):
            return Decimal(repr(float(v))).quantize(
                Decimal("0.000001"), ROUND_HALF_UP
            )

        s1, s2 = {}, {}
        for uid, sec, v in zip(ev["user_id"], secs, ev["value"]):
            tgt = s1 if sec < mid else s2
            tgt[uid] = tgt.get(uid, Decimal(0)) + q6(v)
        ds = []
        for uid in set(s1) | set(s2):
            d = s2.get(uid, Decimal(0)) - s1.get(uid, Decimal(0))
            if d != 0:
                ds.append(int(d * 10**6))
        ds = np.array(ds)
        n = len(ds)
        sr = pd.Series(np.abs(ds)).rank(method="average").to_numpy()
        wplus = float(sr[ds > 0].sum())
        z = (wplus - n * (n + 1) / 4) / math.sqrt(n * (n + 1) * (2 * n + 1) / 24)
        got = registry.REGISTRY["stats_wilcoxon_signed_rank"](spark, sf_dir).first()
        assert got["n"] == n
        assert got["w2_plus"] == int(round(2 * wplus))
        assert abs(got["z"] - z) < 1e-5

    def test_effect_sizes(self, spark, sf_dir):
        ev = _events(sf_dir, ["event_type", "value"])
        ev = ev[ev["value"].notna() & ev["event_type"].isin(["view", "click"])]
        x = ev.loc[ev["event_type"] == "view", "value"].to_numpy(float)
        y = ev.loc[ev["event_type"] == "click", "value"].to_numpy(float)
        n1, n2 = len(x), len(y)
        sp = math.sqrt(
            ((x - x.mean()) ** 2).sum() + ((y - y.mean()) ** 2).sum()
        ) / math.sqrt(n1 + n2 - 2)
        d = (x.mean() - y.mean()) / sp
        g = d * (1.0 - 3.0 / (4 * (n1 + n2) - 9))
        # Cliff's delta brute force (ties contribute zero)
        gt = (x[:, None] > y[None, :]).sum()
        lt = (x[:, None] < y[None, :]).sum()
        delta = (int(gt) - int(lt)) / (n1 * n2)
        got = registry.REGISTRY["stats_effect_sizes"](spark, sf_dir).first()
        assert (got["n1"], got["n2"]) == (n1, n2)
        assert abs(got["cohens_d"] - d) < 1e-5
        assert abs(got["hedges_g"] - g) < 1e-5
        assert abs(got["cliffs_delta"] - delta) < 1e-6


class TestProportionFamilyWave2:
    def test_tost_equivalence(self, spark, sf_dir):
        ev = _events(sf_dir, ["user_id", "event_type"])
        arm = (ev["user_id"] % 2).to_numpy()
        hit = (ev["event_type"] == "purchase").to_numpy()
        n1, x1 = int((arm == 0).sum()), int(hit[arm == 0].sum())
        n2, x2 = int((arm == 1).sum()), int(hit[arm == 1].sum())
        p1, p2 = x1 / n1, x2 / n2
        diff = p1 - p2
        se = math.sqrt(p1 * (1 - p1) / n1 + p2 * (1 - p2) / n2)
        zlo, zhi = (diff + 0.01) / se, (0.01 - diff) / se
        got = registry.REGISTRY["stats_tost_equivalence"](spark, sf_dir).first()
        assert (got["n1"], got["x1"], got["n2"], got["x2"]) == (n1, x1, n2, x2)
        assert abs(got["diff"] - diff) < 1e-6
        assert abs(got["z_lower"] - zlo) < 1e-5
        assert abs(got["z_upper"] - zhi) < 1e-5
        assert got["equivalent"] == (zlo >= 1.644854 and zhi >= 1.644854)

    def test_proportion_ztest(self, spark, sf_dir):
        ev = _events(sf_dir, ["ts", "event_type"])
        ev = ev[ev["event_type"].isin(["view", "click", "purchase"])]
        secs = _epoch_secs(ev["ts"])
        mid = int(secs.min()) + (int(secs.max()) - int(secs.min())) // 2
        late = (secs >= mid).to_numpy()
        hit = (ev["event_type"] == "purchase").to_numpy()
        n1, x1 = int((~late).sum()), int(hit[~late].sum())
        n2, x2 = int(late.sum()), int(hit[late].sum())
        p1, p2 = x1 / n1, x2 / n2
        pp = (x1 + x2) / (n1 + n2)
        z = (p1 - p2) / math.sqrt(pp * (1 - pp) * (1 / n1 + 1 / n2))
        got = registry.REGISTRY["stats_proportion_ztest"](spark, sf_dir).first()
        assert (got["n1"], got["x1"], got["n2"], got["x2"]) == (n1, x1, n2, x2)
        assert abs(got["p1"] - p1) < 1e-6 and abs(got["p2"] - p2) < 1e-6
        assert abs(got["z"] - z) < 1e-5

    def test_power_sample_size(self, spark, sf_dir):
        ev = _events(sf_dir, ["event_type"])
        n = len(ev)
        conv = int((ev["event_type"] == "purchase").sum())
        p0 = conv / n
        za, zb = 1.959963984540054, 0.8416212335729143
        got = {
            r["mde_pct"]: r
            for r in registry.REGISTRY["stats_power_sample_size"](
                spark, sf_dir
            ).collect()
        }
        assert set(got) == {5, 10, 20}
        for mde in (5, 10, 20):
            want = math.ceil(
                (za + zb) ** 2 * 2 * p0 * (1 - p0) / (p0 * mde / 100.0) ** 2
            )
            r = got[mde]
            assert (r["n_events"], r["n_conversions"]) == (n, conv)
            assert abs(r["baseline_rate"] - p0) < 1e-12
            assert r["n_per_arm"] == want, mde

    def test_ab_srm_check(self, spark, sf_dir):
        ev = _events(sf_dir, ["user_id"])
        n0 = n1 = 0
        for uid in ev["user_id"].unique():
            h = int(
                hashlib.sha256(f"srm:{int(uid)}".encode()).hexdigest()[:15], 16
            )
            if (h % 1073741824) * 2 < 1073741824:
                n0 += 1
            else:
                n1 += 1
        chi2 = (n0 - n1) ** 2 / (n0 + n1)
        got = registry.REGISTRY["stats_ab_srm_check"](spark, sf_dir).first()
        assert (got["n0"], got["n1"]) == (n0, n1)
        assert abs(got["srm_chi2"] - chi2) < 1e-6
        assert got["mismatch"] == (chi2 > 3.841459)


class TestRegressionFamilyWave2:
    def test_durbin_watson(self, spark, sf_dir):
        ev = _events(sf_dir, ["ts", "value"])
        day = ev["ts"].dt.date
        rev = ev.groupby(day)["value"].sum()  # pandas sum skips NaN
        days = sorted(rev.index)
        d0 = days[0]
        t = np.array([(d - d0).days for d in days], float)
        y = np.array([rev[d] for d in days], float)
        n = len(days)
        b = (n * (t * y).sum() - t.sum() * y.sum()) / (
            n * (t * t).sum() - t.sum() ** 2
        )
        a = (y.sum() - b * t.sum()) / n
        e = y - a - b * t
        num = den = 0.0
        by_day = dict(zip(days, e))
        for d, ei in by_day.items():
            den += ei * ei
            prev = by_day.get(d - pd.Timedelta(days=1).to_pytimedelta())
            if prev is not None:
                num += (ei - prev) ** 2
        got = registry.REGISTRY["stats_durbin_watson"](spark, sf_dir).first()
        assert got["n_days"] == n
        assert abs(got["dw"] - num / den) < 1e-5

    def test_holt_forecast(self, spark, sf_dir):
        ev = _events(sf_dir, ["ts", "event_type"])
        day = ev["ts"].dt.date
        got = {
            r["event_type"]: r
            for r in registry.REGISTRY["events_holt_forecast"](
                spark, sf_dir
            ).collect()
        }
        counts = ev.groupby(["event_type", day]).size()
        for et in ev["event_type"].unique():
            series = counts[et].sort_index()
            level = trend = None
            for x in series:
                x = float(x)
                if level is None:
                    level, trend = x, 0.0
                else:
                    l_new = 0.5 * x + 0.5 * (level + trend)
                    trend = 0.5 * (l_new - level) + 0.5 * trend
                    level = l_new
            r = got[et]
            assert r["n_days"] == len(series), et
            assert abs(r["level"] - level) < 1e-6, et
            assert abs(r["trend"] - trend) < 1e-6, et
            assert abs(r["forecast_7d"] - (level + 7 * trend)) < 1e-6, et


class TestEventProfilesWave2:
    def test_burstiness(self, spark, sf_dir):
        ev = _events(sf_dir, ["ts", "event_type"])
        day = ev["ts"].dt.date
        counts = ev.groupby(["event_type", day]).size()
        got = {
            r["event_type"]: r
            for r in registry.REGISTRY["events_burstiness"](spark, sf_dir).collect()
        }
        for et in ev["event_type"].unique():
            x = counts[et].to_numpy(float)
            mu = x.mean()
            var = ((x - mu) ** 2).mean()
            r = got[et]
            assert (r["n_days"], r["n_events"]) == (len(x), int(x.sum())), et
            assert abs(r["dispersion_index"] - var / mu) < 1e-5, et
            b = (math.sqrt(var) - mu) / (math.sqrt(var) + mu)
            assert abs(r["burstiness"] - b) < 1e-6, et

    def test_seasonality_strength(self, spark, sf_dir):
        ev = _events(sf_dir, ["ts"])
        df = pd.DataFrame(
            {"d": ev["ts"].dt.date, "dow": ev["ts"].dt.dayofweek + 1}
        )
        daily = df.groupby(["d", "dow"]).size().reset_index(name="n")
        x = daily["n"].to_numpy(float)
        k = len(x)
        gm = x.mean()
        ss_tot = ((x - gm) ** 2).sum()
        ss_between = 0.0
        for _, grp in daily.groupby("dow"):
            g = grp["n"].to_numpy(float)
            ss_between += len(g) * (g.mean() - gm) ** 2
        got = registry.REGISTRY["events_seasonality_strength"](spark, sf_dir).first()
        assert got["n_days"] == k
        assert abs(got["seasonality_strength"] - ss_between / ss_tot) < 1e-5

    def test_user_entropy_top100(self, spark, sf_dir):
        ev = _events(sf_dir, ["user_id", "event_type"])
        ents = {}
        for uid, grp in ev.groupby("user_id"):
            c = grp["event_type"].value_counts()
            n = int(c.sum())
            ent = float(-sum((v / n) * math.log(v / n) for v in c))
            ents[int(uid)] = (n, len(c), _round6(ent))
        order = sorted(ents, key=lambda u: (-ents[u][2], u))[:100]
        got = registry.REGISTRY["events_user_entropy"](spark, sf_dir).collect()
        assert [r["user_id"] for r in got] == order
        for r in got:
            n, k, ent = ents[r["user_id"]]
            assert (r["n_events"], r["n_types"]) == (n, k), r["user_id"]
            assert abs(r["entropy"] - ent) < 2e-6, r["user_id"]


class TestEvalFamilyWave2:
    def test_mcc(self, spark, sf_dir):
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

        d = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text", "lang"])
        preds = [predict(t) for t in d["text"]]
        s = len(d)
        c = sum(1 for lab, p in zip(d["lang"], preds) if lab == p)
        tcount = Counter(d["lang"])
        pcount = Counter(preds)
        sum_tp = sum(tcount[k] * pcount.get(k, 0) for k in tcount)
        sum_t2 = sum(v * v for v in tcount.values())
        sum_p2 = sum(v * v for v in pcount.values())
        mcc = (c * s - sum_tp) / math.sqrt((s * s - sum_p2) * (s * s - sum_t2))
        got = registry.REGISTRY["eval_mcc"](spark, sf_dir).first()
        assert (got["n_docs"], got["n_correct"]) == (s, c)
        assert abs(got["mcc"] - mcc) < 1e-5

    def test_pass_at_k(self, spark, sf_dir):
        ev = _events(sf_dir, ["ts", "event_id", "user_id", "event_type"])
        ev = ev.sort_values(["user_id", "ts", "event_id"])
        cs = []
        for _, grp in ev.groupby("user_id"):
            if len(grp) < 10:
                continue
            head = grp.head(10)
            cs.append(int((head["event_type"] == "purchase").sum()))
        n_tasks = len(cs)

        def pass_at(k):
            tot = 0.0
            for c in cs:
                num = 1.0
                for i in range(k):
                    num *= max(10 - c - i, 0)
                den = 1.0
                for i in range(k):
                    den *= 10 - i
                tot += 1.0 - num / den
            return tot / n_tasks

        got = registry.REGISTRY["eval_pass_at_k"](spark, sf_dir).first()
        assert got["n_tasks"] == n_tasks
        assert abs(got["avg_correct"] - sum(cs) / n_tasks) < 1e-6
        assert abs(got["pass_at_1"] - pass_at(1)) < 1e-6
        assert abs(got["pass_at_5"] - pass_at(5)) < 1e-6

    def test_benford(self, spark, sf_dir):
        o = pd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_totalprice"])
        xs = o["o_totalprice"].astype(float)
        xs = xs[xs >= 1]
        digits = []
        for x in xs:
            for dec in range(11, -1, -1):
                if x >= 10.0**dec:
                    digits.append(int(x // 10.0**dec))
                    break
        n = len(digits)
        cnt = Counter(digits)
        p_benford = {d: math.log10(1 + 1 / d) for d in range(1, 10)}
        got = registry.REGISTRY["dq_benford"](spark, sf_dir).collect()
        assert {r["digit"] for r in got} == set(cnt)
        for r in got:
            d = r["digit"]
            assert r["cnt"] == cnt[d], d
            assert abs(r["p_obs"] - cnt[d] / n) < 1e-6, d
            assert abs(r["p_benford"] - p_benford[d]) < 1e-5, d
            assert abs(r["deviation"] - (cnt[d] / n - r["p_benford"])) < 2e-6, d
