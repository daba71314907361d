"""Round-12 known-answer certification, wave 4.

The quantile machinery (global / grouped / weighted / winsorize / Tukey
fences / inter-arrival tails — all built on the (N*p+99)//100 value-exact
rank pick and the two-phase prefix sums), the two sha-deterministic
resampling ops (Poisson bootstrap CI, permutation test — replicate draws
re-derived with hashlib and exact Decimal sums), the z-score outlier cut,
the lag-1 autocorrelation, the rolling-origin forecast backtest, and the
labels-axis classifier report. Pure Python/numpy references from raw
parquet, zero shared code.
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict
from decimal import ROUND_HALF_UP, Decimal

import numpy as np
import pandas as pd
import pytest

from wri_data_processing_spark import registry

registry.load_all()


def _round6(x: float) -> float:
    return float(Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP))


def _q6(v) -> Decimal:
    return Decimal(repr(float(v))).quantize(Decimal("0.000001"), ROUND_HALF_UP)


def _events(sf_dir, cols):
    return pd.read_parquet(f"{sf_dir}/events.parquet", columns=cols)


def _sha_u(key: str) -> int:
    return int(hashlib.sha256(key.encode()).hexdigest()[:15], 16) % 1073741824


def _rank_pick(values, p):
    """Smallest value whose cumulative count reaches ceil(p*N/100) —
    the engines' (N*p+99)//100 value-exact convention."""
    vs = sorted(values)
    n = len(vs)
    return vs[(n * p + 99) // 100 - 1]


class TestQuantileMachinery:
    def test_quantiles_exact(self, spark, sf_dir):
        ev = _events(sf_dir, ["value"])
        vs = ev["value"].dropna().to_list()
        got = registry.REGISTRY["stats_quantiles_exact"](spark, sf_dir).first()
        assert got["n"] == len(vs)
        for p in (25, 50, 75, 90, 99):
            assert got[f"p{p}"] == _rank_pick(vs, p), p

    def test_grouped_quantiles(self, spark, sf_dir):
        ev = _events(sf_dir, ["event_type", "value"])
        ev = ev[ev["value"].notna()]
        got = {
            r["event_type"]: r
            for r in registry.REGISTRY["stats_grouped_quantiles"](
                spark, sf_dir
            ).collect()
        }
        for et, grp in ev.groupby("event_type"):
            vs = grp["value"].to_list()
            r = got[et]
            assert r["n"] == len(vs), et
            for p in (25, 50, 75, 90, 99):
                assert r[f"p{p}"] == _rank_pick(vs, p), (et, p)

    def test_weighted_quantiles(self, spark, sf_dir):
        li = pd.read_parquet(
            f"{sf_dir}/lineitem.parquet", columns=["l_extendedprice", "l_quantity"]
        )
        w = li.groupby("l_extendedprice")["l_quantity"].sum()
        vs = sorted(w.index)
        tw = int(w.sum())
        got = registry.REGISTRY["stats_weighted_quantiles"](spark, sf_dir).first()
        assert got["total_weight"] == tw
        for p in (25, 50, 75, 99):
            cw = 0
            pick = None
            for v in vs:
                cw += int(w[v])
                if cw * 100 >= tw * p:
                    pick = v
                    break
            assert got[f"wp{p}"] == pick, p

    def test_winsorize(self, spark, sf_dir):
        ev = _events(sf_dir, ["event_id", "value"])
        ev = ev[ev["value"].notna()]
        vs = ev["value"].to_list()
        lo = _rank_pick(vs, 1)
        hi = _rank_pick(vs, 99)
        got = {
            r["event_id"]: r
            for r in registry.REGISTRY["stats_winsorize"](spark, sf_dir).collect()
        }
        assert set(got) == {int(i) for i in ev["event_id"]}
        n_clip = 0
        for eid, v in zip(ev["event_id"], ev["value"]):
            r = got[int(eid)]
            w_ = lo if v < lo else (hi if v > hi else v)
            assert r["value_w"] == w_, eid
            assert r["clipped"] == (v < lo or v > hi), eid
            n_clip += int(v < lo or v > hi)
        assert n_clip > 0  # the band must actually bite on this fixture

    def test_outlier_iqr(self, spark, sf_dir):
        ev = _events(sf_dir, ["event_type", "value"])
        ev = ev[ev["value"].notna()]
        got = {
            r["event_type"]: r
            for r in registry.REGISTRY["dq_outlier_iqr"](spark, sf_dir).collect()
        }
        for et, grp in ev.groupby("event_type"):
            vs = sorted(grp["value"])
            n = len(vs)

            def pick(k):  # min v with 4*cum >= k*n
                cum = 0
                cnt = Counter(vs)
                for v in sorted(cnt):
                    cum += cnt[v]
                    if 4 * cum >= k * n:
                        return v

            q1, q3 = pick(1), pick(3)
            lo, hi = q1 - 1.5 * (q3 - q1), q3 + 1.5 * (q3 - q1)
            n_out = sum(1 for v in vs if v < lo or v > hi)
            r = got[et]
            assert r["n"] == n, et
            assert abs(r["q1"] - q1) < 1e-6 and abs(r["q3"] - q3) < 1e-6, et
            assert abs(r["lo_fence"] - lo) < 1e-6 and abs(r["hi_fence"] - hi) < 1e-6, et
            assert r["n_outliers"] == n_out, et

    def test_interarrival_quantiles(self, spark, sf_dir):
        ev = _events(sf_dir, ["ts", "event_id", "user_id", "event_type"])
        secs = (ev["ts"] - pd.Timestamp(0)) // pd.Timedelta(seconds=1)
        ev = ev.assign(sec=secs).sort_values(["event_type", "user_id", "ts", "event_id"])
        gaps = defaultdict(list)
        prev_key = None
        prev_sec = None
        for et, uid, sec in zip(ev["event_type"], ev["user_id"], ev["sec"]):
            key = (et, uid)
            if key == prev_key:
                gaps[et].append(int(sec - prev_sec))
            prev_key, prev_sec = key, sec
        got = {
            r["event_type"]: r
            for r in registry.REGISTRY["events_interarrival_quantiles"](
                spark, sf_dir
            ).collect()
        }
        assert set(got) == set(gaps)
        for et, gs in gaps.items():
            r = got[et]
            assert r["n_gaps"] == len(gs), et
            assert r["p50_sec"] == _rank_pick(gs, 50), et
            assert r["p90_sec"] == _rank_pick(gs, 90), et
            assert r["p99_sec"] == _rank_pick(gs, 99), et


class TestOutlierAndSeriesWave4:
    def test_zscore_outliers(self, spark, sf_dir):
        ev = _events(sf_dir, ["event_id", "event_type", "value"])
        want = set()
        for et, grp in ev.groupby("event_type"):
            n = len(grp)  # count(*) INCLUDING null-value rows (engine convention)
            v = grp["value"].dropna()
            sx, sxx = float(v.sum()), float((v * v).sum())
            mean = sx / n
            std = math.sqrt((sxx - sx * sx / n) / (n - 1))
            for eid, val in zip(grp["event_id"], grp["value"]):
                if pd.notna(val) and abs((val - mean) / std) > 3.0:
                    want.add(int(eid))
        got = {
            int(r["event_id"])
            for r in registry.REGISTRY["events_zscore_outliers"](
                spark, sf_dir
            ).collect()
        }
        assert got == want and want

    def test_autocorr_lag1(self, spark, sf_dir):
        ev = _events(sf_dir, ["ts"])
        c = Counter(ev["ts"].dt.date)
        xs = [c[d] for d in sorted(c)]
        # observed-day LAG: consecutive rows of the ordered daily frame,
        # regardless of calendar gaps
        x = np.array(xs[:-1], float)
        y = np.array(xs[1:], float)
        k = len(x)
        r_ = (k * (x * y).sum() - x.sum() * y.sum()) / (
            math.sqrt(k * (x * x).sum() - x.sum() ** 2)
            * math.sqrt(k * (y * y).sum() - y.sum() ** 2)
        )
        got = registry.REGISTRY["events_autocorr_lag1"](spark, sf_dir).first()
        assert got["n_pairs"] == k
        assert abs(got["autocorr_lag1"] - r_) < 1e-9

    def test_forecast_backtest(self, spark, sf_dir):
        ev = _events(sf_dir, ["ts", "event_type"])
        c = Counter(zip(ev["event_type"], ev["ts"].dt.date))
        one = pd.Timedelta(days=1).to_pytimedelta()
        per = defaultdict(lambda: [0, 0, 0])  # n_origins, ae_naive, ae_seasonal
        for (et, d), x in c.items():
            f1 = c.get((et, d - one))
            f7 = c.get((et, d - 7 * one))
            if f1 is not None and f7 is not None:
                p = per[et]
                p[0] += 1
                p[1] += abs(x - f1)
                p[2] += abs(x - f7)
        got = {
            r["event_type"]: r
            for r in registry.REGISTRY["events_forecast_backtest"](
                spark, sf_dir
            ).collect()
        }
        assert set(got) == set(per)
        for et, (k, ae1, ae7) in per.items():
            r = got[et]
            assert (r["n_origins"], r["ae_naive"], r["ae_seasonal"]) == (k, ae1, ae7), et
            assert abs(r["mae_naive"] - ae1 / k) < 1e-12, et
            assert abs(r["mae_seasonal"] - ae7 / k) < 1e-12, et


class TestResamplingWave4:
    # Poisson(1) inverse-CDF thresholds restated from the documented
    # pinned literals (floor(cdf(k) * 2^30))
    _CDF = [
        (0, 395007542), (1, 790015084), (2, 987518855),
        (3, 1053353445), (4, 1069812093), (5, 1073103822),
    ]

    def test_bootstrap_ci(self, spark, sf_dir):
        ev = _events(sf_dir, ["event_id", "event_type", "value"])
        ev = ev[ev["value"].notna()]
        got = {
            r["event_type"]: r
            for r in registry.REGISTRY["stats_bootstrap_ci"](spark, sf_dir).collect()
        }
        for et, grp in ev.groupby("event_type"):
            ys = [_q6(v) for v in grp["value"]]
            ids = [int(i) for i in grp["event_id"]]
            n = len(ys)
            base = float(sum(ys)) / n
            ms = []
            for b in range(32):
                sw = swy = 0
                for eid, y in zip(ids, ys):
                    u = _sha_u(f"{eid}:{b}")
                    w = 6
                    for k, t in self._CDF:
                        if u < t:
                            w = k
                            break
                    sw += w
                    swy += w * y
                ms.append((float(swy) / sw, b))
            ms.sort()
            r = got[et]
            assert r["n"] == n, et
            assert abs(r["mean"] - base) < 1e-6, et
            assert abs(r["ci_lo"] - ms[1][0]) < 1e-6, et
            assert abs(r["ci_hi"] - ms[30][0]) < 1e-6, et

    def test_permutation_test(self, spark, sf_dir):
        ev = _events(sf_dir, ["event_id", "user_id", "event_type", "value"])
        ev = ev[ev["value"].notna()]
        got = {
            r["event_type"]: r
            for r in registry.REGISTRY["stats_permutation_test"](
                spark, sf_dir
            ).collect()
        }
        for et, grp in ev.groupby("event_type"):
            ys = [_q6(v) for v in grp["value"]]
            ids = [int(i) for i in grp["event_id"]]
            is_a = [(int(u) % 2 == 0) for u in grp["user_id"]]
            n_a = sum(is_a)
            n_b = len(ys) - n_a
            sa = sum(y for y, a in zip(ys, is_a) if a)
            sb = sum(y for y, a in zip(ys, is_a) if not a)
            diff_obs = float(sa) / n_a - float(sb) / n_b
            n_ext = 0
            for b in range(32):
                swa = swb = Decimal(0)
                ka = kb = 0
                for eid, y in zip(ids, ys):
                    u = _sha_u(f"p:{eid}:{b}")
                    if u * (n_a + n_b) < n_a * 1073741824:
                        swa += y
                        ka += 1
                    else:
                        swb += y
                        kb += 1
                if ka == 0 or kb == 0:
                    continue
                diff_b = float(swa) / ka - float(swb) / kb
                if abs(diff_b) >= abs(diff_obs):
                    n_ext += 1
            r = got[et]
            assert (r["n_a"], r["n_b"]) == (n_a, n_b), et
            assert abs(r["diff_obs"] - diff_obs) < 1e-6, et
            assert r["n_extreme"] == n_ext, et
            assert abs(r["p_value"] - (1 + n_ext) / 33.0) < 1e-12, et


class TestClassifierReportWave4:
    def test_classifier_report(self, spark, sf_dir):
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
        support = Counter(d["lang"])
        pred_total = Counter(preds)
        tp = Counter(l for l, p in zip(d["lang"], preds) if l == p)
        got = {
            r["cls"]: r
            for r in registry.REGISTRY["eval_classifier_report"](
                spark, sf_dir
            ).collect()
        }
        # labels-only class axis by documented convention (the union-axis
        # summary lives in eval_macro_f1)
        assert set(got) == set(support)
        for cls in support:
            c_tp = tp.get(cls, 0)
            c_fp = pred_total.get(cls, 0) - c_tp
            c_fn = support[cls] - c_tp
            r = got[cls]
            assert (r["support"], r["tp"], r["fp"], r["fn"]) == (
                support[cls], c_tp, c_fp, c_fn,
            ), cls
            if c_tp + c_fp == 0:
                assert r["precision"] is None, cls
            else:
                assert abs(r["precision"] - c_tp / (c_tp + c_fp)) < 1e-12, cls
            assert abs(r["recall"] - c_tp / (c_tp + c_fn)) < 1e-12, cls
            denom = 2 * c_tp + c_fp + c_fn
            if denom == 0:
                assert r["f1"] is None, cls
            else:
                assert abs(r["f1"] - 2 * c_tp / denom) < 1e-12, cls
