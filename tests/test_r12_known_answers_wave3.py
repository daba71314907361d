"""Round-12 known-answer certification, wave 3.

Continues the independent-recompute program (waves 1-2 caught the
Wilcoxon z/2 bug; four formula bugs total have been found this way and
zero by the mirrored oracle). This wave covers the event-analytics and
model-eval formula surface: Kaplan-Meier life table, STL-shaped
decomposition, the Poisson two-rate z, MAD outliers, the lag-1..7 ACF,
binary-segmentation changepoint, (user,day) co-occurrence PMI, exact
power-of-two EWMA, the CUSUM alarm walk, U-shaped attribution ppm
credits, the Pearson correlation matrix and grouped moments, the
sha-scored calibration/PR/lift trio, and the ranked-retrieval per-query
scorecard plus its composed one-row pipeline (cosine re-derived with the
engines' exact left-fold association so ROUND-6 ranks are reproducible).

All references are pure Python/numpy/pandas from raw parquet, zero code
shared with the engine or the oracle SQL.
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


def _events(sf_dir, cols):
    return pd.read_parquet(f"{sf_dir}/events.parquet", columns=cols)


def _sha_u(salt: str, key) -> int:
    h = hashlib.sha256(f"{salt}{key}".encode()).hexdigest()[:15]
    return int(h, 16) % 1073741824


def _daily_by_type(sf_dir):
    ev = _events(sf_dir, ["ts", "event_type"])
    day = ev["ts"].dt.date
    out = {}
    for et, grp in ev.groupby("event_type"):
        c = Counter(grp["ts"].dt.date)
        days = sorted(c)
        out[et] = (days, [int(c[d]) for d in days])
    return out


class TestSurvivalAndSeries:
    def test_survival_km(self, spark, sf_dir):
        ev = _events(sf_dir, ["ts", "user_id", "event_type"])
        day = ev["ts"].dt.date
        fd = day.groupby(ev["user_id"]).min()
        ld = day.groupby(ev["user_id"]).max()
        pur = ev[ev["event_type"] == "purchase"]
        pdm = pur["ts"].dt.date.groupby(pur["user_id"]).min()
        rows = Counter()
        for uid in fd.index:
            if uid in pdm.index:
                rows[((pdm[uid] - fd[uid]).days, 1)] += 1
            else:
                rows[((ld[uid] - fd[uid]).days, 0)] += 1
        durs = sorted({d for d, _ in rows})
        ntot = sum(rows.values())
        at_risk = ntot
        ln_s = 0.0
        want = []
        for dur in durs:
            d = rows.get((dur, 1), 0)
            c = rows.get((dur, 0), 0)
            if d > 0 and at_risk > d:
                ln_s += math.log((at_risk - d) / at_risk)
                ln_out = _round6(ln_s)
            elif d > 0:
                ln_out = None
            else:
                ln_out = _round6(ln_s)
            want.append((dur, at_risk, d, c, ln_out))
            at_risk -= d + c
        got = registry.REGISTRY["events_survival_km"](spark, sf_dir).collect()
        assert len(got) == len(want)
        for r, (dur, nr, d, c, ln_out) in zip(got, want):
            assert (r["dur"], r["n_risk"], r["n_event"], r["n_censor"]) == (
                dur, nr, d, c,
            ), dur
            if ln_out is None:
                assert r["ln_surv"] is None, dur
            else:
                assert abs(r["ln_surv"] - ln_out) < 2e-6, dur

    def test_stl_decompose(self, spark, sf_dir):
        series = _daily_by_type(sf_dir)
        want = {}
        for et, (days, xs) in series.items():
            n = len(xs)
            snum = Counter()
            scnt = Counter()
            rows = []
            for i in range(3, n - 3):
                sum7 = sum(xs[i - 3 : i + 4])
                det7 = 7 * xs[i] - sum7
                dow = days[i].isoweekday()
                snum[dow] += det7
                scnt[dow] += 1
                rows.append((days[i], xs[i], sum7, det7, dow))
            for d, x, sum7, det7, dow in rows:
                want[(et, str(d))] = (
                    x,
                    sum7 / 7.0,
                    snum[dow] / (7.0 * scnt[dow]),
                    (det7 * scnt[dow] - snum[dow]) / (7.0 * scnt[dow]),
                )
        got = registry.REGISTRY["events_stl_decompose"](spark, sf_dir).collect()
        assert len(got) == len(want)
        for r in got:
            k = (r["event_type"], r["d"])
            x, tr, se, res = want[k]
            assert r["n"] == x, k
            assert abs(r["trend"] - tr) < 1e-9, k
            assert abs(r["seasonal"] - se) < 1e-9, k
            assert abs(r["residual"] - res) < 1e-9, k

    def test_rate_test(self, spark, sf_dir):
        ev = _events(sf_dir, ["ts"])
        secs = ((ev["ts"] - pd.Timestamp(0)) // pd.Timedelta(seconds=1)).to_numpy()
        mid = (int(secs.min()) + int(secs.max())) // 2
        h0 = secs[secs < mid]
        h1 = secs[secs >= mid]
        k1, k2 = len(h0), len(h1)
        t1 = int(h0.max() - h0.min())
        t2 = int(h1.max() - h1.min())
        z = (k1 / t1 - k2 / t2) / math.sqrt(k1 / t1**2 + k2 / t2**2)
        got = registry.REGISTRY["events_rate_test"](spark, sf_dir).first()
        assert (got["k1"], got["k2"], got["t1"], got["t2"]) == (k1, k2, t1, t2)
        assert abs(got["z"] - z) < 1e-9

    def test_acf(self, spark, sf_dir):
        ev = _events(sf_dir, ["ts"])
        c = Counter(ev["ts"].dt.date)
        got = {r["lag"]: r for r in registry.REGISTRY["events_acf"](spark, sf_dir).collect()}
        one_day = pd.Timedelta(days=1).to_pytimedelta()
        for lag in range(1, 8):
            xs, ys = [], []
            for d, x in c.items():
                d2 = d + lag * one_day
                if d2 in c:
                    xs.append(x)
                    ys.append(c[d2])
            xs, ys = np.array(xs, float), np.array(ys, float)
            k = len(xs)
            r_num = k * (xs * ys).sum() - xs.sum() * ys.sum()
            r_den = math.sqrt(k * (xs * xs).sum() - xs.sum() ** 2) * math.sqrt(
                k * (ys * ys).sum() - ys.sum() ** 2
            )
            r = got[lag]
            assert r["n_pairs"] == k, lag
            assert abs(r["acf"] - r_num / r_den) < 1e-5, lag

    def test_changepoint_binary(self, spark, sf_dir):
        series = _daily_by_type(sf_dir)
        got = {
            r["event_type"]: r
            for r in registry.REGISTRY["events_changepoint_binary"](
                spark, sf_dir
            ).collect()
        }
        for et, (days, xs) in series.items():
            t = len(xs)
            st = sum(xs)
            best = None
            sk = 0
            for k in range(1, t):
                sk += xs[k - 1]
                dk = sk * t - k * st
                score = dk * dk / (k * (t - k))
                if best is None or score > best[0]:
                    best = (score, k, days[k - 1])
            r = got[et]
            assert r["n_days"] == t, et
            assert r["split_k"] == best[1], et
            assert r["split_day"] == str(best[2]), et
            assert abs(r["score"] - best[0]) < 1e-4, et

    def test_ewma(self, spark, sf_dir):
        ev = _events(sf_dir, ["ts"])
        c = Counter(ev["ts"].dt.date)
        one_day = pd.Timedelta(days=1).to_pytimedelta()
        got = {r["day"]: r for r in registry.REGISTRY["events_ewma"](spark, sf_dir).collect()}
        assert len(got) == len(c)
        for d in c:
            wsum = wtot = k = 0
            for back in range(0, 8):
                bd = d - back * one_day
                if bd in c:
                    w = 1 << (7 - back)
                    wsum += w * c[bd]
                    wtot += w
                    k += 1
            r = got[str(d)]
            assert (r["n_days"], r["wsum"], r["wtot"]) == (k, wsum, wtot), d
            assert abs(r["ewma"] - wsum / wtot) < 1e-12, d

    def test_cusum_alarm(self, spark, sf_dir):
        series = _daily_by_type(sf_dir)
        got = {
            r["event_type"]: r
            for r in registry.REGISTRY["events_cusum_alarm"](spark, sf_dir).collect()
        }
        for et, (days, xs) in series.items():
            mu = sum(xs[:7]) / min(7, len(xs))
            s = 0.0
            smax = 0.0
            nal = 0
            first = None
            for i, (d, x) in enumerate(zip(days, xs)):
                s = max(s + x - mu, 0.0) if i else max(x - mu, 0.0)
                smax = max(smax, s)
                if s > 3.0 * math.sqrt(mu):
                    nal += 1
                    if first is None:
                        first = str(d)
            r = got[et]
            assert r["n_days"] == len(xs), et
            assert abs(r["s_final"] - s) < 1e-5, et
            assert abs(r["s_max"] - smax) < 1e-5, et
            assert (r["n_alarms"], r["first_alarm_day"]) == (nal, first), et


class TestBehaviorFamilies:
    def test_mad_outliers(self, spark, sf_dir):
        ev = _events(sf_dir, ["event_id", "event_type", "value"])
        want = set()
        for et, grp in ev.groupby("event_type"):
            v = grp["value"].dropna() if grp["value"].isna().any() else grp["value"]
            med = v.median()
            dev = (grp["value"] - med).abs()
            mad = dev.median()
            flag = grp.loc[dev > 8.0 * mad, "event_id"]
            want.update(int(i) for i in flag)
        got = {
            int(r["event_id"])
            for r in registry.REGISTRY["events_mad_outliers"](spark, sf_dir).collect()
        }
        assert got == want

    def test_cooccurrence_pmi(self, spark, sf_dir):
        ev = _events(sf_dir, ["ts", "user_id", "event_type"])
        ctx = defaultdict(set)
        for uid, d, et in zip(ev["user_id"], ev["ts"].dt.date, ev["event_type"]):
            ctx[(uid, d)].add(et)
        n_ctx = len(ctx)
        n_t = Counter()
        n_ab = Counter()
        for types in ctx.values():
            ts = sorted(types)
            n_t.update(ts)
            for i, a in enumerate(ts):
                for b in ts[i + 1 :]:
                    n_ab[(a, b)] += 1
        got = registry.REGISTRY["events_cooccurrence_pmi"](spark, sf_dir).collect()
        assert {(r["type_a"], r["type_b"]) for r in got} == set(n_ab)
        for r in got:
            k = (r["type_a"], r["type_b"])
            assert (r["n_ab"], r["n_a"], r["n_b"]) == (n_ab[k], n_t[k[0]], n_t[k[1]]), k
            pmi = math.log(n_ab[k] * n_ctx / (n_t[k[0]] * n_t[k[1]]))
            assert abs(r["pmi"] - pmi) < 2e-6, k

    def test_attribution_position(self, spark, sf_dir):
        ev = _events(sf_dir, ["ts", "event_id", "user_id", "event_type"])
        pur = ev[ev["event_type"] == "purchase"]
        t0 = pur.groupby("user_id")["ts"].min()
        credit = Counter()
        users = defaultdict(set)
        touches = Counter()
        for uid, anchor in t0.items():
            path = ev[
                (ev["user_id"] == uid)
                & (ev["ts"] < anchor)
                & (ev["event_type"] != "purchase")
            ].sort_values(["ts", "event_id"])
            k = len(path)
            if k == 0:
                continue
            for rn, et in enumerate(path["event_type"], start=1):
                if k == 1:
                    c = 1000000
                elif k == 2:
                    c = 500000
                elif rn in (1, k):
                    c = 400000
                else:
                    c = 200000 // (k - 2)
                credit[et] += c
                users[et].add(uid)
                touches[et] += 1
        got = registry.REGISTRY["events_attribution_position"](spark, sf_dir).collect()
        assert {r["channel"] for r in got} == set(credit)
        for r in got:
            ch = r["channel"]
            assert r["credit_ppm"] == credit[ch], ch
            assert r["n_users"] == len(users[ch]), ch
            assert r["n_touches"] == touches[ch], ch


class TestMomentFamilies:
    def test_corr_matrix(self, spark, sf_dir):
        cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
        li = pd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=cols)
        got = registry.REGISTRY["stats_corr_matrix"](spark, sf_dir).collect()
        assert len(got) == 6
        for r in got:
            a = li[r["var_a"]].to_numpy(float)
            b = li[r["var_b"]].to_numpy(float)
            c = np.corrcoef(a, b)[0, 1]
            assert abs(r["corr_ab"] - c) < 1e-9, (r["var_a"], r["var_b"])

    def test_moments(self, spark, sf_dir):
        li = pd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_returnflag", "l_quantity", "l_extendedprice"],
        )
        got = {
            r["l_returnflag"]: r
            for r in registry.REGISTRY["stats_moments"](spark, sf_dir).collect()
        }
        for flag, grp in li.groupby("l_returnflag"):
            x = grp["l_quantity"].to_numpy(float)
            y = grp["l_extendedprice"].to_numpy(float)
            n = len(x)
            r = got[flag]
            assert r["n"] == n, flag
            assert abs(r["mean_qty"] - x.mean()) < 1e-9, flag
            assert abs(r["var_qty"] - x.var(ddof=1)) < 1e-6, flag
            assert abs(r["corr_qty_price"] - np.corrcoef(x, y)[0, 1]) < 1e-9, flag
            sxy = (x * y).sum() - x.sum() * y.sum() / n
            sxx = (x * x).sum() - x.sum() ** 2 / n
            assert abs(r["slope_price_on_qty"] - sxy / sxx) < 1e-9, flag


class TestShaScoredEvalTrio:
    def test_calibration_bins(self, spark, sf_dir):
        ev = _events(sf_dir, ["event_id", "event_type"])
        us = np.array([_sha_u("cal:", int(i)) for i in ev["event_id"]])
        pos = (ev["event_type"] == "purchase").to_numpy().astype(int)
        bins = us * 10 // 1073741824
        got = {r["bin"]: r for r in registry.REGISTRY["stats_calibration_bins"](spark, sf_dir).collect()}
        for b in sorted(set(bins)):
            m = bins == b
            r = got[b]
            assert r["n"] == int(m.sum()), b
            assert abs(r["mean_score"] - us[m].sum() / (m.sum() * 1073741824.0)) < 1e-12, b
            assert abs(r["pos_rate"] - pos[m].mean()) < 1e-12, b

    def test_pr_curve(self, spark, sf_dir):
        ev = _events(sf_dir, ["event_id", "event_type"])
        us = np.array([_sha_u("cal:", int(i)) for i in ev["event_id"]])
        pos = (ev["event_type"] == "purchase").to_numpy().astype(int)
        n_pos = int(pos.sum())
        got = {r["threshold_decile"]: r for r in registry.REGISTRY["stats_pr_curve"](spark, sf_dir).collect()}
        for k in range(1, 10):
            m = us * 10 >= k * 1073741824
            tp = int(pos[m].sum())
            fp = int(m.sum()) - tp
            r = got[k]
            assert (r["tp"], r["fp"], r["fn"]) == (tp, fp, n_pos - tp), k
            if tp + fp == 0:
                assert r["precision"] is None, k
            else:
                assert abs(r["precision"] - tp / (tp + fp)) < 1e-12, k
            assert abs(r["recall"] - tp / n_pos) < 1e-12, k

    def test_lift_gains(self, spark, sf_dir):
        ev = _events(sf_dir, ["event_id", "event_type"])
        us = np.array([_sha_u("lift:", int(i)) for i in ev["event_id"]])
        pos = (ev["event_type"] == "purchase").to_numpy().astype(int)
        dec = us * 10 // 1073741824
        tn, tp_tot = len(us), int(pos.sum())
        got = {r["decile"]: r for r in registry.REGISTRY["stats_lift_gains"](spark, sf_dir).collect()}
        for d in sorted(set(dec)):
            m = dec == d
            cm = dec >= d
            cum_n, cum_pos = int(cm.sum()), int(pos[cm].sum())
            r = got[d]
            assert (r["n"], r["np"], r["cum_n"], r["cum_pos"]) == (
                int(m.sum()), int(pos[m].sum()), cum_n, cum_pos,
            ), d
            assert abs(r["gain"] - cum_pos / tp_tot) < 2e-6, d
            assert abs(r["lift"] - cum_pos * tn / (cum_n * tp_tot)) < 2e-6, d


class TestRetrievalScorecard:
    def _scored(self, sf_dir):
        emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
        vecs = {}
        labels = {}
        for vid, arr, lab in zip(emb["vec_id"], emb["embedding"], emb["label"]):
            vecs[int(vid)] = [float(x) for x in arr]
            labels[int(vid)] = lab

        def norm(v):
            acc = 0.0
            for x in v:
                acc += x * x
            return math.sqrt(acc)

        norms = {i: norm(v) for i, v in vecs.items()}

        def cos6(a, b):
            acc = 0.0
            for x, y in zip(vecs[a], vecs[b]):
                acc += x * y
            return _round6(acc / (norms[a] * norms[b]))

        # pinned DCG weights, restated from the documented formula
        dcg_w = [(1 << 30) if r == 1 else
                 math.floor((1 << 30) * math.log(2.0) / math.log(r + 1.0))
                 for r in range(1, 11)]
        idcg = [sum(dcg_w[:k]) for k in range(0, 11)]
        out = {}
        for qid in sorted(v for v in vecs if v % 64 == 0):
            pool = sorted(
                ((-cos6(qid, c), c) for c in vecs if c != qid)
            )
            n_rel = first = hits10 = 0
            dcg_i = 0
            for rnk, (_, c) in enumerate(pool, start=1):
                rel = labels[c] == labels[qid]
                if rel:
                    n_rel += 1
                    if first == 0:
                        first = rnk
                    if rnk <= 10:
                        hits10 += 1
                        dcg_i += dcg_w[rnk - 1]
            out[qid] = dict(
                qlabel=labels[qid],
                n_rel=n_rel,
                first_rel_rank=first,
                hits_10=hits10,
                reciprocal_rank=1.0 / first,
                capped_recall_10=hits10 / min(n_rel, 10),
                ndcg_10=dcg_i / idcg[min(n_rel, 10)],
            )
        return out

    def test_retrieval_per_query(self, spark, sf_dir):
        want = self._scored(sf_dir)
        got = {
            r["qid"]: r
            for r in registry.REGISTRY["eval_retrieval_per_query"](
                spark, sf_dir
            ).collect()
        }
        assert set(got) == set(want)
        for qid, w in want.items():
            r = got[qid]
            assert (
                r["qlabel"], r["n_rel"], r["first_rel_rank"], r["hits_10"]
            ) == (w["qlabel"], w["n_rel"], w["first_rel_rank"], w["hits_10"]), qid
            assert abs(r["reciprocal_rank"] - w["reciprocal_rank"]) < 1e-6, qid
            assert abs(r["capped_recall_10"] - w["capped_recall_10"]) < 1e-6, qid
            assert abs(r["ndcg_10"] - w["ndcg_10"]) < 1e-6, qid

    def test_retrieval_eval_pipeline(self, spark, sf_dir):
        want = self._scored(sf_dir)
        nq = len(want)
        mrr = sum(w["reciprocal_rank"] for w in want.values()) / nq
        ndcg = sum(w["ndcg_10"] for w in want.values()) / nq
        rec = sum(w["capped_recall_10"] for w in want.values()) / nq
        got = registry.REGISTRY["retrieval_eval_pipeline"](spark, sf_dir).first()
        assert got["n_queries"] == nq
        # the pipeline folds reciprocal ranks as 2^30 // rank integers and
        # the two ratios as floor-scaled pico-units — allow that quantization
        assert abs(got["mrr"] - mrr) < 1e-6
        assert abs(got["mean_ndcg_10"] - ndcg) < 1e-6
        assert abs(got["mean_capped_recall_10"] - rec) < 1e-6
