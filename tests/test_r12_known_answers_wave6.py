"""Round-12 known-answer certification, wave 6 (closing the program).

The remaining dq/events relational surface plus the two composed checks:
duplicate-payment banding, FK orphans, the expectation suite, absence
alerts, audience-overlap Jaccard, the cohort LTV curve, cumulative
distinct users, the 24h-windowed funnel (greedy-earliest), gaps-and-
islands streaks, sessionization, the 1-hour RANGE rolling window
(ties-as-peers replicated), hourly top-3, onboarding paths, the
click->purchase attribution join, Benjamini-Hochberg over the
permutation p-values, and the IVF ANN recall gate (assignment, probe
and both rankings re-derived with the exact left-fold cosine).
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


def _us(ts: pd.Series) -> pd.Series:
    return (ts - pd.Timestamp(0)) // pd.Timedelta(microseconds=1)


_ONE_DAY = pd.Timedelta(days=1).to_pytimedelta()


class TestDqWave6:
    def test_duplicate_payments(self, spark, sf_dir):
        o = pd.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_custkey", "o_totalprice", "o_orderkey", "o_orderdate"],
        )
        o = o.assign(band=(o["o_totalprice"] / 1000.0).apply(math.floor))
        pairs = []
        for (ck, band), grp in o.groupby(["o_custkey", "band"]):
            rows = sorted(
                zip(grp["o_orderkey"], grp["o_totalprice"], grp["o_orderdate"])
            )
            for i, (k1, a1, d1) in enumerate(rows):
                for k2, a2, d2 in rows[i + 1 :]:
                    gap = abs((pd.Timestamp(d2) - pd.Timestamp(d1)).days)
                    if gap <= 365:
                        pairs.append((int(ck), int(band), int(k1), int(k2), a1, a2, gap))
        pairs.sort()
        want = pairs[:50]
        got = registry.REGISTRY["dq_duplicate_payments"](spark, sf_dir).collect()
        assert len(got) == len(want)
        for r, (ck, band, k1, k2, a1, a2, gap) in zip(got, want):
            assert (r["custkey"], r["band"], r["k1"], r["k2"], r["gap_days"]) == (
                ck, band, k1, k2, gap,
            )
            assert float(r["amount1"]) == float(a1) and float(r["amount2"]) == float(a2)

    def test_referential_orphans(self, spark, sf_dir):
        li = pd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"])
        orders = pd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"])
        cust = pd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])
        part = pd.read_parquet(f"{sf_dir}/part.parquet", columns=["p_partkey"])
        nation = pd.read_parquet(f"{sf_dir}/nation.parquet", columns=["n_nationkey"])
        want = {
            "lineitem.orderkey->orders": int((~li["l_orderkey"].isin(orders["o_orderkey"])).sum()),
            "lineitem.partkey->part": int((~li["l_partkey"].isin(part["p_partkey"])).sum()),
            "orders.custkey->customer": int((~orders["o_custkey"].isin(cust["c_custkey"])).sum()),
            "customer.nationkey->nation": int((~cust["c_nationkey"].isin(nation["n_nationkey"])).sum()),
        }
        got = {r["check_name"]: r["orphans"] for r in registry.REGISTRY["dq_referential_orphans"](spark, sf_dir).collect()}
        assert got == want

    def test_expectations(self, spark, sf_dir):
        li = pd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_quantity", "l_discount", "l_returnflag", "l_tax"],
        )
        o = pd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_totalprice"])
        c = pd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_name"])
        want = {
            "lineitem.quantity_in_1_50": (
                len(li),
                int((li["l_quantity"].isna() | (li["l_quantity"] < 1) | (li["l_quantity"] > 50)).sum()),
            ),
            "lineitem.discount_in_0_0.1": (
                len(li),
                int((li["l_discount"].isna() | (li["l_discount"] < 0) | (li["l_discount"] > 0.1)).sum()),
            ),
            "lineitem.returnflag_in_set": (
                len(li),
                int((~li["l_returnflag"].isin(["A", "N", "R"]) | li["l_returnflag"].isna()).sum()),
            ),
            "lineitem.tax_in_0_0.08": (
                len(li),
                int((li["l_tax"].isna() | (li["l_tax"] < 0) | (li["l_tax"] > 0.08)).sum()),
            ),
            "orders.totalprice_positive": (
                len(o),
                int((o["o_totalprice"].isna() | (o["o_totalprice"] <= 0)).sum()),
            ),
            "customer.name_not_null": (
                len(c),
                int((c["c_name"].isna() | (c["c_name"].str.strip() == "")).sum()),
            ),
        }
        got = {
            r["rule"]: (r["rows_checked"], r["violations"])
            for r in registry.REGISTRY["dq_expectations"](spark, sf_dir).collect()
        }
        assert got == want


class TestEventsRelationalWave6:
    def test_absence_alert(self, spark, sf_dir):
        ev = _events(sf_dir, ["ts", "user_id", "event_type"])
        day = ev["ts"].dt.date
        maxd = day.max()
        cut = maxd - 7 * _ONE_DAY
        want = []
        for (uid, et), grp in ev.assign(d=day).groupby(["user_id", "event_type"]):
            before = {d for d in grp["d"] if d <= cut}
            last7 = sum(1 for d in grp["d"] if d > cut)
            if len(before) >= 5 and last7 == 0:
                last_seen = max(grp["d"])
                want.append(
                    ((maxd - last_seen).days, int(uid), et, len(before), str(last_seen))
                )
        want.sort(key=lambda r: (-r[0], r[1], r[2]))
        got = registry.REGISTRY["events_absence_alert"](spark, sf_dir).collect()
        assert len(got) == len(want)
        for r, (silent, uid, et, nb, ls) in zip(got, want):
            assert (r["user_id"], r["event_type"]) == (uid, et)
            assert (r["days_before"], r["last_seen"], r["days_silent"]) == (nb, ls, silent)

    def test_audience_overlap(self, spark, sf_dir):
        ev = _events(sf_dir, ["user_id", "event_type"])
        sets = {et: set(grp["user_id"]) for et, grp in ev.groupby("event_type")}
        got = registry.REGISTRY["events_audience_overlap"](spark, sf_dir).collect()
        types = sorted(sets)
        want_pairs = {
            (a, b)
            for i, a in enumerate(types)
            for b in types[i + 1 :]
            if sets[a] & sets[b]
        }
        assert {(r["type_a"], r["type_b"]) for r in got} == want_pairs
        for r in got:
            a, b = r["type_a"], r["type_b"]
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            assert (r["n_a"], r["n_b"], r["n_both"]) == (len(sets[a]), len(sets[b]), inter)
            assert abs(r["jaccard"] - inter / union) < 1e-12

    def test_cohort_ltv(self, spark, sf_dir):
        ev = _events(sf_dir, ["ts", "user_id", "event_type", "value"])
        week = ev["ts"].dt.normalize() - pd.to_timedelta(ev["ts"].dt.dayofweek, unit="D")
        fw = week.groupby(ev["user_id"]).min()
        pur = ev[(ev["event_type"] == "purchase") & ev["value"].notna()]
        cells = defaultdict(Decimal)
        for uid, w, v in zip(pur["user_id"], week[pur.index], pur["value"]):
            f = fw[uid]
            cells[(f.strftime("%Y-%m-%d"), (w - f).days // 7)] += _q6(v)
        got = registry.REGISTRY["events_cohort_ltv"](spark, sf_dir).collect()
        assert {(r["cohort_week"], r["week_n"]) for r in got} == set(cells)
        cum = defaultdict(Decimal)
        # rows come back ordered (cohort_week, week_n)
        for r in got:
            k = (r["cohort_week"], r["week_n"])
            cum[k[0]] += cells[k]
            assert abs(r["revenue"] - float(cells[k])) < 1e-6, k
            assert abs(r["ltv_cum"] - float(cum[k[0]])) < 1e-6, k

    def test_cumulative_distinct(self, spark, sf_dir):
        ev = _events(sf_dir, ["ts", "user_id"])
        day = ev["ts"].dt.date
        d0 = day.groupby(ev["user_id"]).min()
        new_per_day = Counter(d0)
        days = sorted(set(day))
        got = {r["day"]: r for r in registry.REGISTRY["events_cumulative_distinct"](spark, sf_dir).collect()}
        assert set(got) == {str(d) for d in days}
        cum = 0
        for d in days:
            cum += new_per_day.get(d, 0)
            r = got[str(d)]
            assert (r["new_users"], r["cum_users"]) == (new_per_day.get(d, 0), cum), d

    def test_funnel_windowed(self, spark, sf_dir):
        ev = _events(sf_dir, ["ts", "user_id", "event_type"])
        us = _us(ev["ts"])
        ev = ev.assign(us=us)
        day_us = 24 * 3600 * 1000000
        t0 = ev[ev["event_type"] == "signup"].groupby("user_id")["us"].min()
        s1 = {}
        clicks = ev[ev["event_type"] == "click"]
        for uid, grp in clicks.groupby("user_id"):
            if uid in t0.index:
                win = grp[(grp["us"] > t0[uid]) & (grp["us"] <= t0[uid] + day_us)]
                if len(win):
                    s1[uid] = int(win["us"].min())
        s2 = 0
        purch = ev[ev["event_type"] == "purchase"]
        for uid, grp in purch.groupby("user_id"):
            if uid in s1:
                win = grp[(grp["us"] > s1[uid]) & (grp["us"] <= s1[uid] + day_us)]
                if len(win):
                    s2 += 1
        got = {r["stage"]: r["n_users"] for r in registry.REGISTRY["events_funnel_windowed"](spark, sf_dir).collect()}
        assert got == {"signup": len(t0), "click_24h": len(s1), "purchase_24h": s2}

    def test_gaps_islands(self, spark, sf_dir):
        ev = _events(sf_dir, ["ts", "user_id"])
        got = {r["user_id"]: r for r in registry.REGISTRY["events_gaps_islands"](spark, sf_dir).collect()}
        for uid, grp in ev.groupby("user_id"):
            days = sorted(set(grp["ts"].dt.date))
            streaks = []
            run = 1
            for a, b in zip(days, days[1:]):
                if (b - a).days == 1:
                    run += 1
                else:
                    streaks.append(run)
                    run = 1
            streaks.append(run)
            r = got[int(uid)]
            assert (r["n_streaks"], r["longest_streak"]) == (len(streaks), max(streaks)), uid

    def test_sessionize(self, spark, sf_dir):
        ev = _events(sf_dir, ["ts", "event_id", "user_id"])
        ev = ev.assign(us=_us(ev["ts"])).sort_values(["user_id", "ts", "event_id"])
        want = {}
        for uid, grp in ev.groupby("user_id"):
            idx = 0
            prev = None
            sess = defaultdict(list)
            for u in grp["us"]:
                if prev is None or u - prev > 1_800_000_000:
                    idx += 1
                sess[idx].append(int(u))
                prev = u
            for si, us_list in sess.items():
                want[(int(uid), si)] = (
                    len(us_list), min(us_list), max(us_list),
                    (max(us_list) - min(us_list)) / 1e6,
                )
        got = registry.REGISTRY["events_sessionize"](spark, sf_dir).collect()
        assert {(r["user_id"], r["session_idx"]) for r in got} == set(want)
        for r in got:
            n, lo, hi, dur = want[(r["user_id"], r["session_idx"])]
            assert (r["n_events"], r["session_start_us"], r["session_end_us"]) == (n, lo, hi)
            assert abs(r["duration_sec"] - dur) < 1e-9

    def test_rolling_window(self, spark, sf_dir):
        ev = _events(sf_dir, ["ts", "event_id", "user_id", "value"])
        ev = ev.assign(us=_us(ev["ts"]))
        got = {r["event_id"]: r for r in registry.REGISTRY["events_rolling_window"](spark, sf_dir).collect()}
        for uid, grp in ev.groupby("user_id"):
            us = grp["us"].to_numpy()
            vals = grp["value"].to_numpy()
            for eid, u in zip(grp["event_id"], grp["us"]):
                m = (us >= u - 3_600_000_000) & (us <= u)  # ties-as-peers
                r = got[int(eid)]
                assert r["n_prev_hour"] == int(m.sum()), eid
                s = float(np.nansum(vals[m].astype(float)))
                assert abs(r["sum_prev_hour"] - s) < 1e-6, eid

    def test_windowed_topk(self, spark, sf_dir):
        ev = _events(sf_dir, ["ts", "event_type"])
        hour = ev["ts"].dt.floor("h")
        cnt = Counter(zip(hour, ev["event_type"]))
        want = {}
        for h in sorted(set(hour)):
            rows = sorted(
                ((et, n) for (hh, et), n in cnt.items() if hh == h),
                key=lambda r: (-r[1], r[0]),
            )[:3]
            want[h.strftime("%Y-%m-%d %H:%M:%S")] = rows
        got = defaultdict(list)
        for r in registry.REGISTRY["events_windowed_topk"](spark, sf_dir).collect():
            got[r["hour_bucket"]].append((r["event_type"], r["n"]))
        assert set(got) == set(want)
        for h, rows in want.items():
            assert sorted(got[h], key=lambda r: (-r[1], r[0])) == rows, h

    def test_path_analysis(self, spark, sf_dir):
        ev = _events(sf_dir, ["ts", "event_id", "user_id", "event_type"])
        ev = ev.sort_values(["user_id", "ts", "event_id"])
        paths = Counter(
            ">".join(grp["event_type"].head(5)) for _, grp in ev.groupby("user_id")
        )
        want = sorted(paths.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
        got = registry.REGISTRY["events_path_analysis"](spark, sf_dir).collect()
        assert [(r["path"], r["n_users"]) for r in got] == want

    def test_attribution_join(self, spark, sf_dir):
        ev = _events(sf_dir, ["ts", "event_id", "user_id", "event_type", "value"])
        ev = ev.assign(us=_us(ev["ts"]))
        want = set()
        for uid, grp in ev.groupby("user_id"):
            clicks = grp[grp["event_type"] == "click"]
            purch = grp[grp["event_type"] == "purchase"]
            for cid, cu in zip(clicks["event_id"], clicks["us"]):
                for pid, pu, amt in zip(purch["event_id"], purch["us"], purch["value"]):
                    if cu < pu <= cu + 30 * 60 * 1000000:
                        want.add((int(uid), int(cid), int(pid),
                                  None if pd.isna(amt) else float(amt)))
        got = {
            (r["user_id"], r["click_id"], r["purchase_id"],
             None if r["amount"] is None else float(r["amount"]))
            for r in registry.REGISTRY["events_attribution_join"](spark, sf_dir).collect()
        }
        assert got == want and want


class TestComposedWave6:
    def test_fdr_bh(self, spark, sf_dir):
        # re-derive the permutation p-values (wave-4 reference), then BH
        def sha_u(key):
            return int(hashlib.sha256(key.encode()).hexdigest()[:15], 16) % 1073741824

        ev = _events(sf_dir, ["event_id", "user_id", "event_type", "value"])
        ev = ev[ev["value"].notna()]
        pvals = {}
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
                    if sha_u(f"p:{eid}:{b}") * (n_a + n_b) < n_a * 1073741824:
                        swa += y; ka += 1
                    else:
                        swb += y; kb += 1
                if ka and kb and abs(float(swa) / ka - float(swb) / kb) >= abs(diff_obs):
                    n_ext += 1
            pvals[et] = (1 + n_ext) / 33.0
        order = sorted(pvals, key=lambda e: (pvals[e], e))
        m = len(order)
        kstar = 0
        for i, et in enumerate(order, start=1):
            if pvals[et] <= i * 0.10 / m:
                kstar = i
        got = registry.REGISTRY["stats_fdr_bh"](spark, sf_dir).collect()
        assert [r["event_type"] for r in got] == order
        for i, r in enumerate(got, start=1):
            assert r["rank"] == i
            assert abs(r["p_value"] - pvals[r["event_type"]]) < 1e-12
            assert abs(r["bh_threshold"] - i * 0.10 / m) < 1e-12
            assert r["rejected"] == (i <= kstar)

    def test_eval_ann_recall(self, spark, sf_dir):
        emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
        vecs = {int(i): [float(x) for x in a] for i, a in zip(emb["vec_id"], emb["embedding"])}

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

        cents = [i for i in sorted(vecs) if i < 8]
        queries = [i for i in sorted(vecs) if i % 64 == 0]
        assigned = {
            v: min(cents, key=lambda c: (-cos6(v, c), c)) for v in vecs
        }
        got = {r["qid"]: r for r in registry.REGISTRY["eval_ann_recall"](spark, sf_dir).collect()}
        assert set(got) == set(queries)
        for q in queries:
            probes = set(
                sorted(cents, key=lambda c: (-cos6(q, c), c))[:2]
            )
            pool = sorted(
                ((-cos6(q, v), v) for v in vecs if v != q)
            )
            exact10 = {v for _, v in pool[:10]}
            cand = [(s, v) for s, v in pool if assigned[v] in probes]
            ann10 = {v for _, v in cand[:10]}
            hits = len(exact10 & ann10)
            r = got[q]
            assert r["hits_10"] == hits, q
            assert abs(r["ann_recall_10"] - hits / 10.0) < 1e-6, q
