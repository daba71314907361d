"""Round-12 known-answer certification, wave 5.

The windowed/relational analytics surface: offline CUSUM scan, DAU/WAU
stickiness (trailing-7-day distinct via coverage explode — replicated
here as a literal per-day set union), cohort retention triangle,
conversion-latency histogram, time-weighted averages, Markov transition
matrix, sweep-line peak concurrency, day-of-week profile, day-over-day
anomaly flags, velocity alert top-10, the Q-Q decile table, and the
new-vs-returning split. Pure Python references from raw parquet.
"""

from __future__ import annotations

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


_ONE_DAY = pd.Timedelta(days=1).to_pytimedelta()


class TestSeriesWave5:
    def test_events_cusum(self, spark, sf_dir):
        ev = _events(sf_dir, ["ts"])
        c = Counter(ev["ts"].dt.date)
        days = sorted(c)
        n_days = len(days)
        s_all = sum(c.values())
        mean = s_all / n_days
        prefix = 0
        want = []
        for t, d in enumerate(days, start=1):
            prefix += c[d]
            want.append((str(d), c[d], prefix - t * mean))
        peak = max(abs(v) for _, _, v in want)
        got = {r["day"]: r for r in registry.REGISTRY["events_cusum"](spark, sf_dir).collect()}
        assert len(got) == n_days
        for day, n, cus in want:
            r = got[day]
            assert r["n"] == n, day
            assert abs(r["cusum"] - cus) < 1e-9, day
            assert r["is_peak"] == (abs(cus) == peak), day

    def test_stickiness(self, spark, sf_dir):
        ev = _events(sf_dir, ["ts", "user_id"])
        ud = defaultdict(set)
        for uid, d in zip(ev["user_id"], ev["ts"].dt.date):
            ud[d].add(uid)
        got = {r["day"]: r for r in registry.REGISTRY["events_stickiness"](spark, sf_dir).collect()}
        assert len(got) == len(ud)
        for d, users in ud.items():
            wau = set()
            for back in range(0, 7):
                wau |= ud.get(d - back * _ONE_DAY, set())
            r = got[str(d)]
            assert (r["dau"], r["wau"]) == (len(users), len(wau)), d
            assert abs(r["stickiness"] - len(users) / len(wau)) < 1e-12, d

    def test_retention_cohorts(self, spark, sf_dir):
        ev = _events(sf_dir, ["ts", "user_id"])
        # Monday-truncated weeks (both engines' date_trunc('week'))
        week = ev["ts"].dt.normalize() - pd.to_timedelta(
            ev["ts"].dt.dayofweek, unit="D"
        )
        first_week = week.groupby(ev["user_id"]).min()
        cells = defaultdict(set)
        for uid, w in zip(ev["user_id"], week):
            fw = first_week[uid]
            cells[(fw.strftime("%Y-%m-%d"), (w - fw).days // 7)].add(uid)
        got = registry.REGISTRY["events_retention_cohorts"](spark, sf_dir).collect()
        assert {(r["cohort_week"], r["week_n"]) for r in got} == set(cells)
        for r in got:
            k = (r["cohort_week"], r["week_n"])
            assert r["active_users"] == len(cells[k]), k

    def test_new_vs_returning(self, spark, sf_dir):
        ev = _events(sf_dir, ["ts", "user_id"])
        day = ev["ts"].dt.date
        d0 = day.groupby(ev["user_id"]).min()
        per = defaultdict(lambda: [0, 0])
        for uid, d in zip(ev["user_id"], day):
            per[d][0 if d == d0[uid] else 1] += 1
        want_days = sorted(per)[:14]
        got = registry.REGISTRY["events_new_vs_returning"](spark, sf_dir).collect()
        assert [r["d"] for r in got] == [str(d) for d in want_days]
        for r, d in zip(got, want_days):
            new, ret = per[d]
            assert (r["new_events"], r["returning_events"]) == (new, ret), d
            assert abs(r["new_frac"] - new / (new + ret)) < 1e-6, d

    def test_day_over_day_anomaly(self, spark, sf_dir):
        ev = _events(sf_dir, ["ts", "event_type"])
        c = Counter(zip(ev["event_type"], ev["ts"].dt.date))
        want = {}
        for et in {k[0] for k in c}:
            days = sorted(d for (e, d) in c if e == et)
            for prev, cur in zip(days, days[1:]):
                pn, n = c[(et, prev)], c[(et, cur)]
                pct = (n - pn) / pn
                want[(et, str(cur))] = (n, pn, pct, abs(pct) > 0.5)
        got = registry.REGISTRY["dq_day_over_day_anomaly"](spark, sf_dir).collect()
        assert {(r["event_type"], r["day"]) for r in got} == set(want)
        for r in got:
            n, pn, pct, an = want[(r["event_type"], r["day"])]
            assert (r["n"], r["prev_n"]) == (n, pn)
            assert abs(r["pct_change"] - pct) < 1e-12
            assert r["anomaly"] == an

    def test_seasonality_dow(self, spark, sf_dir):
        ev = _events(sf_dir, ["ts", "value"])
        dow = ev["ts"].dt.dayofweek + 1
        got = {r["iso_dow"]: r for r in registry.REGISTRY["events_seasonality_dow"](spark, sf_dir).collect()}
        for d in sorted(dow.unique()):
            m = dow == d
            n = int(m.sum())
            # exact-decimal sum / count(*) — NaN values drop from the sum
            # but stay in the count (engine convention)
            sx = float(ev.loc[m, "value"].dropna().sum())
            r = got[int(d)]
            assert r["n"] == n, d
            assert abs(r["avg_value"] - sx / n) < 1e-9, d


class TestBehaviorWave5:
    def test_conversion_latency(self, spark, sf_dir):
        ev = _events(sf_dir, ["ts", "user_id", "event_type"])
        us = (ev["ts"] - pd.Timestamp(0)) // pd.Timedelta(microseconds=1)
        ev = ev.assign(us=us)
        buckets = defaultdict(list)
        for uid, grp in ev.groupby("user_id"):
            clicks = grp.loc[grp["event_type"] == "click", "us"]
            purch = grp.loc[grp["event_type"] == "purchase", "us"]
            for cu in clicks:
                for pu in purch:
                    lat = pu - cu
                    if 0 < lat <= 30 * 60 * 1000000:
                        buckets[lat // 300000000].append(lat)
        got = {r["bucket_5min"]: r for r in registry.REGISTRY["events_conversion_latency"](spark, sf_dir).collect()}
        assert set(got) == set(buckets)
        for b, lats in buckets.items():
            r = got[b]
            assert r["n_conversions"] == len(lats), b
            assert (r["min_latency_us"], r["max_latency_us"]) == (min(lats), max(lats)), b

    def test_time_weighted_avg(self, spark, sf_dir):
        ev = _events(sf_dir, ["ts", "event_id", "user_id", "value"])
        secs = (ev["ts"] - pd.Timestamp(0)) // pd.Timedelta(seconds=1)
        ev = ev.assign(sec=secs).sort_values(["user_id", "ts", "event_id"])
        got = {r["user_id"]: r for r in registry.REGISTRY["events_time_weighted_avg"](spark, sf_dir).collect()}
        want = {}
        for uid, grp in ev.groupby("user_id"):
            s = grp["sec"].to_list()
            vs = grp["value"].to_list()
            num = den = 0.0
            for i in range(len(s) - 1):
                dt = s[i + 1] - s[i]
                den += dt
                if pd.notna(vs[i]):
                    num += float(vs[i]) * dt
            if den > 0:
                want[int(uid)] = (num / den, int(den))
        assert set(got) == set(want)
        for uid, (twa, tot) in want.items():
            r = got[uid]
            assert r["total_sec"] == tot, uid
            assert abs(r["twa_value"] - twa) < 1e-6, uid

    def test_transition_matrix(self, spark, sf_dir):
        ev = _events(sf_dir, ["ts", "event_id", "user_id", "event_type"])
        ev = ev.sort_values(["user_id", "ts", "event_id"])
        cnt = Counter()
        for _, grp in ev.groupby("user_id"):
            ets = grp["event_type"].to_list()
            cnt.update(zip(ets, ets[1:]))
        row_tot = Counter()
        for (a, _), n in cnt.items():
            row_tot[a] += n
        got = registry.REGISTRY["events_transition_matrix"](spark, sf_dir).collect()
        assert {(r["from_type"], r["to_type"]) for r in got} == set(cnt)
        for r in got:
            k = (r["from_type"], r["to_type"])
            assert r["n_pairs"] == cnt[k], k
            assert abs(r["prob"] - cnt[k] / row_tot[k[0]]) < 1e-12, k

    def test_peak_concurrency(self, spark, sf_dir):
        ev = _events(sf_dir, ["ts"])
        us = (ev["ts"] - pd.Timestamp(0)) // pd.Timedelta(microseconds=1)
        net = Counter()
        for t in us:
            net[int(t)] += 1
            net[int(t) + 5 * 60 * 1000000] -= 1
        cum = 0
        per_day = defaultdict(lambda: (float("-inf"), 0))
        for t in sorted(net):
            cum += net[t]
            day = str(pd.Timestamp(t, unit="us").date())
            peak, nb = per_day[day]
            per_day[day] = (max(peak, cum), nb + 1)
        got = {r["day"]: r for r in registry.REGISTRY["events_peak_concurrency"](spark, sf_dir).collect()}
        assert set(got) == set(per_day)
        for day, (peak, nb) in per_day.items():
            r = got[day]
            assert (r["peak_concurrent"], r["n_boundaries"]) == (peak, nb), day

    def test_velocity_alert(self, spark, sf_dir):
        ev = _events(sf_dir, ["ts", "user_id"])
        hr = ev["ts"].dt.floor("h")
        per = Counter(zip(ev["user_id"], hr))
        agg = defaultdict(lambda: [0, 0, 0])
        for (uid, _), n in per.items():
            a = agg[int(uid)]
            a[0] = max(a[0], n)
            a[1] += n
            a[2] += 1
        order = sorted(agg, key=lambda u: (-agg[u][0], u))[:10]
        got = registry.REGISTRY["events_velocity_alert"](spark, sf_dir).collect()
        assert [r["user_id"] for r in got] == order
        for r in got:
            peak, tot, hrs = agg[r["user_id"]]
            assert (r["peak_hour_events"], r["total_events"], r["active_hours"]) == (
                peak, tot, hrs,
            ), r["user_id"]
            assert abs(r["peak_pct"] - peak * 100 / tot) < 1e-12, r["user_id"]

    def test_qq_table(self, spark, sf_dir):
        ev = _events(sf_dir, ["event_type", "value"])
        ev = ev[ev["value"].notna() & ev["event_type"].isin(["view", "click"])]

        def deciles(vs):
            cnt = Counter(vs)
            n = len(vs)
            out = {}
            cum = 0
            ks = list(range(1, 10))
            for v in sorted(cnt):
                cum += cnt[v]
                for k in ks[:]:
                    if 10 * cum >= k * n:
                        out[k] = v
                        ks.remove(k)
            return out

        qv = deciles(ev.loc[ev["event_type"] == "view", "value"].to_list())
        qc = deciles(ev.loc[ev["event_type"] == "click", "value"].to_list())
        got = registry.REGISTRY["stats_qq_table"](spark, sf_dir).collect()
        assert [r["decile"] for r in got] == list(range(1, 10))
        for r in got:
            k = r["decile"]
            assert r["q_view"] == qv[k] and r["q_click"] == qc[k], k
            assert abs(r["qq_diff"] - (qv[k] - qc[k])) < 1e-12, k
