"""Round-12 known-answer certification, wave 12: the formula-bearing ops
the program had not yet re-derived independently.

Pure Python / pandas / Decimal from raw parquet, zero shared code:
per-source Gini impurity, the pairwise Jensen-Shannon source-divergence
matrix (with its closed-form disjoint-mass terms), Neyman-optimal
stratified allocation including the largest-remainder rounding, the
interval-coverage sweep line, per-dimension embedding moments over the
2^20 quantization grid, Pareto cumulative shares in exact decimal,
backlog aging buckets, and a bit-exact bigint replay of personalized
PageRank's seeded Q30 fixed point (the wave-7 pagerank treatment for the
restart-restricted variant).
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from decimal import ROUND_HALF_UP, Decimal

import numpy as np
import pandas as pd

from wri_data_processing_spark import registry

registry.load_all()


def _dec6(x) -> Decimal:
    # CAST(DOUBLE AS DECIMAL(_,6)): exact binary value, HALF_UP at scale 6
    return Decimal(x).quantize(Decimal("0.000001"), ROUND_HALF_UP)


class TestCorpusDiversityGini:
    def test_known_answer(self, spark, sf_dir):
        d = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["source", "lang"])
        got = {
            r["source"]: r
            for r in registry.REGISTRY["corpus_diversity_gini"](spark, sf_dir).collect()
        }
        assert set(got) == set(d["source"].unique())
        for source, grp in d.groupby("source"):
            counts = grp["lang"].value_counts()
            total = int(counts.sum())
            sum_sq = int((counts**2).sum())
            r = got[source]
            assert r["total"] == total
            assert r["n_langs"] == len(counts)
            assert r["gini_impurity"] == 1.0 - sum_sq * 1.0 / (total * total)


class TestSourceDivergence:
    def test_known_answer(self, spark, sf_dir):
        import re

        d = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["source", "text"])
        tf = defaultdict(Counter)
        for source, text in zip(d["source"], d["text"]):
            tf[source].update(re.split(r"\s+", text.strip()))
        n = {s: sum(c.values()) for s, c in tf.items()}
        scored = []
        for sa in sorted(tf):
            for sb in sorted(tf):
                if sa >= sb:
                    continue
                shared = sorted(set(tf[sa]) & set(tf[sb]))
                if not shared:
                    continue
                na, nb = n[sa], n[sb]
                ta = 0.0
                for t in shared:
                    pa, pb = tf[sa][t] / na, tf[sb][t] / nb
                    ta += pa * math.log(2.0 * pa / (pa + pb))
                tb = 0.0
                for t in shared:
                    pa, pb = tf[sa][t] / na, tf[sb][t] / nb
                    tb += pb * math.log(2.0 * pb / (pa + pb))
                sa_mass = sum(tf[sa][t] for t in shared)
                sb_mass = sum(tf[sb][t] for t in shared)
                jsd = 0.5 * (
                    ta
                    + (na - sa_mass) / na * math.log(2.0)
                    + tb
                    + (nb - sb_mass) / nb * math.log(2.0)
                )
                scored.append((round(jsd, 6), sa, sb))
        scored.sort(key=lambda t: (-t[0], t[1], t[2]))
        want = scored[:10]
        rows = registry.REGISTRY["text_source_divergence"](spark, sf_dir).collect()
        assert len(rows) == len(want)
        for r, (jsd, sa, sb) in zip(rows, want):
            assert (r["src_a"], r["src_b"]) == (sa, sb)
            assert abs(r["jsd"] - jsd) <= 2e-6, (r, jsd)


class TestNeymanAllocation:
    def test_known_answer(self, spark, sf_dir):
        ev = pd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "value"])
        ev = ev[ev["value"].notna()]
        strata = []
        for et in sorted(ev["event_type"].unique()):
            vals = [_dec6(float(v)) for v in ev.loc[ev["event_type"] == et, "value"]]
            nn = len(vals)
            s = sum(vals)
            ss = sum(v * v for v in vals)
            strata.append((et, nn, s, ss))
        ws = [
            float(nn)
            * math.sqrt(
                (float(nn) * float(ss) - float(s) * float(s))
                / (float(nn) * float(nn - 1))
            )
            for (_, nn, s, ss) in strata
        ]
        wt = sum(ws)  # left fold, matching the engines' ordered list sum
        budget = 1000
        fs = [math.floor(budget * w / wt) for w in ws]
        fr = [budget * w / wt - math.floor(budget * w / wt) for w in ws]
        rem = budget - sum(fs)
        alloc = []
        for i, f in enumerate(fr):
            pos = sum(
                1 for j, g in enumerate(fr) if g > f or (g == f and j < i)
            )
            alloc.append(fs[i] + (1 if pos < rem else 0))
        assert sum(alloc) == budget  # largest-remainder closure
        got = {
            r["event_type"]: r
            for r in registry.REGISTRY["sample_stratified_neyman"](spark, sf_dir).collect()
        }
        for (et, nn, _, _), w, a in zip(strata, ws, alloc):
            r = got[et]
            assert r["n_pop"] == nn
            assert r["n_alloc"] == a
            assert abs(r["sigma"] - round(w / nn, 6)) <= 1e-6


class TestIntervalCoverage:
    def test_known_answer(self, spark, sf_dir):
        ev = pd.read_parquet(
            f"{sf_dir}/events.parquet", columns=["user_id", "event_id", "ts"]
        )
        # pandas surfaces the parquet TIMESTAMP as datetime64[us]; floor to
        # epoch seconds exactly like the engines' integer casts
        unit = {"datetime64[us]": 10**6, "datetime64[ns]": 10**9}[str(ev["ts"].dtype)]
        ev["s"] = (ev["ts"].astype("int64") // unit).astype(int)
        want = {}
        for uid, grp in ev.groupby("user_id"):
            ivs = sorted(zip(grp["s"], grp["event_id"]))
            islands = []
            cur_s = cur_e = None
            for s, _ in ivs:
                en = s + 300
                if cur_e is None or s > cur_e:
                    if cur_e is not None:
                        islands.append((cur_s, cur_e))
                    cur_s, cur_e = s, en
                else:
                    cur_e = max(cur_e, en)
            islands.append((cur_s, cur_e))
            want[int(uid)] = (len(islands), sum(e - s for s, e in islands))
        got = {
            r["user_id"]: (r["n_active_windows"], r["covered_sec"])
            for r in registry.REGISTRY["events_interval_coverage"](spark, sf_dir).collect()
        }
        assert got == want


class TestEmbedDimStats:
    def test_known_answer(self, spark, sf_dir):
        e = pd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["embedding"])
        mat = np.stack(e["embedding"].to_numpy()).astype(np.float64)
        q = np.floor(mat * 1048576.0).astype(np.int64)
        rows = registry.REGISTRY["embed_dim_stats"](spark, sf_dir).collect()
        assert len(rows) == q.shape[1]
        for r in rows:
            col = q[:, r["dim"]]
            n = len(col)
            s = int(col.sum())
            sq = int((col.astype(object) ** 2).sum())
            assert (r["n"], r["s"], r["sq"]) == (n, s, sq)
            mean = s / n / 1048576.0
            var = (sq - s * s / n) / n / (1048576.0 * 1048576.0)
            assert abs(r["mean"] - round(mean, 6)) <= 1e-6
            assert abs(r["variance"] - round(var, 6)) <= 1e-6


class TestParetoShare:
    def test_known_answer(self, spark, sf_dir):
        o = pd.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
        )
        c = pd.read_parquet(
            f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
        )
        m = o.merge(c, left_on="o_custkey", right_on="c_custkey")
        rev = defaultdict(Decimal)
        for seg, cust, tp in zip(m["c_mktsegment"], m["o_custkey"], m["o_totalprice"]):
            rev[(seg, int(cust))] += _dec6(float(tp))
        got = {
            (r["c_mktsegment"], r["o_custkey"]): r
            for r in registry.REGISTRY["agg_pareto_share"](spark, sf_dir).collect()
        }
        assert set(got) == set(rev)
        by_seg = defaultdict(list)
        for (seg, cust), rv in rev.items():
            by_seg[seg].append((rv, cust))
        for seg, entries in by_seg.items():
            entries.sort(key=lambda t: (-t[0], t[1]))
            total = sum(rv for rv, _ in entries)
            running = Decimal(0)
            for rnk, (rv, cust) in enumerate(entries, start=1):
                running += rv
                r = got[(seg, cust)]
                assert r["rnk"] == rnk
                assert r["revenue"] == float(rv)
                # ROUND-6 since r14 (cast audit): the share's operands are
                # segment-scale decimal sums whose double casts diverge by
                # one ULP across engines above 2^53 scaled.
                assert abs(r["cum_share"] - float(running) / float(total)) <= 5e-7


class TestBacklogAging:
    def test_known_answer(self, spark, sf_dir):
        o = pd.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderstatus", "o_orderdate", "o_totalprice"],
        )
        asof = o["o_orderdate"].max()
        open_o = o[o["o_orderstatus"] != "F"]
        want = defaultdict(lambda: [0, Decimal(0)])
        for st, dt, tp in zip(
            open_o["o_orderstatus"], open_o["o_orderdate"], open_o["o_totalprice"]
        ):
            age = (pd.Timestamp(asof) - pd.Timestamp(dt)).days
            bucket = (
                "0-30" if age <= 30 else "31-90" if age <= 90
                else "91-365" if age <= 365 else "365+"
            )
            cell = want[(st, bucket)]
            cell[0] += 1
            cell[1] += _dec6(float(tp))
        got = {
            (r["o_orderstatus"], r["bucket"]): r
            for r in registry.REGISTRY["orders_backlog_aging"](spark, sf_dir).collect()
        }
        assert set(got) == set(want)
        for key, (n, val) in want.items():
            assert got[key]["n_orders"] == n
            assert got[key]["open_value"] == float(val)


class TestPersonalizedPagerank:
    def test_bit_exact_replay(self, spark, sf_dir):
        li = pd.read_parquet(
            f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
        ).drop_duplicates()
        adj = defaultdict(set)
        for _, grp in li.groupby("l_orderkey"):
            parts = sorted(set(int(p) for p in grp["l_partkey"]))
            for i, u in enumerate(parts):
                for v in parts[i + 1 :]:
                    adj[u].add(v)
                    adj[v].add(u)
        deg = {n: len(nbs) for n, nbs in adj.items()}
        q30 = 1 << 30
        teleport = 161_061_273  # floor(0.15 * 2^30), restated
        rq = {n: (q30 if n % 100 == 0 else 0) for n in adj}
        for _ in range(5):
            recv = defaultdict(int)
            for n, nbs in adj.items():
                c = rq[n] // deg[n]
                for nb in nbs:
                    recv[nb] += c
            rq = {
                n: (teleport if n % 100 == 0 else 0) + (17 * recv.get(n, 0)) // 20
                for n in adj
            }
        want = {n: q for n, q in rq.items() if q > 0}
        got = {
            r["node"]: r
            for r in registry.REGISTRY["graph_personalized_pagerank"](spark, sf_dir).collect()
        }
        assert set(got) == set(want)
        for n, q in want.items():
            assert got[n]["ppr_q"] == q, n
            assert got[n]["ppr"] == q / q30, n
