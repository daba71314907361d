"""Round-12 known-answer certification, wave 7: the graph and text-IR
families.

The iterative integer fixed-point ops are the interesting targets here —
graph_pagerank's Q30 scatter/gather, graph_hits' renormalized half-steps
and graph_kcore's peel trajectory are replicated EXACTLY in Python
bigints (the integer disciplines make bit-exact independent replication
possible — that is the point of the disciplines), alongside global
transitivity, degree assortativity, the Zipf rank-frequency OLS, the
Heaps' vocabulary-growth deciles, and the three-term BM25 ranking.
Pure Python/numpy from raw parquet, zero shared code.
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


def _copurchase_pairs(sf_dir, min_support):
    li = pd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).drop_duplicates()
    pair_cnt = Counter()
    for _, grp in li.groupby("l_orderkey"):
        parts = sorted(set(grp["l_partkey"]))
        for i, u in enumerate(parts):
            for v in parts[i + 1 :]:
                pair_cnt[(int(u), int(v))] += 1
    return [p for p, c in pair_cnt.items() if c >= min_support]


class TestGraphWave7:
    def test_pagerank(self, spark, sf_dir):
        pairs = _copurchase_pairs(sf_dir, 1)
        adj = defaultdict(list)
        for u, v in pairs:
            adj[u].append(v)
            adj[v].append(u)
        deg = {n: len(nbs) for n, nbs in adj.items()}
        q30 = 1 << 30
        teleport = 161_061_273  # floor(0.15 * 2^30), restated
        rq = {n: q30 for n in adj}
        for _ in range(5):
            recv = defaultdict(int)
            for n, nbs in adj.items():
                c = rq[n] // deg[n]
                for nb in nbs:
                    recv[nb] += c
            rq = {n: teleport + (17 * s) // 20 for n, s in recv.items()}
        got = {r["node"]: r for r in registry.REGISTRY["graph_pagerank"](spark, sf_dir).collect()}
        assert set(got) == set(rq)
        for n, q in rq.items():
            assert got[n]["rank_q"] == q, n
            assert got[n]["rank"] == q / q30, n

    def test_transitivity(self, spark, sf_dir):
        pairs = _copurchase_pairs(sf_dir, 2)
        eset = set(pairs)
        adj = defaultdict(set)
        for u, v in pairs:
            adj[u].add(v)
            adj[v].add(u)
        # triangles counted once (u<v<w all connected)
        t = 0
        for u, v in pairs:
            for w in adj[u] & adj[v]:
                if w > v:
                    t += 1
        w2 = sum(d * (d - 1) for d in (len(s) for s in adj.values()))
        got = registry.REGISTRY["graph_transitivity"](spark, sf_dir).first()
        assert got["n_triangles"] == t
        assert got["n_wedges"] == w2 // 2
        assert abs(got["transitivity"] - 6 * t / w2) < 1e-6

    def test_degree_assortativity(self, spark, sf_dir):
        pairs = _copurchase_pairs(sf_dir, 2)
        deg = Counter()
        for u, v in pairs:
            deg[u] += 1
            deg[v] += 1
        xs, ys = [], []
        for u, v in pairs:  # both directions of every edge
            xs += [deg[u], deg[v]]
            ys += [deg[v], deg[u]]
        x, y = np.array(xs, float), np.array(ys, float)
        m = len(x)
        r = (m * (x * y).sum() - x.sum() * y.sum()) / (
            math.sqrt(m * (x * x).sum() - x.sum() ** 2)
            * math.sqrt(m * (y * y).sum() - y.sum() ** 2)
        )
        got = registry.REGISTRY["graph_degree_assortativity"](spark, sf_dir).first()
        assert got["n_directed_edges"] == m
        assert abs(got["assortativity"] - r) < 1e-5

    def test_kcore_trajectory(self, spark, sf_dir):
        edges = set(_copurchase_pairs(sf_dir, 2))
        want = []
        for rnd in range(1, 7):
            deg = Counter()
            for u, v in edges:
                deg[u] += 1
                deg[v] += 1
            keep = {n for n, d in deg.items() if d >= 4}
            edges = {(u, v) for u, v in edges if u in keep and v in keep}
            nodes = {n for e in edges for n in e}
            want.append((rnd, len(nodes), len(edges)))
        got = registry.REGISTRY["graph_kcore"](spark, sf_dir).collect()
        assert [(r["round"], r["n_nodes"], r["n_edges"]) for r in got] == want
        # the trajectory must reach its fixpoint inside the round budget
        assert want[-1][1:] == want[-2][1:]

    def test_hits(self, spark, sf_dir):
        o = pd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"])
        li = pd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"])
        e = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
        edges = {(int(c), int(p)) for c, p in zip(e["o_custkey"], e["l_partkey"])}
        q30 = 1 << 30

        def normalize(raw):
            tot = sum(raw.values())
            return {k: v * q30 // tot for k, v in raw.items()}

        a1 = normalize(
            {p: sum(1 for _, pp in edges if pp == p) * q30
             for p in {p for _, p in edges}}
        )
        h1 = normalize(
            {c: sum(a1[p] for cc, p in edges if cc == c)
             for c in {c for c, _ in edges}}
        )
        a2 = normalize(
            {p: sum(h1[c] for c, pp in edges if pp == p)
             for p in {p for _, p in edges}}
        )
        top_a = sorted(a2, key=lambda p: (-a2[p], p))[:15]
        top_h = sorted(h1, key=lambda c: (-h1[c], c))[:15]
        got = registry.REGISTRY["graph_hits"](spark, sf_dir).collect()
        ga = [(r["id"], r["score_q"]) for r in got if r["side"] == "authority"]
        gh = [(r["id"], r["score_q"]) for r in got if r["side"] == "hub"]
        assert ga == [(p, a2[p]) for p in top_a]
        assert gh == [(c, h1[c]) for c in top_h]
        for r in got:
            assert r["score"] == r["score_q"] / q30


class TestTextIRWave7:
    def test_zipf_slope(self, spark, sf_dir):
        d = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
        tf = Counter()
        for t in d["text"]:
            tf.update(t.strip().split())
        ordered = sorted(tf.items(), key=lambda kv: (-kv[1], kv[0]))
        v = len(ordered)
        n_tokens = sum(tf.values())
        lx = [math.log(i) for i in range(1, v + 1)]
        ly = [math.log(f) for _, f in ordered]
        sx, sy = sum(lx), sum(ly)
        sxx = sum(x * x for x in lx)
        sxy = sum(x * y for x, y in zip(lx, ly))
        slope = (v * sxy - sx * sy) / (v * sxx - sx * sx)
        intercept = (sy - slope * sx) / v
        got = registry.REGISTRY["text_zipf_slope"](spark, sf_dir).first()
        assert (got["n_vocab"], got["n_tokens"]) == (v, n_tokens)
        assert abs(got["slope"] - slope) < 1e-5
        assert abs(got["intercept"] - intercept) < 1e-4
        # the corpus-health reading: a Zipf-ish decay must be negative
        assert got["slope"] < 0

    def test_heaps_law(self, spark, sf_dir):
        d = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        nd = int(d["doc_id"].max()) + 1
        first_doc = {}
        tok_per_dec = Counter()
        for doc_id, t in sorted(zip(d["doc_id"], d["text"])):
            dec = min(int(doc_id) * 10 // nd, 9)
            toks = t.strip().split()
            tok_per_dec[dec] += len(toks)
            for w in toks:
                if w not in first_doc:
                    first_doc[w] = int(doc_id)
        new_types = Counter(min(fd * 10 // nd, 9) for fd in first_doc.values())
        got = registry.REGISTRY["text_heaps_law"](spark, sf_dir).collect()
        assert [r["decile"] for r in got] == sorted(tok_per_dec)
        vocab_cum = tokens_cum = 0
        for r in got:
            dec = r["decile"]
            assert r["n_tokens"] == tok_per_dec[dec], dec
            assert r["new_types"] == new_types.get(dec, 0), dec
            # INCLUSIVE cumulative (DuckDB rs[1:i] slices through i)
            vocab_cum += new_types.get(dec, 0)
            tokens_cum += tok_per_dec[dec]
            assert (r["vocab_cum"], r["tokens_cum"]) == (vocab_cum, tokens_cum), dec

    def test_bm25_rank(self, spark, sf_dir):
        d = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        terms = ["spark", "join", "vector"]
        rows = []
        for doc_id, t in zip(d["doc_id"], d["text"]):
            toks = t.strip().split()
            rows.append(
                (int(doc_id), len(toks), *[toks.count(q) for q in terms])
            )
        n_docs = len(rows)
        sum_dl = sum(r[1] for r in rows)
        avg_dl = sum_dl / n_docs
        dfs = [sum(1 for r in rows if r[2 + i] > 0) for i in range(3)]
        scored = []
        for doc_id, dl, *tfs in rows:
            if sum(tfs) == 0:
                continue
            s = 0.0
            for i, tf in enumerate(tfs):
                idf = math.log(1.0 + (n_docs - dfs[i] + 0.5) / (dfs[i] + 0.5))
                s += idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avg_dl))
            scored.append((doc_id, dl, tfs[0], tfs[1], tfs[2], _round6(s), s))
        scored.sort(key=lambda r: (-r[6], r[0]))
        want = scored[:20]
        got = registry.REGISTRY["text_bm25_rank"](spark, sf_dir).collect()
        assert len(got) == len(want)
        for r, w in zip(got, want):
            assert (r["doc_id"], r["dl"], r["tf1"], r["tf2"], r["tf3"]) == w[:5]
            assert abs(r["score"] - w[6]) < 2e-6
