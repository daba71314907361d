"""Round-12 known-answer certification, wave 8 (the long tail).

Integer Lloyd k-means (both rounds replayed in exact arithmetic), the
Markov steady-state power iteration (per-term integer quotients), BFS
layer census, TRUE connected components (union-find vs the engine's
pointer-jumping fixpoint — convergence itself is what this certifies),
local clustering coefficients, Jaccard link prediction, PMI
collocations, character-entropy screening, the temperature mixture
recipe, the fixed-vocab coverage audit, and the per-source datasheet.
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


class TestIterativeWave8:
    def test_kmeans_iterate(self, spark, sf_dir):
        emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
        qt = {
            int(i): [math.floor(float(x) * 1048576.0) for x in a]
            for i, a in zip(emb["vec_id"], emb["embedding"])
        }
        cents = {c: qt[c] for c in sorted(qt) if c < 8}

        def assign(cmap):
            out = {}
            for v, qv in qt.items():
                best = None
                for c, cv in cmap.items():
                    d2 = sum((a - b) * (a - b) for a, b in zip(qv, cv))
                    if best is None or (d2, c) < best[:2]:
                        best = (d2, c)
                out[v] = best
            return out

        a1 = assign(cents)
        dim = len(next(iter(qt.values())))
        sums = defaultdict(lambda: [0] * dim)
        cnts = Counter()
        for v, (_, c) in a1.items():
            cnts[c] += 1
            for i, x in enumerate(qt[v]):
                sums[c][i] += x
        cents1 = {
            c: [math.floor(s / cnts[c]) for s in sums[c]] for c in sums
        }
        a2 = assign(cents1)
        per = defaultdict(lambda: [0, 0, None])
        for v, (d2, c) in a2.items():
            row = per[c]
            row[0] += 1
            row[1] += d2
            row[2] = v if row[2] is None else min(row[2], v)
        got = {r["cid"]: r for r in registry.REGISTRY["embed_kmeans_iterate"](spark, sf_dir).collect()}
        assert set(got) == set(per)
        for c, (n, inertia, mn) in per.items():
            r = got[c]
            assert (r["n_members"], r["inertia"], r["min_member"]) == (n, inertia, mn), c

    def test_markov_steady(self, spark, sf_dir):
        ev = pd.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["ts", "event_id", "user_id", "event_type"],
        ).sort_values(["user_id", "ts", "event_id"])
        cells = Counter()
        for _, grp in ev.groupby("user_id"):
            ets = grp["event_type"].to_list()
            cells.update(zip(ets, ets[1:]))
        r = Counter()
        for (i, _), c in cells.items():
            r[i] += c
        q30 = 1 << 30
        v = {i: q30 // len(r) for i in r}
        for _ in range(6):
            nv = defaultdict(int)
            for (i, j), c in cells.items():
                if i in v:
                    nv[j] += v[i] * c // r[i]
            v = dict(nv)
        tot = sum(v.values())
        got = {g["event_type"]: g for g in registry.REGISTRY["graph_markov_steady"](spark, sf_dir).collect()}
        assert set(got) == set(v)
        for t, q in v.items():
            assert got[t]["visits_q"] == q, t
            assert abs(got[t]["share"] - q / tot) < 1e-12, t

    def test_bfs_layers(self, spark, sf_dir):
        pairs = _copurchase_pairs(sf_dir, 2)
        adj = defaultdict(set)
        for u, v in pairs:
            adj[u].add(v)
            adj[v].add(u)
        src = min(u for u, _ in pairs)
        inf = 1 << 20
        d = {n: (0 if n == src else inf) for n in adj}
        for _ in range(6):
            d = {n: min(d[n], 1 + min(d[nb] for nb in adj[n])) for n in adj}
        buckets = defaultdict(lambda: [0, None])
        for n, dist in d.items():
            hop = -1 if dist > 6 else dist
            b = buckets[hop]
            b[0] += 1
            b[1] = n if b[1] is None else min(b[1], n)
        got = registry.REGISTRY["graph_bfs_layers"](spark, sf_dir).collect()
        assert {r["hop"] for r in got} == set(buckets)
        for r in got:
            n, mn = buckets[r["hop"]]
            assert (r["n_nodes"], r["min_node"]) == (n, mn), r["hop"]

    def test_connected_components(self, spark, sf_dir):
        pairs = _copurchase_pairs(sf_dir, 1)
        parent = {}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for u, v in pairs:
            parent.setdefault(u, u)
            parent.setdefault(v, v)
            ru, rv = find(u), find(v)
            if ru != rv:
                parent[max(ru, rv)] = min(ru, rv)
        comp = defaultdict(list)
        for n in parent:
            comp[find(n)].append(n)
        want = {min(ns): len(ns) for ns in comp.values()}
        got = {r["component"]: r["n_nodes"] for r in registry.REGISTRY["graph_connected_components"](spark, sf_dir).collect()}
        assert got == want


class TestGraphScoresWave8:
    def test_clustering_coefficient(self, spark, sf_dir):
        pairs = _copurchase_pairs(sf_dir, 2)
        adj = defaultdict(set)
        for u, v in pairs:
            adj[u].add(v)
            adj[v].add(u)
        tri = Counter()
        for u, v in pairs:
            for w in adj[u] & adj[v]:
                if w > v:
                    for n in (u, v, w):
                        tri[n] += 1
        rows = []
        for n, nbs in adj.items():
            d = len(nbs)
            if d >= 2:
                coeff = 2 * tri.get(n, 0) / (d * (d - 1))
                rows.append((n, d, tri.get(n, 0), coeff))
        rows.sort(key=lambda r: (-r[3], r[0]))
        want = rows[:20]
        got = registry.REGISTRY["graph_clustering_coefficient"](spark, sf_dir).collect()
        assert len(got) == len(want)
        for r, (n, d, t, coeff) in zip(got, want):
            assert (r["node"], r["d"], r["tri"]) == (n, d, t)
            assert abs(r["coeff"] - coeff) < 1e-6

    def test_jaccard_linkpred(self, spark, sf_dir):
        pairs = _copurchase_pairs(sf_dir, 2)
        eset = set(pairs)
        adj = defaultdict(set)
        for u, v in pairs:
            adj[u].add(v)
            adj[v].add(u)
        cand = []
        nodes = sorted(adj)
        cn_cnt = Counter()
        for n, nbs in adj.items():
            nl = sorted(nbs)
            for i, u in enumerate(nl):
                for v in nl[i + 1 :]:
                    cn_cnt[(u, v)] += 1
        for (u, v), cn in cn_cnt.items():
            du, dv = len(adj[u]), len(adj[v])
            # r13 scale-robust rule: min-degree floor, not a cn floor
            # (cn >= 2 went empty at sf0.1 as the graph sparsified)
            if min(du, dv) >= 2 and (u, v) not in eset:
                cand.append((cn / (du + dv - cn), u, v, cn, du, dv))
        cand.sort(key=lambda r: (-r[0], r[1], r[2]))
        want = cand[:10]
        got = registry.REGISTRY["graph_jaccard_linkpred"](spark, sf_dir).collect()
        assert len(got) == len(want)
        for r, (j, u, v, cn, du, dv) in zip(got, want):
            assert (r["u"], r["v"], r["cn"], r["du"], r["dv"]) == (u, v, cn, du, dv)
            assert abs(r["jaccard"] - j) < 1e-6


class TestTextTailWave8:
    def test_collocations_pmi(self, spark, sf_dir):
        import re as _re

        tok = _re.compile(r"[a-z0-9]+")
        d = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
        cb = Counter()
        for t in d["text"]:
            toks = tok.findall(t.lower())
            cb.update(zip(toks, toks[1:]))
        c1 = Counter()
        c2 = Counter()
        for (w1, w2), c in cb.items():
            c1[w1] += c
            c2[w2] += c
        n = sum(cb.values())
        scored = [
            (math.log(c * n / (c1[w1] * c2[w2])), w1, w2, c)
            for (w1, w2), c in cb.items()
            if c >= 5
        ]
        scored.sort(key=lambda r: (-r[0], r[1], r[2]))
        want = scored[:20]
        got = registry.REGISTRY["text_collocations_pmi"](spark, sf_dir).collect()
        assert len(got) == len(want)
        for r, (pmi, w1, w2, c) in zip(got, want):
            assert (r["w1"], r["w2"], r["c12"], r["c1"], r["c2"]) == (
                w1, w2, c, c1[w1], c2[w2],
            )
            assert abs(r["pmi"] - pmi) < 2e-6

    def test_char_entropy(self, spark, sf_dir):
        alphabet = [chr(c) for c in range(ord("a"), ord("z") + 1)] + [
            str(i) for i in range(10)
        ]
        d = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        rows = []
        for doc_id, t in zip(d["doc_id"], d["text"]):
            cs = [t.count(ch) for ch in alphabet]
            n = sum(cs)
            ent = -sum((c / n) * math.log(c / n) for c in cs if c > 0)
            rows.append((ent, int(doc_id), n))
        rows.sort()
        want = rows[:20]
        got = registry.REGISTRY["text_char_entropy"](spark, sf_dir).collect()
        assert len(got) == len(want)
        for r, (ent, doc_id, n) in zip(got, want):
            assert (r["doc_id"], r["n_alpha"]) == (doc_id, n)
            assert abs(r["entropy"] - ent) < 2e-6

    def test_mixture_temperature_weights(self, spark, sf_dir):
        import re as _re

        tok = _re.compile(r"[a-z0-9]+")
        d = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang", "text"])
        g = defaultdict(lambda: [0, 0])
        for lang, t in zip(d["lang"], d["text"]):
            row = g[lang]
            row[0] += 1
            row[1] += len(tok.findall(t.lower()))
        n_total = sum(r[1] for r in g.values())
        z = sum(math.sqrt(g[lang][1]) for lang in sorted(g))
        got = {r["lang"]: r for r in registry.REGISTRY["mixture_temperature_weights"](spark, sf_dir).collect()}
        assert set(got) == set(g)
        for lang, (nd, nt) in g.items():
            r = got[lang]
            assert (r["n_docs"], r["n_tokens"]) == (nd, nt), lang
            p = nt / n_total
            q = math.sqrt(nt) / z
            assert abs(r["p"] - p) < 1e-6, lang
            assert abs(r["q"] - q) < 1e-6, lang
            assert abs(r["boost"] - q / p) < 1e-5, lang

    def test_vocab_coverage(self, spark, sf_dir):
        d = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        freq = Counter()
        per_doc = {}
        for doc_id, t in zip(d["doc_id"], d["text"]):
            toks = t.strip().split()
            per_doc[int(doc_id)] = toks
            freq.update(toks)
        # K=20 (r12 fix: K=100 swallowed the whole 31-token vocabulary and
        # oov_rate was identically zero)
        vocab = set(
            sorted(freq, key=lambda w: (-freq[w], w))[:20]
        )
        got = {r["doc_id"]: r for r in registry.REGISTRY["vocab_coverage"](spark, sf_dir).collect()}
        assert set(got) == set(per_doc)
        for doc_id, toks in per_doc.items():
            n_in = sum(1 for w in toks if w in vocab)
            r = got[doc_id]
            assert (r["n_tokens"], r["n_in_vocab"]) == (len(toks), n_in), doc_id
            assert abs(r["oov_rate"] - (1.0 - n_in / len(toks))) < 1e-6, doc_id
        # the OOV column is live (r12 de-vacuuming)
        assert any(r["oov_rate"] > 0 for r in got.values())

    def test_corpus_datasheet(self, spark, sf_dir):
        d = pd.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["source", "lang", "text"]
        )
        prefix_cnt = Counter(t[:64] for t in d["text"])
        per = defaultdict(lambda: [0, 0, set(), 0])
        for src, lang, t in zip(d["source"], d["lang"], d["text"]):
            row = per[src]
            row[0] += 1
            row[1] += len(t.strip().split())
            row[2].add(lang)
            row[3] += int(prefix_cnt[t[:64]] > 1)
        got = {r["source"]: r for r in registry.REGISTRY["corpus_datasheet"](spark, sf_dir).collect()}
        assert set(got) == set(per)
        any_dup = 0
        for src, (nd, nt, langs, dups) in per.items():
            r = got[src]
            assert (r["n_docs"], r["n_tokens"], r["n_langs"], r["n_prefix_dup_docs"]) == (
                nd, nt, len(langs), dups,
            ), src
            assert abs(r["dup_frac"] - dups / nd) < 1e-6, src
            assert abs(r["avg_doc_tokens"] - nt / nd) < 1e-6, src
            any_dup += dups
        assert any_dup > 0  # the prefix screen must carry signal (probed)
