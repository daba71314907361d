"""Round-12 known-answer certification, wave 9: the dedup/similarity
core (sha-based, so exactly replicable) plus the quality-gate scalars.

dedup_minhash_lsh is the marquee target: the full probabilistic pipeline
— sha-slice base hash, all 16 declared permutations, 4x4 banding,
candidate generation INCLUDING banding false positives, and the
signature-match estimate — re-derived from raw parquet with hashlib and
Python ints, byte-for-byte. SimHash signatures and bands likewise.
Also: exact-dup groups, the top-10 cosine serving cut, the PPS-WOR
sample (Efraimidis-Spirakis keys re-derived), Gopher rules, the
composite quality score, and the normalization fingerprint (md5 twin).
"""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter, defaultdict
from decimal import ROUND_HALF_UP, Decimal

import numpy as np
import pandas as pd
import pytest

from wri_data_processing_spark import registry

registry.load_all()

_P = 2147483647
_PERMS = [(999999937 + 2 * k, (k * 1000000007) % _P) for k in range(16)]


def _round_half_up(x: float, nd: int) -> float:
    q = Decimal(1).scaleb(-nd)
    return float(Decimal(repr(x)).quantize(q, ROUND_HALF_UP))


def _sha60(s: str) -> int:
    return int(hashlib.sha256(s.encode()).hexdigest()[:15], 16)


def _docs(sf_dir, cols):
    return pd.read_parquet(f"{sf_dir}/documents.parquet", columns=cols)


class TestDedupCoreWave9:
    def test_dedup_exact(self, spark, sf_dir):
        d = _docs(sf_dir, ["doc_id", "text"])
        groups = defaultdict(list)
        for doc_id, t in zip(d["doc_id"], d["text"]):
            groups[hashlib.sha256(t.encode()).hexdigest()].append(int(doc_id))
        got = {r["text_hash"]: r for r in registry.REGISTRY["dedup_exact"](spark, sf_dir).collect()}
        assert set(got) == set(groups)
        for h, ids in groups.items():
            assert (got[h]["keeper_id"], got[h]["n_copies"]) == (min(ids), len(ids)), h

    def test_dedup_minhash_lsh(self, spark, sf_dir):
        d = _docs(sf_dir, ["doc_id", "text"])
        reps = {}
        for doc_id, t in zip(d["doc_id"], d["text"]):
            if t not in reps or doc_id < reps[t]:
                reps[t] = int(doc_id)
        sigs = {}
        for t, doc_id in reps.items():
            toks = t.strip().split()
            if len(toks) < 3:
                continue
            shingles = {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
            hs = [_sha60(s) % _P for s in shingles]
            sigs[doc_id] = [min((a * h + b) % _P for h in hs) for a, b in _PERMS]
        bands = defaultdict(list)
        for doc_id, m in sigs.items():
            for j in range(4):
                key = (j, ",".join(str(m[4 * j + r]) for r in range(4)))
                bands[key].append(doc_id)
        cands = set()
        for ids in bands.values():
            ids = sorted(ids)
            for i, a in enumerate(ids):
                for b in ids[i + 1 :]:
                    cands.add((a, b))
        want = {}
        for a, b in cands:
            e = sum(1 for x, y in zip(sigs[a], sigs[b]) if x == y) / 16.0
            if e >= 0.25:
                want[(a, b)] = _round_half_up(e, 4)
        got = {
            (r["doc_a"], r["doc_b"]): r["jaccard_est"]
            for r in registry.REGISTRY["dedup_minhash_lsh"](spark, sf_dir).collect()
        }
        assert got == want and want

    def test_dedup_simhash(self, spark, sf_dir):
        d = _docs(sf_dir, ["doc_id", "text"])
        want = {}
        for doc_id, t in zip(d["doc_id"], d["text"]):
            votes = [0] * 60
            for tok in t.strip().split():  # occurrences, not distinct
                h = _sha60(tok)
                for b in range(60):
                    votes[b] += 1 if (h >> b) & 1 else -1
            sig = sum(1 << b for b in range(60) if votes[b] > 0)
            want[int(doc_id)] = (
                sig,
                (sig >> 0) & 32767,
                (sig >> 15) & 32767,
                (sig >> 30) & 32767,
                (sig >> 45) & 32767,
            )
        got = {r["doc_id"]: r for r in registry.REGISTRY["dedup_simhash"](spark, sf_dir).collect()}
        assert set(got) == set(want)
        for doc_id, (sig, b0, b1, b2, b3) in want.items():
            r = got[doc_id]
            assert (r["simhash"], r["band0"], r["band1"], r["band2"], r["band3"]) == (
                sig, b0, b1, b2, b3,
            ), doc_id

    def test_sim_topk(self, spark, sf_dir):
        emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
        vecs = {int(i): [float(x) for x in a] for i, a in zip(emb["vec_id"], emb["embedding"])}
        labels = {int(i): l for i, l in zip(emb["vec_id"], emb["label"])}

        def norm(v):
            acc = 0.0
            for x in v:
                acc += x * x
            return math.sqrt(acc)

        qv = vecs[0]
        nq = norm(qv)
        scored = []
        for v, vec in vecs.items():
            if v == 0:
                continue
            acc = 0.0
            for x, y in zip(vec, qv):
                acc += x * y
            scored.append((-_round_half_up(acc / (norm(vec) * nq), 6), v))
        scored.sort()
        want = scored[:10]
        got = registry.REGISTRY["sim_topk"](spark, sf_dir).collect()
        assert [(r["vec_id"], r["cosine_sim"]) for r in got] == [
            (v, -s) for s, v in want
        ]
        for r in got:
            assert r["label"] == labels[r["vec_id"]]


class TestQualityGatesWave9:
    def test_gopher_rules(self, spark, sf_dir):
        d = _docs(sf_dir, ["doc_id", "text"])
        alpha = re.compile(r"^[a-z]+$")
        stops = {"the", "a", "of", "to", "and", "in"}
        got = {r["doc_id"]: r for r in registry.REGISTRY["text_gopher_rules"](spark, sf_dir).collect()}
        for doc_id, t in zip(d["doc_id"], d["text"]):
            toks = t.strip().split()
            n = len(toks)
            sum_len = sum(len(w) for w in toks)
            n_alpha = sum(1 for w in toks if alpha.match(w))
            n_stop = len({w for w in toks if w in stops})
            r = got[int(doc_id)]
            assert (r["n_tokens"], r["sum_len"], r["n_alpha"], r["n_stop"]) == (
                n, sum_len, n_alpha, n_stop,
            ), doc_id
            rules = (
                10 <= n <= 100000,
                3 * n <= sum_len <= 10 * n,
                5 * n_alpha >= 4 * n,
                n_stop >= 2,
            )
            assert (r["rule_len"], r["rule_wordlen"], r["rule_alpha"], r["rule_stop"]) == rules, doc_id
            assert r["passes"] == all(rules), doc_id

    def test_text_quality(self, spark, sf_dir):
        d = _docs(sf_dir, ["doc_id", "text"])
        punct = re.compile(r"[.,!?;:]")
        got = {r["doc_id"]: r for r in registry.REGISTRY["text_quality"](spark, sf_dir).collect()}
        for doc_id, t in zip(d["doc_id"], d["text"]):
            n_tok = len(t.strip().split())
            n_chars = len(t)
            pr = len(punct.findall(t)) / max(n_chars, 1)
            score = (
                0.4 * min(n_tok / 50.0, 1.0)
                + 0.3 * (1.0 - pr)
                + 0.3 * min(n_chars / 200.0, 1.0)
            )
            assert abs(got[int(doc_id)]["quality_score"] - score) < 1e-12, doc_id

    def test_text_fingerprint(self, spark, sf_dir):
        d = _docs(sf_dir, ["doc_id", "text"])
        got = {r["doc_id"]: r["fingerprint"] for r in registry.REGISTRY["text_fingerprint"](spark, sf_dir).collect()}
        for doc_id, t in zip(d["doc_id"], d["text"]):
            norm = re.sub(r"\s+", " ", t.lower()).strip()
            assert got[int(doc_id)] == hashlib.md5(norm.encode()).hexdigest(), doc_id

    def test_sample_ppswor(self, spark, sf_dir):
        o = pd.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
        )
        keys = []
        for k, p in zip(o["o_orderkey"], o["o_totalprice"]):
            u = _sha60(f"pps:{int(k)}") % 1073741824
            key = -math.log((u + 1) / 1073741826.0) / float(p)
            keys.append((key, int(k), float(p)))
        keys.sort()
        want = keys[:20]
        got = registry.REGISTRY["sample_ppswor"](spark, sf_dir).collect()
        assert [(r["o_orderkey"]) for r in got] == [k for _, k, _ in want]
        for r, (key, k, p) in zip(got, want):
            assert float(r["o_totalprice"]) == p, k
            # ROUND-12 keys are live (~1e-7); the old ROUND-6 column was
            # identically zero and this check was vacuously loose
            assert abs(r["pps_key"] - key) < 1e-12, k
            assert r["pps_key"] > 0, k
