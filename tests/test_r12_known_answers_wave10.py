"""Round-12 known-answer certification, wave 10: sampling determinism,
IR weighting, and URL canonicalization.

The deterministic sampling family's whole point is exact independent
reproducibility — proven here by re-deriving every sample MEMBERSHIP
with hashlib (md5 / sha ranks): the global bottom-k reservoir, the
per-stratum 20% cut, the weighted mixture rates, and the class-balance
keeps (exact kept-id checksums). Plus TF-IDF top-5 terms per doc
(rational idf), the vocabulary builder, the repetition gate, DSIR
importance log-weights, and the full URL canonicalization rule chain
re-implemented from the documented rules (not the engine's regex
spelling). Pure Python from raw parquet, zero shared code.
"""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter, defaultdict
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd
import pytest

from wri_data_processing_spark import registry

registry.load_all()


def _docs(sf_dir, cols):
    return pd.read_parquet(f"{sf_dir}/documents.parquet", columns=cols)


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


class TestSamplingWave10:
    def test_reservoir_global(self, spark, sf_dir):
        d = _docs(sf_dir, ["doc_id", "lang", "source"])
        order = sorted(
            ((_md5(f"rsv:{int(i)}"), int(i)) for i in d["doc_id"])
        )[:100]
        got = registry.REGISTRY["sample_reservoir_global"](spark, sf_dir).collect()
        assert [r["doc_id"] for r in got] == [i for _, i in order]

    def test_sample_stratified(self, spark, sf_dir):
        d = _docs(sf_dir, ["doc_id", "lang", "text"])
        want = set()
        for lang, grp in d.groupby("lang"):
            rows = sorted((_md5(t), int(i)) for i, t in zip(grp["doc_id"], grp["text"]))
            cnt = len(rows)
            for rn, (_, doc_id) in enumerate(rows, start=1):
                if rn * 5 <= cnt:
                    want.add(doc_id)
        got = {r["doc_id"] for r in registry.REGISTRY["sample_stratified"](spark, sf_dir).collect()}
        assert got == want and want

    def test_mixture_sample(self, spark, sf_dir):
        weights = {"en": 4, "de": 2, "es": 2, "fr": 1, "zh": 1}
        d = _docs(sf_dir, ["doc_id", "lang", "text"])
        want = set()
        for lang, grp in d.groupby("lang"):
            w = weights.get(lang, 0)
            rows = sorted((_md5(t), int(i)) for i, t in zip(grp["doc_id"], grp["text"]))
            cnt = len(rows)
            for rn, (_, doc_id) in enumerate(rows, start=1):
                if rn * 10 <= cnt * w:
                    want.add(doc_id)
        got = {r["doc_id"] for r in registry.REGISTRY["mixture_sample"](spark, sf_dir).collect()}
        assert got == want and want

    def test_class_balance(self, spark, sf_dir):
        ev = pd.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_id", "event_type"]
        )
        counts = ev.groupby("event_type").size()
        target = int(counts.min())
        got = {r["event_type"]: r for r in registry.REGISTRY["sample_class_balance"](spark, sf_dir).collect()}
        for et, grp in ev.groupby("event_type"):
            ranked = sorted(
                (hashlib.sha256(f"bal:{int(i)}".encode()).hexdigest()[:16], int(i))
                for i in grp["event_id"]
            )
            kept = [i for _, i in ranked[:target]]
            r = got[et]
            assert (r["n_in"], r["n_kept"], r["kept_id_sum"]) == (
                len(grp), len(kept), sum(kept),
            ), et

    def test_dsir_weights(self, spark, sf_dir):
        tok = re.compile(r"[a-z0-9]+")
        d = _docs(sf_dir, ["doc_id", "lang", "text"])
        docs = [
            (int(i), lang, Counter(tok.findall(t.lower())))
            for i, lang, t in zip(d["doc_id"], d["lang"], d["text"])
        ]
        c_r = Counter()
        c_t = Counter()
        for _, lang, cd in docs:
            for w, c in cd.items():
                c_r[w] += c
                if lang == "en":
                    c_t[w] += c
        n_r = sum(c_r.values())
        n_t = sum(c_t.values())
        v = len(c_r)
        got = {r["doc_id"]: r for r in registry.REGISTRY["sample_dsir_weights"](spark, sf_dir).collect()}
        for doc_id, lang, cd in docs:
            if not cd:
                continue
            lw = sum(
                c
                * (
                    math.log((c_t.get(w, 0) + 1.0) / (n_t + v))
                    - math.log((c_r[w] + 1.0) / (n_r + v))
                )
                for w, c in cd.items()
            )
            r = got[doc_id]
            assert r["lang"] == lang and r["n_tokens"] == sum(cd.values()), doc_id
            assert abs(r["log_weight"] - lw) < 2e-6, doc_id


class TestIrAndUrlWave10:
    def test_tfidf_top5(self, spark, sf_dir):
        d = _docs(sf_dir, ["doc_id", "text"])
        tf = defaultdict(Counter)
        df = Counter()
        for doc_id, t in zip(d["doc_id"], d["text"]):
            toks = t.strip().split()
            tf[int(doc_id)].update(toks)
            df.update(set(toks))
        n_docs = len(d)
        got = defaultdict(list)
        for r in registry.REGISTRY["text_tfidf"](spark, sf_dir).collect():
            got[r["doc_id"]].append((r["tok"], r["tf"], r["df"], r["tfidf"]))
        assert set(got) == set(tf)
        for doc_id, cd in tf.items():
            scored = sorted(
                (
                    (-c * (n_docs + 1.0) / (df[w] + 1.0), w, c)
                    for w, c in cd.items()
                )
            )[:5]
            rows = sorted(got[doc_id], key=lambda r: (-r[3], r[0]))
            assert [(w, c) for _, w, c in scored] == [(r[0], r[1]) for r in rows], doc_id
            for (s, w, _), r in zip(scored, rows):
                assert r[2] == df[w], (doc_id, w)
                assert abs(r[3] - (-s)) < 1e-9, (doc_id, w)

    def test_vocab_top_terms(self, spark, sf_dir):
        d = _docs(sf_dir, ["doc_id", "text"])
        freq = Counter()
        docf = Counter()
        for _, t in zip(d["doc_id"], d["text"]):
            toks = t.strip().split()
            freq.update(toks)
            docf.update(set(toks))
        want = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
        got = registry.REGISTRY["vocab_top_terms"](spark, sf_dir).collect()
        assert [(r["tok"], r["freq"]) for r in got] == want
        for r in got:
            assert r["doc_freq"] == docf[r["tok"]], r["tok"]

    def test_text_repetition(self, spark, sf_dir):
        d = _docs(sf_dir, ["doc_id", "text"])
        got = {r["doc_id"]: r for r in registry.REGISTRY["text_repetition"](spark, sf_dir).collect()}
        for doc_id, t in zip(d["doc_id"], d["text"]):
            cd = Counter(t.strip().split())
            n = sum(cd.values())
            uniq = len(cd)
            top = max(cd.values())
            r = got[int(doc_id)]
            assert (r["n_tokens"], r["n_unique"], r["top_count"]) == (n, uniq, top), doc_id
            assert abs(r["top_frac"] - top / n) < 1e-12, doc_id
            assert abs(r["dup_frac"] - (n - uniq) / n) < 1e-12, doc_id
            assert r["flagged"] == (top / n > 0.12), doc_id

    def test_url_canonical(self, spark, sf_dir):
        d = _docs(sf_dir, ["doc_id"])

        def synth(i):
            gid, site, page = i // 4, (i // 4) % 10, (i // 4) % 7
            m = i % 4
            if m == 0:
                return f"https://www.site{site}.example.com/docs/{gid}?page={page}&ref=home"
            if m == 1:
                return f"HTTPS://WWW.SITE{site}.EXAMPLE.COM/docs/{gid}?page={page}&ref=home#section2"
            if m == 2:
                return (f"https://www.site{site}.example.com/docs/{gid}"
                        f"?ref=home&utm_source=feed&page={page}&utm_campaign=x")
            return (f"https://www.site{site}.example.com:443/docs/{gid}/"
                    f"?page={page}&ref=home&fbclid=abc")

        def canon(url):
            url = url.split("#", 1)[0]
            m = re.match(r"^([^/]*//[^/?]+)(.*)$", url)
            url = m.group(1).lower() + m.group(2)
            url = re.sub(r"^(https://[^/:?]+):443", r"\1", url)
            if "?" in url:
                path, qs = url.split("?", 1)
            else:
                path, qs = url, ""
            path = re.sub(r"/$", "", path)
            keep = sorted(
                p for p in qs.split("&")
                if p and not re.match(r"^(utm_[a-z]+|fbclid|gclid)=", p)
            )
            return path + ("?" + "&".join(keep) if keep else "")

        groups = defaultdict(list)
        for i in d["doc_id"]:
            groups[canon(synth(int(i)))].append(int(i))
        got = {r["canonical_url"]: r for r in registry.REGISTRY["dedup_url_canonical"](spark, sf_dir).collect()}
        assert set(got) == set(groups)
        for url, ids in groups.items():
            r = got[url]
            assert (r["n_copies"], r["keeper_doc_id"]) == (len(ids), min(ids)), url
        # the rule chain must actually merge variants (4 surface forms/group)
        assert any(len(ids) >= 4 for ids in groups.values())


class TestIntegerFixedPointsWave11:
    def test_embed_pca_power(self, spark, sf_dir):
        """Bit-exact replay of the 3-round integer power iteration: Q20
        quantize, int second-moment matrix, decimal matvec, renormalize
        by max|y| with TRUNCATE-toward-zero division (Spark decimal div /
        DuckDB HUGEINT // — NOT Python's floor //)."""
        emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["embedding"])
        qvs = [
            [math.floor(float(x) * 1048576.0) for x in a] for a in emb["embedding"]
        ]
        dim = len(qvs[0])
        C = [[0] * dim for _ in range(dim)]
        for qv in qvs:
            for i in range(dim):
                qi = qv[i]
                row = C[i]
                for j in range(dim):
                    row[j] += qi * qv[j]

        def trunc_div(a, b):
            q = abs(a) // b
            return q if a >= 0 else -q

        x = [1048576] * dim
        for _ in range(3):
            y = [sum(C[i][j] * x[j] for j in range(dim)) for i in range(dim)]
            m = max(abs(v) for v in y)
            x = [trunc_div(v * 1048576, m) for v in y]
        got = registry.REGISTRY["embed_pca_power"](spark, sf_dir).collect()
        assert [r["component"] for r in got] == list(range(dim))
        assert [r["loading_q"] for r in got] == x

    def test_sim_ann_sq8(self, spark, sf_dir):
        emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
        vecs = {int(i): [float(x) for x in a] for i, a in zip(emb["vec_id"], emb["embedding"])}
        labels = {int(i): l for i, l in zip(emb["vec_id"], emb["label"])}
        dim = len(vecs[0])
        mns = [min(v[i] for v in vecs.values()) for i in range(dim)]
        mxs = [max(v[i] for v in vecs.values()) for i in range(dim)]

        def q8(v):
            return [
                0 if mxs[i] == mns[i]
                else math.floor((v[i] - mns[i]) / (mxs[i] - mns[i]) * 255.0 + 0.5)
                for i in range(dim)
            ]

        codes = {vid: q8(v) for vid, v in vecs.items()}
        qc = [2 * c - 255 for c in codes[0]]
        scored = sorted(
            (
                (-sum((2 * c - 255) * q for c, q in zip(codes[vid], qc)), vid)
                for vid in vecs
                if vid != 0
            )
        )
        pool = scored[:50]

        def norm(v):
            acc = 0.0
            for x in v:
                acc += x * x
            return math.sqrt(acc)

        qv = vecs[0]
        nq = norm(qv)

        def cos6(vid):
            acc = 0.0
            for x, y in zip(vecs[vid], qv):
                acc += x * y
            return float(
                Decimal(repr(acc / (norm(vecs[vid]) * nq))).quantize(
                    Decimal("0.000001"), ROUND_HALF_UP
                )
            )

        rer = sorted(((-cos6(vid), vid, -s) for s, vid in pool))[:10]
        got = registry.REGISTRY["sim_ann_sq8"](spark, sf_dir).collect()
        assert [(r["vec_id"], r["approx_score"], r["cosine_sim"]) for r in got] == [
            (vid, sc, -c) for c, vid, sc in rer
        ]
        for r in got:
            assert r["label"] == labels[r["vec_id"]]
