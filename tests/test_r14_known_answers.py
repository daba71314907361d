"""r14 known-answer tests: pure-Python replays of the two new ops
(retrieval_hybrid_rrf, eval_bleu) — independent arithmetic, not the
engine's or the oracle's expression trees (the Wilcoxon-catch house rule).
"""

from __future__ import annotations

import math
import re
from collections import Counter

import pandas as pd

from wri_data_processing_spark import registry
from wri_data_processing_spark.queries.llm_pipeline import (
    _RRF_DEPTH,
    _RRF_K0,
    _RRF_W,
)

registry.load_all()


def _toks(text: str) -> list[str]:
    # Engine/oracle convention (ADVICE r14): split(trim('')) yields [''] on
    # BOTH engines, so an empty/whitespace-only doc contributes ONE
    # empty-string unigram — the replay must count it too, not return [].
    return re.split(r"\s+", text.strip())


class TestEvalBleu:
    def _replay(self, sf_dir):
        docs = pd.read_parquet(f"{sf_dir}/documents.parquet")[["doc_id", "text"]]
        cand: dict[int, dict[int, Counter]] = {}
        ref: dict[int, dict[int, Counter]] = {}
        for _, row in docs.iterrows():
            pair, side = int(row.doc_id) // 2, int(row.doc_id) % 2
            toks = _toks(row.text)
            tgt = cand if side == 1 else ref
            by_n = tgt.setdefault(pair, {})
            for n in (1, 2, 3, 4):
                by_n[n] = Counter(
                    " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
                )
        m = {n: 0 for n in (1, 2, 3, 4)}
        t = {n: 0 for n in (1, 2, 3, 4)}
        ref_tokens = 0
        for pair in set(cand) | set(ref):
            c_by_n = cand.get(pair, {n: Counter() for n in (1, 2, 3, 4)})
            r_by_n = ref.get(pair, {n: Counter() for n in (1, 2, 3, 4)})
            ref_tokens += sum(r_by_n[1].values())
            for n in (1, 2, 3, 4):
                t[n] += sum(c_by_n[n].values())
                m[n] += sum(
                    min(cnt, r_by_n[n].get(g, 0)) for g, cnt in c_by_n[n].items()
                )
        c_len = t[1]
        bp = 1.0 if c_len >= ref_tokens else math.exp(1.0 - ref_tokens / c_len)
        bleu = bp * math.exp(
            sum(math.log((m[n] + 1.0) / (t[n] + 1.0)) for n in (1, 2, 3, 4)) / 4.0
        )
        return m, t, ref_tokens, bp, bleu

    def test_corpus_bleu_replay(self, spark, sf_dir):
        m, t, ref_tokens, bp, bleu = self._replay(sf_dir)
        got = registry.REGISTRY["eval_bleu"](spark, sf_dir).collect()
        assert len(got) == 1
        r = got[0]
        for n in (1, 2, 3, 4):
            assert r[f"m{n}"] == m[n], f"m{n}"
            assert r[f"t{n}"] == t[n], f"t{n}"
        assert r["ref_tokens"] == ref_tokens
        assert abs(r["bp"] - bp) < 5e-7  # emitted ROUND-6
        assert abs(r["bleu"] - bleu) < 5e-7

    def test_liveness_and_clipping(self, spark, sf_dir):
        """The fixture must be LIVE at every tested n: unigram matches are
        plentiful, and every precision is a real fraction (0 < m_n <= t_n) at
        least for n=1..2; clipping must bite (m1 < t1 — the candidate corpus
        is not a subset-permutation of the references)."""
        r = registry.REGISTRY["eval_bleu"](spark, sf_dir).collect()[0]
        assert r["t4"] > 0  # 4-grams exist
        assert 0 < r["m1"] < r["t1"]
        assert 0 < r["m2"] <= r["t2"]
        assert 0.0 < r["bleu"] < 1.0

    def test_hand_computed_fixture(self):
        """Hand fixture: cand='a b a c', ref='a b b d' (one pair).
        unigrams: cand {a:2,b:1,c:1}, ref {a:1,b:2,d:1} -> m1=min(2,1)+min(1,2)=2, t1=4.
        bigrams: cand {ab,ba,ac}, ref {ab,bb,bd} -> m2=1, t2=3.
        trigrams: cand {aba,bac} ref {abb,bbd} -> m3=0, t3=2.
        4-grams: cand {abac} ref {abbd} -> m4=0, t4=1. c=r=4 -> bp=1."""
        cand, ref = ["a", "b", "a", "c"], ["a", "b", "b", "d"]
        m, t = {}, {}
        for n in (1, 2, 3, 4):
            cc = Counter(" ".join(cand[i : i + n]) for i in range(len(cand) - n + 1))
            rc = Counter(" ".join(ref[i : i + n]) for i in range(len(ref) - n + 1))
            m[n] = sum(min(v, rc.get(g, 0)) for g, v in cc.items())
            t[n] = sum(cc.values())
        assert (m[1], t[1], m[2], t[2], m[3], t[3], m[4], t[4]) == (
            2, 4, 1, 3, 0, 2, 0, 1,
        )
        bleu = 1.0 * math.exp(
            sum(math.log((m[n] + 1) / (t[n] + 1)) for n in (1, 2, 3, 4)) / 4.0
        )
        expected = math.exp(
            (math.log(3 / 5) + math.log(2 / 4) + math.log(1 / 3) + math.log(1 / 2))
            / 4.0
        )
        assert abs(bleu - expected) < 1e-12


class TestRetrievalHybridRrf:
    def test_weights_pinned(self):
        assert len(_RRF_W) == _RRF_DEPTH == 20 and _RRF_K0 == 60
        assert _RRF_W[0] == 1.0 / 61 and _RRF_W[19] == 1.0 / 80

    def test_fusion_replay(self, spark, sf_dir):
        """Independent fusion: take the two REGISTERED source rankings
        (text_bm25_rank's top-20 and an exact integer-dot top-20 recomputed
        here from the parquet in numpy), fuse in Python, compare top-10."""
        import numpy as np

        lex_rows = registry.REGISTRY["text_bm25_rank"](spark, sf_dir).collect()
        lex_rank = {
            r["doc_id"]: i + 1
            for i, r in enumerate(
                sorted(lex_rows, key=lambda r: (-r["score"], r["doc_id"]))
            )
        }
        emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
        q = {
            int(r.vec_id): np.floor(
                np.asarray(r.embedding, dtype=np.float64) * 1048576.0
            ).astype(np.int64)
            for r in emb.itertuples()
        }
        q0 = q[0]
        rel = sorted(
            ((int((v * q0).sum()), vid) for vid, v in q.items() if vid != 0),
            key=lambda p: (-p[0], p[1]),
        )[:_RRF_DEPTH]
        dense_rank = {vid: i + 1 for i, (_, vid) in enumerate(rel)}
        scores = {}
        for d, r in lex_rank.items():
            scores[d] = scores.get(d, 0.0) + _RRF_W[r - 1]
        for d, r in dense_rank.items():
            scores[d] = scores.get(d, 0.0) + _RRF_W[r - 1]
        expect = sorted(scores.items(), key=lambda p: (-round(p[1], 6), p[0]))[:10]
        got = registry.REGISTRY["retrieval_hybrid_rrf"](spark, sf_dir).collect()
        assert [r["doc_id"] for r in got] == [d for d, _ in expect]
        for r in got:
            assert abs(r["rrf_score"] - scores[r["doc_id"]]) < 5e-7
            assert r["lex_rank"] == lex_rank.get(r["doc_id"])
            assert r["dense_rank"] == dense_rank.get(r["doc_id"])

    def test_one_sided_docs_live(self, spark, sf_dir):
        """The NULL-side branches must BOTH be exercised by the fixture: the
        fused top-10 needs at least one doc ranked by only one source (the
        element_at(arr, NULL) footgun this op's r14 review caught is only
        tested if a one-sided doc survives fusion) and at least one by both
        is NOT required (disjoint rankings are legitimate) — but the two
        rank columns must each be non-NULL somewhere."""
        got = registry.REGISTRY["retrieval_hybrid_rrf"](spark, sf_dir).collect()
        assert len(got) == 10
        assert any(r["lex_rank"] is not None for r in got)
        assert any(r["dense_rank"] is not None for r in got)
        assert any(r["lex_rank"] is None or r["dense_rank"] is None for r in got)
        # rank-only fusion: every score must be a sum of pinned weights
        for r in got:
            w = 0.0
            if r["lex_rank"] is not None:
                w += _RRF_W[r["lex_rank"] - 1]
            if r["dense_rank"] is not None:
                w += _RRF_W[r["dense_rank"] - 1]
            assert abs(r["rrf_score"] - w) < 5e-7
