"""Round-12 known-answer certification, wave 14: the substring-dedup
family end to end, the posting-list Jaccard machinery with its DF cap,
and the curation/reporting tail.

Pure Python (hashlib/re/Decimal) from raw parquet, zero shared code:
40-char window hashes at stride 1, winnowing local minima (w=8),
gaps-and-islands span merging with the >k break rule, the masking
accounting, n-gram Jaccard pairs under the 2..1000 document-frequency
cap (replayed on shingle STRINGS — stronger than the engines' hashed
keys), the unique-text variant, per-source dup reporting, MassiveText
crossdoc shingle fractions, the greedy token-budget knapsack, priority
SLA scorecards, one pyramid halving in exact decimal, and the frame
sampler's truncating size arithmetic.
"""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter, defaultdict
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd

from wri_data_processing_spark import registry

registry.load_all()

_K = 40  # _SUBSTR_K, restated
_W = 8  # _WINNOW_W, restated


def _docs(sf_dir, cols=("doc_id", "text")):
    return pd.read_parquet(f"{sf_dir}/documents.parquet", columns=list(cols))


def _win_hashes(text):
    return [
        hashlib.sha256(text[i : i + _K].encode()).hexdigest()[:16]
        for i in range(len(text) - _K + 1)
    ]


def _dup_positions(sf_dir):
    """doc -> window hash list, plus the set of hashes in >=2 distinct docs."""
    d = _docs(sf_dir)
    hs = {
        int(doc_id): _win_hashes(text)
        for doc_id, text in zip(d["doc_id"], d["text"])
        if len(text) >= _K
    }
    docs_per_hash = defaultdict(set)
    for doc_id, hlist in hs.items():
        for h in hlist:
            docs_per_hash[h].add(doc_id)
    dup = {h for h, ds in docs_per_hash.items() if len(ds) >= 2}
    return d, hs, dup


def _merge_spans(positions):
    """1-based window starts -> merged (start, end, len) spans, break > _K."""
    spans = []
    cur = None
    for i in sorted(positions):
        if cur is None or i - cur[1] > _K:
            if cur is not None:
                spans.append(cur)
            cur = [i, i]
        else:
            cur[1] = i
    if cur is not None:
        spans.append(cur)
    return [(s, e + _K - 1, e + _K - s) for s, e in spans]


class TestSubstringFamily:
    def test_winnow(self, spark, sf_dir):
        d = _docs(sf_dir)
        fps = {}
        for doc_id, text in zip(d["doc_id"], d["text"]):
            if len(text) < _K + _W - 1:
                continue
            hlist = _win_hashes(text)
            fps[int(doc_id)] = {
                min(hlist[j : j + _W]) for j in range(len(hlist) - _W + 1)
            }
        docs_per_fp = defaultdict(set)
        for doc_id, s in fps.items():
            for fp in s:
                docs_per_fp[fp].add(doc_id)
        dup = {fp for fp, ds in docs_per_fp.items() if len(ds) >= 2}
        got = {
            r["doc_id"]: r
            for r in registry.REGISTRY["dedup_substring_winnow"](spark, sf_dir).collect()
        }
        assert set(got) == set(fps)
        for doc_id, s in fps.items():
            r = got[doc_id]
            assert r["n_fingerprints"] == len(s)
            assert r["n_dup_fingerprints"] == len(s & dup)

    def test_spans(self, spark, sf_dir):
        _, hs, dup = _dup_positions(sf_dir)
        want = {}
        for doc_id, hlist in hs.items():
            positions = [i + 1 for i, h in enumerate(hlist) if h in dup]
            for island, span in enumerate(_merge_spans(positions), start=1):
                want[(doc_id, island)] = span
        got = {
            (r["doc_id"], r["island"]): (r["span_start"], r["span_end"], r["span_len"])
            for r in registry.REGISTRY["dedup_substring_spans"](spark, sf_dir).collect()
        }
        assert got == want and want

    def test_mask_spans(self, spark, sf_dir):
        d, hs, dup = _dup_positions(sf_dir)
        masked = {}
        for doc_id, hlist in hs.items():
            positions = [i + 1 for i, h in enumerate(hlist) if h in dup]
            masked[doc_id] = sum(ln for _, _, ln in _merge_spans(positions))
        got = {
            r["doc_id"]: r
            for r in registry.REGISTRY["pipeline_mask_spans"](spark, sf_dir).collect()
        }
        assert set(got) == set(int(i) for i in d["doc_id"])
        for doc_id, text in zip(d["doc_id"], d["text"]):
            r = got[int(doc_id)]
            m = masked.get(int(doc_id), 0)
            assert r["n_chars"] == len(text)
            assert r["n_masked"] == m
            assert r["n_kept"] == len(text) - m
            assert r["fully_duplicated"] == (m == len(text))


def _jaccard_replay(docs):
    """(doc_id, text) iterable -> (pairs dict, per-doc sizes) under the
    2..1000 document-frequency cap on doc-distinct 3-gram shingles."""
    sh = {}
    for doc_id, text in docs:
        toks = re.split(r"\s+", text.strip())
        if len(toks) >= 3:
            sh[int(doc_id)] = {
                " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
            }
    df = Counter()
    for s in sh.values():
        df.update(s)
    eligible = {g for g, c in df.items() if 2 <= c <= 1000}
    posting = defaultdict(list)
    for doc_id, s in sorted(sh.items()):
        for g in s:
            if g in eligible:
                posting[g].append(doc_id)
    common = Counter()
    for ids in posting.values():
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                common[(a, b)] += 1
    pairs = {}
    for (a, b), nc in common.items():
        jac = nc / (len(sh[a]) + len(sh[b]) - nc)
        if jac >= 0.6:
            pairs[(a, b)] = jac
    return pairs, sh


class TestJaccardMachinery:
    def test_ngram_jaccard(self, spark, sf_dir):
        d = _docs(sf_dir)
        pairs, _ = _jaccard_replay(zip(d["doc_id"], d["text"]))
        got = {
            (r["doc_a"], r["doc_b"]): r["jaccard"]
            for r in registry.REGISTRY["dedup_ngram_jaccard"](spark, sf_dir).collect()
        }
        assert set(got) == set(pairs) and pairs
        for k, jac in pairs.items():
            assert abs(got[k] - round(jac, 4)) <= 1e-4

    def test_ngram_unique(self, spark, sf_dir):
        d = _docs(sf_dir)
        reps = {}
        for doc_id, text in zip(d["doc_id"], d["text"]):
            if text not in reps or int(doc_id) < reps[text]:
                reps[text] = int(doc_id)
        pairs, _ = _jaccard_replay((i, t) for t, i in reps.items())
        got = {
            (r["doc_a"], r["doc_b"]): r["jaccard"]
            for r in registry.REGISTRY["dedup_ngram_unique"](spark, sf_dir).collect()
        }
        assert set(got) == set(pairs)
        for k, jac in pairs.items():
            assert abs(got[k] - round(jac, 4)) <= 1e-4

    def test_report_by_source(self, spark, sf_dir):
        d = _docs(sf_dir, ("doc_id", "text", "source"))
        pairs, _ = _jaccard_replay(zip(d["doc_id"], d["text"]))
        flagged = {a for a, _ in pairs} | {b for _, b in pairs}
        want = defaultdict(lambda: [0, 0])
        for doc_id, source in zip(d["doc_id"], d["source"]):
            cell = want[source]
            cell[0] += 1
            cell[1] += 1 if int(doc_id) in flagged else 0
        got = {
            r["source"]: r
            for r in registry.REGISTRY["dedup_report_by_source"](spark, sf_dir).collect()
        }
        assert set(got) == set(want)
        for source, (n, dup) in want.items():
            r = got[source]
            assert (r["n_docs"], r["n_near_dup"]) == (n, dup)
            assert r["near_dup_rate"] == dup * 1.0 / n

    def test_ngram_crossdoc(self, spark, sf_dir):
        d = _docs(sf_dir)
        sh = {}
        for doc_id, text in zip(d["doc_id"], d["text"]):
            toks = re.split(r"\s+", text.strip())
            if len(toks) >= 5:
                sh[int(doc_id)] = {
                    " ".join(toks[i : i + 5]) for i in range(len(toks) - 4)
                }
        df = Counter()
        for s in sh.values():
            df.update(s)
        got = {
            r["doc_id"]: r
            for r in registry.REGISTRY["dedup_ngram_crossdoc"](spark, sf_dir).collect()
        }
        assert set(got) == set(sh)
        for doc_id, s in sh.items():
            shared = sum(1 for g in s if df[g] > 1)
            r = got[doc_id]
            assert (r["n_shingles"], r["n_shared"]) == (len(s), shared)
            assert r["shared_frac"] == shared / len(s)
            assert r["flagged"] == (shared / len(s) > 0.5)


class TestCurationTail:
    def test_token_budget(self, spark, sf_dir):
        d = _docs(sf_dir, ("doc_id", "text", "source"))
        rows = []
        for doc_id, text, source in zip(d["doc_id"], d["text"], d["source"]):
            n_tok = len(re.split(r"\s+", text.strip()))
            density = len(text.replace(" ", "")) * 1.0 / max(len(text), 1)
            rows.append((source, -density, int(doc_id), n_tok))
        want = {}
        by_src = defaultdict(list)
        for r in rows:
            by_src[r[0]].append(r)
        for source, entries in by_src.items():
            entries.sort(key=lambda t: (t[1], t[2]))
            cum = 0
            for _, _, doc_id, n_tok in entries:
                cum += n_tok
                if cum <= 800:
                    want[doc_id] = (source, n_tok)
        got = {
            r["doc_id"]: (r["source"], r["n_tok"])
            for r in registry.REGISTRY["sample_token_budget"](spark, sf_dir).collect()
        }
        assert got == want and want

    def test_priority_sla(self, spark, sf_dir):
        li = pd.read_parquet(
            f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
        )
        o = pd.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
        )
        ship0 = li.groupby("l_orderkey")["l_shipdate"].min()
        want = defaultdict(lambda: [0, 0, None])
        for ok, od, pri in zip(o["o_orderkey"], o["o_orderdate"], o["o_orderpriority"]):
            if ok not in ship0.index:
                continue
            days = (pd.Timestamp(ship0[ok]) - pd.Timestamp(od)).days
            cell = want[pri]
            cell[0] += 1
            cell[1] += 1 if days <= 30 else 0
            cell[2] = days if cell[2] is None else max(cell[2], days)
        got = {
            r["o_orderpriority"]: r
            for r in registry.REGISTRY["orders_priority_sla"](spark, sf_dir).collect()
        }
        assert set(got) == set(want)
        for pri, (n, within, worst) in want.items():
            r = got[pri]
            assert (r["n_orders"], r["n_within_30d"], r["worst_days"]) == (
                n,
                within,
                worst,
            )
            assert r["sla_rate"] == within / n

    def test_overview_pyramid(self, spark, sf_dir):
        li = pd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_returnflag", "l_orderkey", "l_suppkey", "l_quantity"],
        )
        base = defaultdict(lambda: [Decimal(0), 0])
        q6 = lambda x: Decimal(x).quantize(Decimal("0.000001"), ROUND_HALF_UP)
        for fl, ok, sk, q in zip(
            li["l_returnflag"], li["l_orderkey"], li["l_suppkey"], li["l_quantity"]
        ):
            cell = base[(fl, int(ok) % 64, int(sk) % 64)]
            cell[0] += q6(float(q))
            cell[1] += 1
        up = defaultdict(lambda: [Decimal(0), 0, 0])
        for (fl, x, y), (s, n) in base.items():
            cell = up[(fl, x // 2, y // 2)]
            cell[0] += s
            cell[1] += n
            cell[2] += 1
        got = {
            (r["layer_id"], r["x"], r["y"]): r
            for r in registry.REGISTRY["geo_overview_pyramid"](spark, sf_dir).collect()
        }
        assert set(got) == set(up)
        for key, (s, n, nc) in up.items():
            r = got[key]
            assert r["n_children"] == nc
            assert r["val"] == float(s) / n

    def test_frame_sample(self, spark, sf_dir):
        d = _docs(sf_dir)
        got = {
            r["media_id"]: (r["n_frames"], r["first_frame_bytes"])
            for r in registry.REGISTRY["multimodal_frame_sample"](spark, sf_dir).collect()
        }
        for doc_id, text in zip(d["doc_id"], d["text"]):
            L = len(text)
            # (L-1) // 64 with TRUNCATION toward zero (the engines'
            # integer div), so L=0 still yields one (empty) frame
            n_frames = min(math.trunc((L - 1) / 64) + 1, 16)
            first = min(L, 64)
            assert got[int(doc_id)] == (n_frames, first), doc_id
