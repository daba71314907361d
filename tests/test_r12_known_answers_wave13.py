"""Round-12 known-answer certification, wave 13: the mechanics tail —
sketches, segment dedup, shard manifests, LPA communities, chunking and
profiling re-derived in pure Python/pandas from raw parquet, zero shared
code.

Covers: Count-Min sketch cells under the pinned affine hashes, C4-style
segment keep-first dedup and its rewrite surgery, the epoch-shuffle
shard manifest (salted-sha positions), 4-round synchronous deterministic
LPA, fixed-width histograms, sliding-window chunking arithmetic, and the
column-profile statistics pass.
"""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter, defaultdict

import pandas as pd

from wri_data_processing_spark import registry

registry.load_all()


def _sha60(s: str) -> int:
    return int(hashlib.sha256(s.encode()).hexdigest()[:15], 16)


class TestCountMinSketch:
    def test_known_answer(self, spark, sf_dir):
        li = pd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_partkey"])
        exact = Counter(int(k) for k in li["l_partkey"])
        P, W = 2147483647, 1024
        A = (99371, 50923, 76031, 85247)
        B = (12345, 67891, 24683, 13579)
        cells = defaultdict(int)
        for k, cnt in exact.items():
            for j in range(4):
                cells[(j, ((k % P) * A[j] + B[j]) % P % W)] += cnt
        top5 = sorted(exact.items(), key=lambda t: (-t[1], t[0]))[:5]
        got = {
            r["l_partkey"]: r
            for r in registry.REGISTRY["agg_count_min_sketch"](spark, sf_dir).collect()
        }
        assert set(got) == {k for k, _ in top5}
        for k, cnt in top5:
            est = min(
                cells[(j, ((k % P) * A[j] + B[j]) % P % W)] for j in range(4)
            )
            r = got[k]
            assert r["exact_cnt"] == cnt
            assert r["est_cnt"] == est
            assert r["overest"] == est - cnt
            assert est >= cnt  # CMS never undercounts


class TestHistogram:
    def test_known_answer(self, spark, sf_dir):
        li = pd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_quantity"])
        want = Counter(math.floor(q / 5) for q in li["l_quantity"])
        rows = registry.REGISTRY["agg_histogram"](spark, sf_dir).collect()
        assert {r["bucket"]: r["n"] for r in rows} == dict(want)
        for r in rows:
            assert r["lo"] == r["bucket"] * 5


def _segments_replay(sf_dir):
    d = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    segs = []  # (doc_id, seg_idx, seg)
    for doc_id, text in zip(d["doc_id"], d["text"]):
        toks = re.split(r"\s+", text.strip())
        for i in range(math.ceil(len(toks) / 16)):
            segs.append((int(doc_id), i, " ".join(toks[i * 16 : i * 16 + 16])))
    first = {}
    for doc_id, idx, seg in sorted(segs):
        first.setdefault(seg, (doc_id, idx))
    return segs, first


class TestSegmentDedup:
    def test_coverage(self, spark, sf_dir):
        segs, first = _segments_replay(sf_dir)
        per = defaultdict(lambda: [0, 0])
        for doc_id, idx, seg in segs:
            cell = per[doc_id]
            cell[0] += 1
            cell[1] += 1 if first[seg] == (doc_id, idx) else 0
        got = {
            r["doc_id"]: r
            for r in registry.REGISTRY["dedup_segments"](spark, sf_dir).collect()
        }
        assert set(got) == set(per)
        for doc_id, (n, kept) in per.items():
            r = got[doc_id]
            assert (r["n_segments"], r["n_kept"], r["n_removed"]) == (
                n,
                kept,
                n - kept,
            )

    def test_rewrite(self, spark, sf_dir):
        segs, first = _segments_replay(sf_dir)
        by_doc = defaultdict(list)
        for doc_id, idx, seg in segs:
            if first[seg] == (doc_id, idx):
                by_doc[doc_id].append((idx, seg))
        got = {
            r["doc_id"]: r
            for r in registry.REGISTRY["dedup_segments_rewrite"](spark, sf_dir).collect()
        }
        assert set(got) == set(by_doc)  # zero-survivor docs emit no row
        for doc_id, parts in by_doc.items():
            parts.sort()
            text = " ".join(seg for _, seg in parts)
            r = got[doc_id]
            assert r["n_kept"] == len(parts)
            assert r["new_text"] == text
            assert r["new_n_chars"] == len(text)


class TestEpochShuffle:
    def test_manifest(self, spark, sf_dir):
        d = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"])
        want = defaultdict(lambda: [0, 0, None])
        for doc_id, n_chars in zip(d["doc_id"], d["n_chars"]):
            for epoch in (0, 1):
                u = _sha60(f"ep:{epoch}:{int(doc_id)}") % (1 << 30)
                cell = want[(epoch, u % 8)]
                cell[0] += 1
                cell[1] += int(n_chars)
                cell[2] = u if cell[2] is None else min(cell[2], u)
        got = {
            (r["epoch"], r["shard"]): r
            for r in registry.REGISTRY["pack_epoch_shuffle"](spark, sf_dir).collect()
        }
        assert set(got) == set(want)
        for key, (n, chars, mn) in want.items():
            r = got[key]
            assert (r["n_docs"], r["n_chars_total"], r["min_u"]) == (n, chars, mn)


class TestLabelPropagation:
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
        lbl = {n: n for n in adj}
        for _ in range(4):  # _LPA_ROUNDS, restated
            new = {}
            for n, nbs in adj.items():
                freq = Counter(lbl[nb] for nb in nbs)
                # winner: max count, then smallest label
                new[n] = min(freq, key=lambda l: (-freq[l], l))
            lbl = new
        want = Counter(lbl.values())
        rows = registry.REGISTRY["graph_label_propagation"](spark, sf_dir).collect()
        assert {r["community"]: r["n_nodes"] for r in rows} == dict(want)


class TestChunkWindows:
    def test_known_answer(self, spark, sf_dir):
        d = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        want = {}
        for doc_id, text in zip(d["doc_id"], d["text"]):
            toks = re.split(r"\s+", text.strip())
            for start in range(0, len(toks), 64):
                chunk = toks[start : start + 128]
                if len(chunk) >= 16:
                    want[(int(doc_id), start // 64)] = (
                        len(chunk),
                        " ".join(chunk),
                    )
        got = {
            (r["doc_id"], r["chunk_id"]): (r["n_tokens"], r["chunk_text"])
            for r in registry.REGISTRY["text_chunk_windows"](spark, sf_dir).collect()
        }
        assert got == want
        # 50% overlap: consecutive chunks share their boundary tokens
        assert any(k[1] > 0 for k in want)


class TestProfileColumns:
    def test_known_answer(self, spark, sf_dir):
        o = pd.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"],
        )
        got = {
            r["col"]: r
            for r in registry.REGISTRY["profile_columns"](spark, sf_dir).collect()
        }
        assert set(got) == set(o.columns)
        for c in o.columns:
            col = o[c]
            r = got[c]
            assert r["n_null"] == int(col.isna().sum())
            assert r["n_distinct"] == col.nunique()
            assert r["min_str"] == str(col.min())
            assert r["max_str"] == str(col.max())
