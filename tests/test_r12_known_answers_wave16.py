"""Round-12 known-answer certification, wave 16: BPE pair statistics,
incremental and containment dedup, MinHash-graph clustering, the
multimodal metadata/dedup mechanics, and the scalar date/unit math.

Pure Python/pandas from raw parquet. MinHash candidates reuse wave 9's
replay constants; cluster closure reuses wave 15's union-find; the
Jaccard-with-DF-cap machinery reuses wave 14's replay — all TEST-side
code, zero engine code anywhere. fn_date_math's calendar arithmetic
(end-of-month clamping, ISO week/dow) is re-derived with the stdlib
calendar module.
"""

from __future__ import annotations

import calendar
import datetime as dt
import hashlib
import re
from collections import Counter, defaultdict
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd

from wri_data_processing_spark import registry
from tests.test_r12_known_answers_wave9 import _P, _PERMS, _sha60
from tests.test_r12_known_answers_wave14 import _jaccard_replay
from tests.test_r12_known_answers_wave15 import _components

registry.load_all()


def _docs(sf_dir, cols):
    return pd.read_parquet(f"{sf_dir}/documents.parquet", columns=cols)


class TestBpeMergeCandidates:
    def test_top50(self, spark, sf_dir):
        d = _docs(sf_dir, ["doc_id", "text"])
        pair_n = Counter()
        pair_docs = defaultdict(set)
        for doc_id, text in zip(d["doc_id"], d["text"]):
            toks = re.split(r"\s+", text.strip())
            for a, b in zip(toks, toks[1:]):
                pair_n[(a, b)] += 1
                pair_docs[(a, b)].add(int(doc_id))
        order = sorted(pair_n, key=lambda p: (-pair_n[p], p[0], p[1]))[:50]
        rows = registry.REGISTRY["bpe_merge_candidates"](spark, sf_dir).collect()
        assert [(r["left_tok"], r["right_tok"]) for r in rows] == order
        for r in rows:
            key = (r["left_tok"], r["right_tok"])
            assert r["n_pairs"] == pair_n[key]
            assert r["n_docs"] == len(pair_docs[key])


class TestIncrementalAndContainment:
    def test_dedup_incremental(self, spark, sf_dir):
        d = _docs(sf_dir, ["doc_id", "text"])
        existing = {
            hashlib.md5(t.encode()).hexdigest()
            for i, t in zip(d["doc_id"], d["text"])
            if int(i) % 10 < 8
        }
        novel = defaultdict(list)
        for i, t in zip(d["doc_id"], d["text"]):
            if int(i) % 10 >= 8:
                h = hashlib.md5(t.encode()).hexdigest()
                if h not in existing:
                    novel[h].append(int(i))
        want = {min(ids): len(ids) for ids in novel.values()}
        got = {
            r["doc_id"]: r["n_copies"]
            for r in registry.REGISTRY["dedup_incremental"](spark, sf_dir).collect()
        }
        assert got == want and want

    def test_dedup_containment(self, spark, sf_dir):
        d = _docs(sf_dir, ["doc_id", "text"])
        # same posting machinery as the Jaccard replay, different ratio:
        # rebuild common counts WITHOUT the 0.6 Jaccard cut
        sh = {}
        for doc_id, text in zip(d["doc_id"], d["text"]):
            toks = re.split(r"\s+", text.strip())
            if len(toks) >= 3:
                sh[int(doc_id)] = {
                    " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
                }
        df = Counter()
        for s in sh.values():
            df.update(s)
        eligible = {g for g, c in df.items() if 2 <= c <= 1000}
        common = Counter()
        posting = defaultdict(list)
        for doc_id, s in sorted(sh.items()):
            for g in s:
                if g in eligible:
                    posting[g].append(doc_id)
        for ids in posting.values():
            for i, a in enumerate(ids):
                for b in ids[i + 1 :]:
                    common[(a, b)] += 1
        want = {}
        for (a, b), nc in common.items():
            ca, cb = nc / len(sh[a]), nc / len(sh[b])
            if max(ca, cb) >= 0.9:
                want[(a, b)] = (ca, cb)
        got = {
            (r["doc_a"], r["doc_b"]): (r["cont_a_in_b"], r["cont_b_in_a"])
            for r in registry.REGISTRY["dedup_containment"](spark, sf_dir).collect()
        }
        assert set(got) == set(want) and want
        for k, (ca, cb) in want.items():
            assert abs(got[k][0] - round(ca, 4)) <= 1e-4
            assert abs(got[k][1] - round(cb, 4)) <= 1e-4


class TestMinhashClusters:
    def test_union_find_replay(self, spark, sf_dir):
        d = _docs(sf_dir, ["doc_id", "text"])
        reps = {}
        for doc_id, t in zip(d["doc_id"], d["text"]):
            if t not in reps or int(doc_id) < reps[t]:
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
                bands[(j, tuple(m[4 * j : 4 * j + 4]))].append(doc_id)
        pairs = set()
        for ids in bands.values():
            ids = sorted(ids)
            for i, a in enumerate(ids):
                for b in ids[i + 1 :]:
                    e = sum(1 for x, y in zip(sigs[a], sigs[b]) if x == y) / 16.0
                    if e >= 0.25:
                        pairs.add((a, b))
        comp = _components(pairs)
        want = {}
        for members in comp.values():
            for m in members:
                want[m] = (min(members), len(members))
        got = {
            r["doc_id"]: (r["cluster_id"], r["cluster_size"])
            for r in registry.REGISTRY["dedup_minhash_clusters"](spark, sf_dir).collect()
        }
        assert got == want and want


class TestMultimodalMechanics:
    def test_meta(self, spark, sf_dir):
        d = _docs(sf_dir, ["doc_id", "text", "n_chars"])
        types = {0: "image/png", 1: "audio/wav", 2: "video/mp4"}
        got = {
            r["media_id"]: r
            for r in registry.REGISTRY["multimodal_meta"](spark, sf_dir).collect()
        }
        for doc_id, text, n_chars in zip(d["doc_id"], d["text"], d["n_chars"]):
            i = int(doc_id)
            r = got[i]
            assert r["media_type"] == types[i % 3]
            assert r["n_bytes"] == len(text)
            assert (r["width"], r["height"]) == (i % 640 + 1, i % 480 + 1)
            assert r["duration_s"] == int(n_chars) / 100.0

    def test_payload_dedup(self, spark, sf_dir):
        d = _docs(sf_dir, ["doc_id", "text"])
        groups = defaultdict(list)
        for doc_id, text in zip(d["doc_id"], d["text"]):
            groups[text].append(int(doc_id))
        got = {
            r["payload_digest"]: r
            for r in registry.REGISTRY["multimodal_dedup"](spark, sf_dir).collect()
        }
        assert len(got) == len(groups)
        for text, ids in groups.items():
            digest = hashlib.sha256(text.encode()).hexdigest()
            r = got[digest]
            assert r["n_copies"] == len(ids)
            assert r["keeper_media_id"] == min(ids)
            assert r["total_bytes"] == len(text) * len(ids)

    def test_chunk_dedup(self, spark, sf_dir):
        d = _docs(sf_dir, ["doc_id", "text"])
        types = {0: "image/png", 1: "audio/wav", 2: "video/mp4"}
        per = defaultdict(lambda: [set(), 0, set()])
        for doc_id, text in zip(d["doc_id"], d["text"]):
            if not text:
                continue
            mt = types[int(doc_id) % 3]
            cell = per[mt]
            cell[0].add(int(doc_id))
            for i in range(0, len(text), 64):
                cell[1] += 1
                cell[2].add(hashlib.sha256(text[i : i + 64].encode()).hexdigest())
        got = {
            r["media_type"]: r
            for r in registry.REGISTRY["multimodal_chunk_dedup"](spark, sf_dir).collect()
        }
        assert set(got) == set(per)
        for mt, (blobs, n_chunks, uniq) in per.items():
            r = got[mt]
            assert (r["n_blobs"], r["n_chunks"], r["n_unique_chunks"]) == (
                len(blobs),
                n_chunks,
                len(uniq),
            )
            assert abs(r["unique_ratio"] - round(len(uniq) / n_chunks, 6)) <= 1e-6


def _add_months_clamped(d: dt.date, months: int) -> dt.date:
    y, m = divmod(d.month - 1 + months, 12)
    y, m = d.year + y, m + 1
    return dt.date(y, m, min(d.day, calendar.monthrange(y, m)[1]))


class TestScalarMath:
    def test_fn_date_math(self, spark, sf_dir):
        o = pd.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
        )
        got = {
            r["o_orderkey"]: r
            for r in registry.REGISTRY["fn_date_math"](spark, sf_dir).collect()
        }
        epoch95 = dt.date(1995, 1, 1)
        for ok, od in zip(o["o_orderkey"], o["o_orderdate"]):
            d = pd.Timestamp(od).date()
            r = got[int(ok)]
            assert r["month_start"] == str(d.replace(day=1))
            assert r["plus3m"] == str(_add_months_clamped(d, 3))
            assert r["month_end"] == str(
                d.replace(day=calendar.monthrange(d.year, d.month)[1])
            )
            assert r["qtr"] == (d.month - 1) // 3 + 1
            assert r["iso_week"] == d.isocalendar()[1]
            assert r["iso_dow"] == d.isoweekday()
            assert r["days_since_epoch95"] == (d - epoch95).days

    def test_fn_round_units(self, spark, sf_dir):
        li = pd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_linenumber", "l_extendedprice"],
        )
        # (l_orderkey, l_linenumber) is NOT unique in the synthetic table —
        # compare as sorted multisets of full rows
        got = sorted(
            (r["l_orderkey"], r["l_linenumber"], r["size_mb"])
            for r in registry.REGISTRY["fn_round_units"](spark, sf_dir).collect()
        )
        want = sorted(
            (
                int(ok),
                int(ln),
                # Spark ROUND = BigDecimal(shortest repr) HALF_UP at scale 2
                float(
                    Decimal(repr(price * 1000 / (1024.0 * 1024.0))).quantize(
                        Decimal("0.01"), ROUND_HALF_UP
                    )
                ),
            )
            for ok, ln, price in zip(
                li["l_orderkey"], li["l_linenumber"], li["l_extendedprice"]
            )
        )
        assert got == want
