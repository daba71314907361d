"""Round-12 known-answer certification, wave 15: the as-of join family,
cluster closure via an independent union-find, and the remaining
grouped-aggregate / text mechanics.

Pure Python/pandas/numpy from raw parquet. The as-of replays use
sorted-list bisection (a different algorithm from BOTH the engine's
union+window formulation and DuckDB's native ASOF); the cluster
closures use union-find (different from both label propagation and the
recursive-CTE transitive closure); percentiles use numpy's linear
interpolation. Jaccard pair replay is shared with wave 14 (test-side
code only — zero engine code anywhere).
"""

from __future__ import annotations

import bisect
import math
import re
from collections import Counter, defaultdict
from decimal import ROUND_HALF_UP, Decimal

import numpy as np
import pandas as pd

from wri_data_processing_spark import registry
from tests.test_r12_known_answers_wave14 import _jaccard_replay

registry.load_all()


def _fmt(ts) -> str:
    return pd.Timestamp(ts).strftime("%Y-%m-%d %H:%M:%S")


def _purchases_dedup(sf_dir):
    # the r12 re-pointed as-of fixture: purchases per (user, ts), max id
    e = pd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "event_type"]
    )
    best = {}
    for i, u, t, et in zip(e["event_id"], e["user_id"], e["ts"], e["event_type"]):
        if et == "purchase":
            key = (int(u), pd.Timestamp(t))
            best[key] = max(best.get(key, -1), int(i))
    per_user = defaultdict(list)
    for (u, t), i in best.items():
        per_user[u].append((t, i))
    for lst in per_user.values():
        lst.sort()
    return per_user


def _events(sf_dir):
    e = pd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "event_type"]
    )
    return [
        (int(i), int(u), pd.Timestamp(t))
        for i, u, t, et in zip(e["event_id"], e["user_id"], e["ts"], e["event_type"])
        if et == "click"
    ]


class TestAsofFamily:
    def test_backward(self, spark, sf_dir):
        per_user = _purchases_dedup(sf_dir)
        want = {}
        for eid, uid, ts in _events(sf_dir):
            lst = per_user.get(uid, [])
            k = bisect.bisect_right([d for d, _ in lst], ts)
            want[eid] = (lst[k - 1][1], _fmt(lst[k - 1][0])) if k else (None, None)
        got = {
            r["event_id"]: (r["last_purchase_id"], r["last_purchase_ts"])
            for r in registry.REGISTRY["join_asof"](spark, sf_dir).collect()
        }
        assert got == want
        # every branch is live on the re-pointed fixture
        assert any(v == (None, None) for v in want.values())
        assert any(v != (None, None) for v in want.values())

    def test_tolerance(self, spark, sf_dir):
        per_user = _purchases_dedup(sf_dir)
        tol = pd.Timedelta(hours=12)
        want = {}
        for eid, uid, ts in _events(sf_dir):
            lst = per_user.get(uid, [])
            k = bisect.bisect_right([d for d, _ in lst], ts)
            if k and ts - lst[k - 1][0] <= tol:
                want[eid] = (lst[k - 1][1], _fmt(lst[k - 1][0]))
            else:
                want[eid] = (None, None)
        got = {
            r["event_id"]: (r["last_purchase_id"], r["last_purchase_ts"])
            for r in registry.REGISTRY["join_asof_tolerance"](spark, sf_dir).collect()
        }
        assert got == want
        assert any(v != (None, None) for v in want.values())
        assert any(v == (None, None) for v in want.values())

    def test_forward(self, spark, sf_dir):
        per_user = _purchases_dedup(sf_dir)
        want = {}
        for eid, uid, ts in _events(sf_dir):
            lst = per_user.get(uid, [])
            k = bisect.bisect_left([d for d, _ in lst], ts)
            want[eid] = (
                (lst[k][1], _fmt(lst[k][0])) if k < len(lst) else (None, None)
            )
        got = {
            r["event_id"]: (r["next_purchase_id"], r["next_purchase_ts"])
            for r in registry.REGISTRY["join_asof_forward"](spark, sf_dir).collect()
        }
        assert got == want
        assert any(v == (None, None) for v in want.values())
        assert any(v != (None, None) for v in want.values())

    def test_nearest(self, spark, sf_dir):
        per_user = _purchases_dedup(sf_dir)
        want = {}
        for eid, uid, ts in _events(sf_dir):
            lst = per_user.get(uid, [])
            dates = [d for d, _ in lst]
            kb = bisect.bisect_right(dates, ts)
            kf = bisect.bisect_left(dates, ts)
            back = lst[kb - 1] if kb else None
            fwd = lst[kf] if kf < len(lst) else None
            if back is None and fwd is None:
                want[eid] = (None, None, None)
            elif fwd is None or (
                back is not None and (ts - back[0]) <= (fwd[0] - ts)
            ):
                want[eid] = (back[1], _fmt(back[0]), "back")
            else:
                want[eid] = (fwd[1], _fmt(fwd[0]), "fwd")
        got = {
            r["event_id"]: (r["nearest_purchase_id"], r["nearest_purchase_ts"], r["direction"])
            for r in registry.REGISTRY["join_asof_nearest"](spark, sf_dir).collect()
        }
        assert got == want
        dirs = {v[2] for v in want.values()}
        assert "back" in dirs and "fwd" in dirs  # both directions live


def _components(edges):
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp = defaultdict(set)
    for n in parent:
        comp[find(n)].add(n)
    return comp


class TestClusterClosure:
    def test_dedup_clusters(self, spark, sf_dir):
        d = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        pairs, _ = _jaccard_replay(zip(d["doc_id"], d["text"]))
        comp = _components(pairs.keys())
        want = {}
        for root, members in comp.items():
            for m in members:
                want[m] = (min(members), len(members))
        got = {
            r["doc_id"]: (r["cluster_id"], r["cluster_size"])
            for r in registry.REGISTRY["dedup_clusters"](spark, sf_dir).collect()
        }
        assert got == want and want

    def test_dedup_clusters_unique(self, spark, sf_dir):
        d = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        rep = {}
        groups = defaultdict(list)
        for doc_id, text in zip(d["doc_id"], d["text"]):
            groups[text].append(int(doc_id))
        for text, ids in groups.items():
            rep[text] = min(ids)
        pairs, _ = _jaccard_replay((i, t) for t, i in rep.items())
        edges = list(pairs.keys())
        for text, ids in groups.items():
            if len(ids) >= 2:
                for i in ids:
                    if i != rep[text]:
                        edges.append((i, rep[text]))
        comp = _components(edges)
        want = {}
        for members in comp.values():
            for m in members:
                want[m] = (min(members), len(members))
        got = {
            r["doc_id"]: (r["cluster_id"], r["cluster_size"])
            for r in registry.REGISTRY["dedup_clusters_unique"](spark, sf_dir).collect()
        }
        assert got == want and want


class TestGroupedAggregates:
    def test_label_centroid(self, spark, sf_dir):
        e = pd.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["label", "embedding"]
        )
        sums = defaultdict(lambda: [0, 0])
        for label, emb in zip(e["label"], e["embedding"]):
            q = np.floor(np.asarray(emb, dtype=np.float64) * 1073741824.0).astype(
                np.int64
            )
            for pos, v in enumerate(q, start=1):
                cell = sums[(label, pos)]
                cell[0] += int(v)
                cell[1] += 1
        got = {
            (r["label"], r["pos"]): r
            for r in registry.REGISTRY["embed_label_centroid"](spark, sf_dir).collect()
        }
        assert set(got) == set(sums)
        for key, (s, n) in sums.items():
            r = got[key]
            assert r["n"] == n
            assert r["centroid"] == s / (n * 1073741824.0)

    def test_percentile(self, spark, sf_dir):
        li = pd.read_parquet(
            f"{sf_dir}/lineitem.parquet", columns=["l_returnflag", "l_quantity"]
        )
        got = {
            r["l_returnflag"]: r
            for r in registry.REGISTRY["agg_percentile"](spark, sf_dir).collect()
        }
        for flag, grp in li.groupby("l_returnflag"):
            vals = np.sort(grp["l_quantity"].to_numpy(dtype=np.float64))
            r = got[flag]
            # PERCENTILE_CONT == numpy linear interpolation
            assert abs(r["median_qty"] - np.quantile(vals, 0.5)) <= 1e-9
            assert abs(r["p90_qty"] - np.quantile(vals, 0.9)) <= 1e-9

    def test_mode_and_argmax(self, spark, sf_dir):
        o = pd.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderpriority", "o_orderstatus", "o_orderkey", "o_totalprice"],
        )
        mode_got = {
            r["o_orderpriority"]: (r["mode_status"], r["n"])
            for r in registry.REGISTRY["agg_mode"](spark, sf_dir).collect()
        }
        argmax_got = {
            r["o_orderpriority"]: (r["top_orderkey"], r["top_price"])
            for r in registry.REGISTRY["agg_argmax"](spark, sf_dir).collect()
        }
        for pri, grp in o.groupby("o_orderpriority"):
            freq = Counter(grp["o_orderstatus"])
            winner = min(freq, key=lambda s: (-freq[s], s))
            assert mode_got[pri] == (winner, freq[winner])
            # argmax: max price, ties to highest orderkey
            best = max(zip(grp["o_totalprice"], grp["o_orderkey"]))
            assert argmax_got[pri] == (best[1], best[0])

    def test_resample_gapfill(self, spark, sf_dir):
        e = pd.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
        )
        p = e[e["event_type"] == "purchase"]
        agg = defaultdict(lambda: [0, Decimal(0)])
        q6 = lambda x: Decimal(x).quantize(Decimal("0.000001"), ROUND_HALF_UP)
        for ts, v in zip(p["ts"], p["value"]):
            b = pd.Timestamp(ts).floor("h")
            cell = agg[b]
            cell[0] += 1
            cell[1] += q6(float(v))
        lo, hi = min(agg), max(agg)
        want = []
        filled = None
        b = lo
        while b <= hi:
            if b in agg:
                filled = float(agg[b][1])
                want.append((b.strftime("%Y-%m-%d %H:%M:%S"), agg[b][0], filled))
            else:
                want.append((b.strftime("%Y-%m-%d %H:%M:%S"), 0, filled))
            b += pd.Timedelta(hours=1)
        got = [
            (r["bucket"], r["n"], r["filled_sum"])
            for r in registry.REGISTRY["ts_resample_gapfill"](spark, sf_dir).collect()
        ]
        assert got == want and any(n == 0 for _, n, _ in want)


class TestTextMechanics:
    def test_text_stats(self, spark, sf_dir):
        d = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        got = {
            r["doc_id"]: r
            for r in registry.REGISTRY["text_stats"](spark, sf_dir).collect()
        }
        tails = {0: "", 1: ".", 2: "!?", 3: ";:,"}  # r12 punct augmentation
        for doc_id, raw in zip(d["doc_id"], d["text"]):
            text = raw + tails[int(doc_id) % 4]
            r = got[int(doc_id)]
            n_tok = len(re.split(r"\s+", text.strip()))
            assert r["n_chars_calc"] == len(text)
            assert r["n_tokens"] == n_tok
            assert r["avg_token_len"] == len(text.replace(" ", "")) / max(n_tok, 1)
            n_punct = sum(1 for c in text if c in ".,!?;:")
            assert r["punct_ratio"] == n_punct / max(len(text), 1)
        # the augmentation keeps both branches live
        assert any(r["punct_ratio"] > 0 for r in got.values())
        assert any(r["punct_ratio"] == 0 for r in got.values())

    def test_token_count(self, spark, sf_dir):
        d = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        pat = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")
        got = {
            r["doc_id"]: r["n_bpe_tokens"]
            for r in registry.REGISTRY["text_token_count"](spark, sf_dir).collect()
        }
        for doc_id, text in zip(d["doc_id"], d["text"]):
            assert got[int(doc_id)] == len(pat.findall(text))

    def test_lang_id(self, spark, sf_dir):
        d = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang", "text"])
        markers = {
            "en": ["the", "and", "with"],
            "es": ["el", "la", "con"],
            "fr": ["le", "la", "avec"],
            "de": ["der", "und", "mit"],
        }
        want = Counter()
        for lang, text in zip(d["lang"], d["text"]):
            padded = f" {text} "
            score = {
                lg: sum(padded.count(f" {w} ") for w in ws)
                for lg, ws in markers.items()
            }
            if score["en"] >= max(score["es"], score["fr"], score["de"]) and score["en"] > 0:
                pred = "en"
            elif score["es"] >= max(score["fr"], score["de"]) and score["es"] > 0:
                pred = "es"
            elif score["fr"] >= score["de"] and score["fr"] > 0:
                pred = "fr"
            elif score["de"] > 0:
                pred = "de"
            else:
                pred = "unknown"
            want[(lang, pred)] += 1
        got = {
            (r["labeled_lang"], r["pred_lang"]): r["n"]
            for r in registry.REGISTRY["text_lang_id"](spark, sf_dir).collect()
        }
        assert got == dict(want)
