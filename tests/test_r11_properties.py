"""r11 property tests: LPA invariants, BPE training semantics, DeLong
internal consistency."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from wri_data_processing_spark import registry

registry.load_all()


class TestLabelPropagation:
    def test_communities_partition_and_refine_components(self, spark, sf_dir):
        """Every co-purchase node carries exactly one community label, and
        each community sits INSIDE one connected component (labels spread
        only along edges, so a community can never straddle components)."""
        from wri_data_processing_spark.queries.graph import (
            _LPA_ROUNDS,
            graph_label_propagation,
        )
        from wri_data_processing_spark.queries.llm_dedup import propagate_min_labels

        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        items = li.select("l_orderkey", "l_partkey").distinct()
        a, b = items.alias("a"), items.alias("b")
        und = (
            a.join(
                b,
                (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
                & (F.col("a.l_partkey") < F.col("b.l_partkey")),
            )
            .select(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
            .distinct()
        )
        edges = und.select(F.col("u").alias("src"), F.col("v").alias("dst")).unionAll(
            und.select(F.col("v").alias("src"), F.col("u").alias("dst"))
        )
        n_nodes = edges.select("src").distinct().count()

        comm = graph_label_propagation(spark, sf_dir)
        # (1) labels partition the vertex set: community sizes sum to |V|
        total = comm.agg(F.sum("n_nodes")).first()[0]
        assert total == n_nodes

        # (2) refinement: rebuild per-node LPA labels and CC labels; every
        # LPA community must map to exactly ONE component
        labels = (
            edges.select(F.col("src").alias("node"))
            .distinct()
            .select("node", F.col("node").alias("lbl"))
            .localCheckpoint()
        )
        for _ in range(_LPA_ROUNDS):
            f = (
                edges.join(labels, edges["dst"] == labels["node"])
                .groupBy("src", "lbl")
                .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
            )
            labels = (
                f.groupBy("src")
                .agg(
                    F.min(
                        F.struct((-F.col("cnt")).alias("nc"), F.col("lbl").alias("l"))
                    ).alias("m")
                )
                .select(F.col("src").alias("node"), F.col("m.l").alias("lbl"))
                .localCheckpoint()
            )
        cc, _ = propagate_min_labels(edges)
        cc = cc.select(F.col("node").alias("cnode"), F.col("lbl").alias("component"))
        joined = labels.join(cc, labels["node"] == cc["cnode"])
        straddlers = (
            joined.groupBy("lbl")
            .agg(F.count_distinct("component").alias("k"))
            .filter(F.col("k") > 1)
            .count()
        )
        assert straddlers == 0

    def test_lpa_converged_at_pinned_rounds(self, spark, sf_dir):
        """The docstring claims K=4 is a fixpoint on this fixture: one more
        synchronous round must not change any label."""
        from wri_data_processing_spark.queries.graph import _LPA_ROUNDS

        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        items = li.select("l_orderkey", "l_partkey").distinct()
        a, b = items.alias("a"), items.alias("b")
        und = (
            a.join(
                b,
                (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
                & (F.col("a.l_partkey") < F.col("b.l_partkey")),
            )
            .select(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
            .distinct()
        )
        edges = und.select(F.col("u").alias("src"), F.col("v").alias("dst")).unionAll(
            und.select(F.col("v").alias("src"), F.col("u").alias("dst"))
        )
        labels = (
            edges.select(F.col("src").alias("node"))
            .distinct()
            .select("node", F.col("node").alias("lbl"))
            .localCheckpoint()
        )
        snapshots = []
        for _ in range(_LPA_ROUNDS + 1):
            f = (
                edges.join(labels, edges["dst"] == labels["node"])
                .groupBy("src", "lbl")
                .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
            )
            labels = (
                f.groupBy("src")
                .agg(
                    F.min(
                        F.struct((-F.col("cnt")).alias("nc"), F.col("lbl").alias("l"))
                    ).alias("m")
                )
                .select(F.col("src").alias("node"), F.col("m.l").alias("lbl"))
                .localCheckpoint()
            )
            snapshots.append({r["node"]: r["lbl"] for r in labels.collect()})
        assert snapshots[_LPA_ROUNDS] == snapshots[_LPA_ROUNDS - 1]


class TestBpeTrainRounds:
    def test_matches_pure_python_bpe(self, spark, sf_dir):
        """Independent known-answer: a pure-Python word-frequency BPE
        trainer (naive overlapping pair counts, merge-with-last rewrite)
        must produce the identical 5-round merge table."""
        import re
        from collections import Counter

        import pandas as pd

        from wri_data_processing_spark.queries.llm_pipeline import _BPE_ROUNDS

        docs = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
        wc: Counter = Counter()
        for t in docs["text"]:
            for wd in re.split(r"\s+", t.strip()):
                if wd:
                    wc[wd] += 1
        vocab = {w: list(w) for w in wc}
        expected = []
        for rnd in range(1, _BPE_ROUNDS + 1):
            pc: Counter = Counter()
            for w, syms in vocab.items():
                c = wc[w]
                for i in range(len(syms) - 1):
                    pc[(syms[i], syms[i + 1])] += c
            (l, r), n = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
            expected.append((rnd, l, r, l + r, n))
            for w, syms in vocab.items():
                acc = [syms[0]]
                for x in syms[1:]:
                    if acc[-1] == l and x == r:
                        acc[-1] = l + r
                    else:
                        acc.append(x)
                vocab[w] = acc
        got = [
            (row["round"], row["left_tok"], row["right_tok"], row["merged"],
             row["n_pairs"])
            for row in registry.REGISTRY["bpe_train_rounds"](spark, sf_dir).collect()
        ]
        assert got == expected

    def test_merge_with_last_equals_left_to_right_greedy(self):
        """The rewrite claim: merge-with-last == left-to-right greedy
        non-overlapping, because a merged symbol is strictly longer than
        the left token. Exhaustive check on symbol strings up to length 8
        over a 2-symbol alphabet for every (l, r) pair."""
        import itertools

        def greedy(syms, l, r):
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            return out

        def fold(syms, l, r):
            acc = [syms[0]]
            for x in syms[1:]:
                if acc[-1] == l and x == r:
                    acc[-1] = l + r
                else:
                    acc.append(x)
            return acc

        for n in range(1, 9):
            for syms in itertools.product("ab", repeat=n):
                for l, r in itertools.product("ab", repeat=2):
                    assert fold(list(syms), l, r) == greedy(list(syms), l, r)


class TestDelong:
    def test_component_means_equal_auc(self, spark, sf_dir):
        """DeLong internal identity: each model's AUC emitted by
        eval_auc_delong must equal stats_auc's exact Mann-Whitney AUC for
        the same (value, purchase) scoring — mean V10 == rank-sum AUC."""
        got = registry.REGISTRY["eval_auc_delong"](spark, sf_dir).first()
        auc = registry.REGISTRY["stats_auc"](spark, sf_dir).first()
        assert got["n_pos"] == auc["n_pos"] and got["n_neg"] == auc["n_neg"]
        assert abs(got["auc_a"] - round(auc["auc"], 6)) <= 1e-6

    def test_matches_numpy_delong(self, spark, sf_dir):
        """Independent known-answer: recompute DeLong z with numpy
        structural components (midrank arrays, no shared code path)."""
        import hashlib

        import pandas as pd

        ev = pd.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_id", "event_type", "value"]
        )
        ev = ev[ev["value"].notna()]
        y = (ev["event_type"] == "purchase").to_numpy(dtype=np.int64)
        sa = (ev["value"].astype("float64").round(2) * 100).round().to_numpy("int64")
        sb = np.array(
            [
                int(hashlib.sha256(f"cal:{e}".encode()).hexdigest()[:15], 16)
                % (1 << 30)
                for e in ev["event_id"]
            ],
            dtype=np.int64,
        )

        def midrank(x):
            order = np.argsort(x, kind="mergesort")
            ranks = np.empty(len(x), dtype=np.float64)
            sx = x[order]
            i = 0
            while i < len(x):
                j = i
                while j + 1 < len(x) and sx[j + 1] == sx[i]:
                    j += 1
                ranks[order[i : j + 1]] = (i + j) / 2.0 + 1.0
                i = j + 1
            return ranks

        def v_components(s):
            pos, neg = s[y == 1], s[y == 0]
            m, n = len(pos), len(neg)
            r_all = midrank(np.concatenate([pos, neg]))
            r_pos = midrank(pos)
            r_neg = midrank(neg)
            v10 = (r_all[:m] - r_pos) / n
            v01 = 1.0 - (r_all[m:] - r_neg) / m
            return v10, v01

        va10, va01 = v_components(sa)
        vb10, vb01 = v_components(sb)
        auc_a, auc_b = va10.mean(), vb10.mean()
        d10 = va10 - vb10
        d01 = va01 - vb01
        var = d10.var(ddof=1) / len(d10) + d01.var(ddof=1) / len(d01)
        z = (auc_a - auc_b) / np.sqrt(var)

        got = registry.REGISTRY["eval_auc_delong"](spark, sf_dir).first()
        assert abs(got["auc_a"] - auc_a) <= 1e-6
        assert abs(got["auc_b"] - auc_b) <= 1e-6
        assert abs(got["z_delong"] - z) <= 1e-5
        assert got["significant"] == (abs(z) > 1.959964)


class TestCvm:
    def test_rank_form_equals_ecdf_definition(self):
        """The Anderson rank form both engines implement must equal the
        textbook ECDF definition T = nm/N^2 * sum_pooled (F_a - F_b)^2 on
        tie-free data (the identity the op's algebra is derived from) —
        an independent numpy check that breaks the mirrored-formula loop."""
        rng = np.random.default_rng(11)
        for _ in range(20):
            n, m = int(rng.integers(3, 40)), int(rng.integers(3, 40))
            pool = rng.permutation(n + m)  # distinct integers -> no ties
            a, b = np.sort(pool[:n]), np.sort(pool[n:])
            # direct ECDF form
            allv = np.sort(pool)
            fa = np.searchsorted(a, allv, side="right") / n
            fb = np.searchsorted(b, allv, side="right") / m
            t_direct = n * m / (n + m) ** 2 * np.sum((fa - fb) ** 2)
            # rank form (the op's algebra, 6x-scaled integer blocks)
            r_all = np.argsort(np.argsort(allv)) + 1
            ra = np.sort(r_all[np.searchsorted(allv, a)])
            rb = np.sort(r_all[np.searchsorted(allv, b)])
            u = n * np.sum((ra - np.arange(1, n + 1)) ** 2) + m * np.sum(
                (rb - np.arange(1, m + 1)) ** 2
            )
            nn = n + m
            t_rank = u / (nn * n * m) - (4 * n * m - 1) / (6 * nn)
            assert abs(t_direct - t_rank) < 1e-9

    def test_engine_matches_numpy_on_fixture(self, spark, sf_dir):
        """End-to-end known answer: recompute T with numpy midranks from
        the raw parquet (independent code path incl. tie handling)."""
        import pandas as pd

        ev = pd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "value"])
        ev = ev[ev["event_type"].isin(["view", "click"]) & ev["value"].notna()]
        a = np.sort(ev.loc[ev["event_type"] == "view", "value"].to_numpy())
        b = np.sort(ev.loc[ev["event_type"] == "click", "value"].to_numpy())
        n, m = len(a), len(b)
        pooled = np.concatenate([a, b])
        order = np.argsort(pooled, kind="mergesort")
        ranks = np.empty(len(pooled))
        sx = pooled[order]
        i = 0
        while i < len(sx):
            j = i
            while j + 1 < len(sx) and sx[j + 1] == sx[i]:
                j += 1
            ranks[order[i : j + 1]] = (i + j) / 2.0 + 1.0
            i = j + 1
        ra = np.sort(ranks[:n])
        rb = np.sort(ranks[n:])
        u = n * np.sum((ra - np.arange(1, n + 1)) ** 2) + m * np.sum(
            (rb - np.arange(1, m + 1)) ** 2
        )
        nn = n + m
        t_rank = u / (nn * n * m) - (4 * n * m - 1) / (6 * nn)
        from wri_data_processing_spark import registry as reg

        got = reg.REGISTRY["stats_cvm"](spark, sf_dir).first()
        assert got["n_view"] == n and got["n_click"] == m
        assert abs(got["cvm_t"] - t_rank) < 1e-5
        assert got["rejected"] == (t_rank > 0.461)


class TestBrunnerMunzel:
    def test_matches_numpy_reference(self, spark, sf_dir):
        """Independent numpy BM (midrank arrays, scipy's formulation):
        caught a real (m-n)/2 offset bug the mirrored oracle was blind to
        during development — this test is the non-mirrored proof."""
        import pandas as pd

        ev = pd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "value"])
        ev = ev[ev["event_type"].isin(["view", "click"]) & ev["value"].notna()]
        a = ev.loc[ev["event_type"] == "view", "value"].to_numpy()
        b = ev.loc[ev["event_type"] == "click", "value"].to_numpy()
        n, m = len(a), len(b)

        def midrank(x):
            order = np.argsort(x, kind="mergesort")
            ranks = np.empty(len(x))
            sx = x[order]
            i = 0
            while i < len(sx):
                j = i
                while j + 1 < len(sx) and sx[j + 1] == sx[i]:
                    j += 1
                ranks[order[i : j + 1]] = (i + j) / 2.0 + 1.0
                i = j + 1
            return ranks

        r_all = midrank(np.concatenate([a, b]))
        ra, rb = r_all[:n], r_all[n:]
        ha, hb = midrank(a), midrank(b)
        pa, pb = ra - ha, rb - hb
        s2a = pa.var(ddof=1)
        s2b = pb.var(ddof=1)
        p_hat = (rb.mean() - (m + 1) / 2.0) / n
        w = (
            n * m * (rb.mean() - ra.mean()) / (n + m) / np.sqrt(n * s2a + m * s2b)
        )
        got = registry.REGISTRY["stats_brunner_munzel"](spark, sf_dir).first()
        assert got["n_view"] == n and got["n_click"] == m
        assert abs(got["p_hat"] - p_hat) < 1e-6
        assert abs(got["w_bm"] - w) < 1e-5
        assert got["significant"] == (abs(w) > 1.959964)


class TestBartlettFriedman:
    def test_bartlett_matches_numpy(self, spark, sf_dir):
        import math

        import pandas as pd

        ev = pd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "value"])
        ev = ev[ev["value"].notna()]
        ci = (ev["value"].astype("float64").round(2) * 100).round().astype("int64")
        ks, ns, vs = [], [], []
        for et, grp in ci.groupby(ev["event_type"]):
            x = grp.to_numpy("float64")
            ns.append(len(x))
            vs.append(x.var(ddof=1))
        k = len(ns)
        n = sum(ns)
        sp2 = sum((ni - 1) * vi for ni, vi in zip(ns, vs)) / (n - k)
        t = (n - k) * math.log(sp2) - sum(
            (ni - 1) * math.log(vi) for ni, vi in zip(ns, vs)
        )
        c = 1.0 + (sum(1.0 / (ni - 1) for ni in ns) - 1.0 / (n - k)) / (3 * (k - 1))
        want = t / c
        got = registry.REGISTRY["stats_bartlett"](spark, sf_dir).first()
        assert got["k"] == k and got["n_total"] == n
        # the engine floor-quantizes group variances to integers (relative
        # 1e-8 here) and pico-floors the ln fold — allow 1e-4 slack
        assert abs(got["bartlett_t"] - want) < 1e-3
        assert got["rejected"] == (want > 9.487729)

    def test_friedman_matches_pure_python(self, spark, sf_dir):
        from collections import defaultdict
        from decimal import Decimal

        import pandas as pd

        ev = pd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"])
        ev = ev[ev["value"].notna()]
        ev["d"] = ev["ts"].dt.date
        sums = defaultdict(Decimal)
        for (d, t), grp in ev.groupby(["d", "event_type"]):
            sums[(d, t)] = sum(
                (Decimal(repr(v)).quantize(Decimal("0.000001")) for v in grp["value"]),
                Decimal(0),
            )
        types = sorted({t for (_, t) in sums})
        k = len(types)
        days = sorted({d for (d, _) in sums})
        blocks = [d for d in days if all((d, t) in sums for t in types)]
        n = len(blocks)
        rj2 = defaultdict(int)
        a2x4 = 0
        for d in blocks:
            vals = {t: sums[(d, t)] for t in types}
            for t in types:
                less = sum(1 for u in types if vals[u] < vals[t])
                eq = sum(1 for u in types if vals[u] == vals[t])
                r2 = 2 * less + eq + 1
                rj2[t] += r2
                a2x4 += r2 * r2
        num = sum(v * v for v in rj2.values()) - n * n * k * (k + 1) ** 2
        den = a2x4 - n * k * (k + 1) ** 2
        want = (k - 1) * num / den
        got = registry.REGISTRY["stats_friedman"](spark, sf_dir).first()
        assert got["n_blocks"] == n and got["k"] == k
        assert abs(got["friedman_t"] - want) < 1e-5
