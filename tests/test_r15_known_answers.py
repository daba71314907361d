"""r15 known-answer tests: pure-Python replays of the round's new ops —
independent arithmetic, not the engine's or the oracle's expression trees
(the Wilcoxon-catch house rule).
"""

from __future__ import annotations

import re
from collections import Counter

import pandas as pd

from wri_data_processing_spark import registry

registry.load_all()


def _toks(text: str) -> list[str]:
    # Engine/oracle convention: split(trim('')) yields [''] on both engines
    # — an empty doc contributes one empty-string unigram, not zero tokens.
    return re.split(r"\s+", text.strip())


class TestEvalRougeN:
    def _replay(self, sf_dir):
        """Independent ROUGE-1/2 arithmetic: clipped matches and reference
        totals from Counters, NOT the engine's (pair, n, gram-hash) fold."""
        docs = pd.read_parquet(f"{sf_dir}/documents.parquet")[["doc_id", "text"]]
        cand: dict[int, dict[int, Counter]] = {}
        ref: dict[int, dict[int, Counter]] = {}
        for _, row in docs.iterrows():
            pair, side = int(row.doc_id) // 2, int(row.doc_id) % 2
            toks = _toks(row.text)
            by_n = (cand if side == 1 else ref).setdefault(pair, {})
            for n in (1, 2):
                by_n[n] = Counter(
                    " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
                )
        m = {1: 0, 2: 0}
        r = {1: 0, 2: 0}
        t = {1: 0, 2: 0}
        for pair in set(cand) | set(ref):
            c_by_n = cand.get(pair, {1: Counter(), 2: Counter()})
            r_by_n = ref.get(pair, {1: Counter(), 2: Counter()})
            for n in (1, 2):
                r[n] += sum(r_by_n[n].values())
                t[n] += sum(c_by_n[n].values())
                m[n] += sum(
                    min(cnt, r_by_n[n].get(g, 0)) for g, cnt in c_by_n[n].items()
                )
        return m, r, t

    def test_corpus_rouge_replay(self, spark, sf_dir):
        m, r, t = self._replay(sf_dir)
        got = registry.REGISTRY["eval_rouge_n"](spark, sf_dir).collect()
        assert len(got) == 1
        row = got[0]
        for n in (1, 2):
            assert row[f"m{n}"] == m[n], f"m{n}"
            assert row[f"r{n}"] == r[n], f"r{n}"
            assert row[f"t{n}"] == t[n], f"t{n}"
        assert row["rouge1"] == m[1] / r[1]  # one IEEE division — exact
        assert row["rouge2"] == m[2] / r[2]

    def test_liveness(self, spark, sf_dir):
        """Both recalls must be real fractions at the tested SF (clipping
        bites at n=1; bigram recall is sparse but nonzero)."""
        row = registry.REGISTRY["eval_rouge_n"](spark, sf_dir).collect()[0]
        assert 0 < row["m1"] < row["r1"]
        assert 0 < row["m2"] < row["r2"]
        assert 0.0 < row["rouge1"] < 1.0
        assert 0.0 < row["rouge2"] < row["rouge1"]

    def test_hand_computed_fixture(self):
        """Hand fixture (the eval_bleu one, recall side): cand='a b a c',
        ref='a b b d'. unigrams: m1=min(2,1)+min(1,2)=2, r1=4 -> rouge1=0.5.
        bigrams: cand {ab,ba,ac}, ref {ab,bb,bd}: m2=1, r2=3 -> rouge2=1/3."""
        cand, ref = ["a", "b", "a", "c"], ["a", "b", "b", "d"]
        for n, exp_m, exp_r in ((1, 2, 4), (2, 1, 3)):
            cc = Counter(" ".join(cand[i : i + n]) for i in range(len(cand) - n + 1))
            rc = Counter(" ".join(ref[i : i + n]) for i in range(len(ref) - n + 1))
            m = sum(min(v, rc.get(g, 0)) for g, v in cc.items())
            assert (m, sum(rc.values())) == (exp_m, exp_r)


class TestDqVolumePositiveControl:
    def _replay(self, sf_dir):
        """Independent replay in pandas: daily counts -> per-type total ->
        alternating (3T, T) injection -> lag ratio -> >0.5 gate."""
        ev = pd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "ts"])
        ev["d"] = pd.to_datetime(ev["ts"]).dt.date
        daily = ev.groupby(["event_type", "d"]).size().rename("n").reset_index()
        out = []
        for etype, grp in daily.groupby("event_type"):
            grp = grp.sort_values("d").reset_index(drop=True)
            t = int(grp["n"].sum())
            # day-rank is 1-based: odd ranks get 3T, even ranks T
            inj = [t * (1 + 2 * ((i + 1) % 2)) for i in range(len(grp))]
            for i in range(1, len(grp)):
                pct = (inj[i] - inj[i - 1]) / inj[i - 1]
                out.append(
                    (etype, str(grp["d"][i]), inj[i], inj[i - 1], pct, abs(pct) > 0.5)
                )
        return pd.DataFrame(
            out, columns=["event_type", "day", "n", "prev_n", "pct_change", "anomaly"]
        )

    def test_control_replay(self, spark, sf_dir):
        exp = self._replay(sf_dir).sort_values(["event_type", "day"]).reset_index(drop=True)
        got = (
            registry.REGISTRY["dq_volume_positive_control"](spark, sf_dir)
            .toPandas()
            .sort_values(["event_type", "day"])
            .reset_index(drop=True)
        )
        assert len(got) == len(exp) > 0
        pd.testing.assert_frame_equal(
            got[exp.columns.tolist()], exp, check_dtype=False
        )

    def test_alert_fires_everywhere(self, spark, sf_dir):
        """The control's CONTRACT: anomaly must be True on EVERY transition —
        a regression that silences the pager (sign flip, wrong threshold,
        broken lag) turns this red. The pct values must be exactly the
        injected swings: +2.0 (3x surge) and -2/3 (collapse to a third)."""
        got = registry.REGISTRY["dq_volume_positive_control"](spark, sf_dir).toPandas()
        assert len(got) > 0
        assert bool(got["anomaly"].all())
        vals = sorted(set(round(v, 9) for v in got["pct_change"]))
        assert vals == [round(-2.0 / 3.0, 9), 2.0]

    def test_halving_would_not_fire(self):
        """Documents WHY the injection is 3x, not the verdict's literal
        'halving': a pure 2x drop lands exactly ON the strict >0.5 boundary
        and must NOT alarm under the production rule."""
        pct = (1 - 2) / 2  # count halves: prev=2T -> n=T
        assert abs(pct) == 0.5 and not (abs(pct) > 0.5)
