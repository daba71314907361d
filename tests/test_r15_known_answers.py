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


class TestTextBm25Batch:
    def test_q1_equals_single_query_ranking(self, spark, sf_dir):
        """Batch query 1 is PINNED to text_bm25_rank's registered query, so
        its top-10 must be exactly the single-query op's top-20 prefix —
        the cross-op consistency contract that proves the batch shape
        changed the PLAN, not the arithmetic."""
        from wri_data_processing_spark.queries.llm_pipeline import (
            _BM25_BATCH_QUERIES,
            _BM25_TERMS,
        )

        assert _BM25_BATCH_QUERIES[0][1] == _BM25_TERMS
        rank = registry.REGISTRY["text_bm25_rank"](spark, sf_dir).collect()
        batch = registry.REGISTRY["text_bm25_batch"](spark, sf_dir).collect()
        q1 = [r for r in batch if r["query_id"] == 1]
        assert [r["doc_id"] for r in q1] == [r["doc_id"] for r in rank[:10]]
        for b, s in zip(q1, rank[:10]):
            assert b["score"] == s["score"]

    def test_two_term_query_replay(self, spark, sf_dir):
        """Independent pure-Python BM25 for query 3 (the 2-term query —
        different term count than the pinned single-query op, so this
        replay exercises the |terms|-generic path): Counters + math.log,
        not either engine's expression tree."""
        import math

        from wri_data_processing_spark.queries.llm_pipeline import (
            _BM25_BATCH_QUERIES,
        )

        qid, terms = _BM25_BATCH_QUERIES[2]
        assert len(terms) == 2
        docs = pd.read_parquet(f"{sf_dir}/documents.parquet")[["doc_id", "text"]]
        toks = {int(r.doc_id): _toks(r.text) for r in docs.itertuples()}
        n_docs = len(toks)
        sum_dl = sum(len(t) for t in toks.values())
        avgdl = sum_dl / n_docs
        df = {t: sum(1 for tk in toks.values() if t in tk) for t in terms}
        scored = []
        for did, tk in toks.items():
            tf = {t: tk.count(t) for t in terms}
            if sum(tf.values()) == 0:
                continue
            s = 0.0
            for t in terms:  # fixed query-tuple order, as both engines
                idf = math.log(1.0 + (n_docs - df[t] + 0.5) / (df[t] + 0.5))
                s += idf * (tf[t] * 2.2) / (
                    tf[t] + 1.2 * (0.25 + 0.75 * len(tk) / avgdl)
                )
            scored.append((did, sum(1 for t in terms if tf[t] > 0), round(s, 6)))
        scored.sort(key=lambda r: (-r[2], r[0]))
        got = [
            r
            for r in registry.REGISTRY["text_bm25_batch"](spark, sf_dir).collect()
            if r["query_id"] == qid
        ]
        assert len(got) == 10
        for g, (did, n_terms, score) in zip(got, scored[:10]):
            assert g["doc_id"] == did
            assert g["n_terms"] == n_terms
            assert abs(g["score"] - score) < 2e-6  # both ROUND-6

    def test_plan_shape(self, spark, sf_dir):
        """The serving-shape pin (VERDICT r14 item 4 'done' criterion): the
        per-query rank must compile to WindowGroupLimit (map-side rank
        pruning before the exchange), and the only nested loop is the
        whitelisted 1-row corpus-stats broadcast — no cartesian product."""
        df = registry.REGISTRY["text_bm25_batch"](spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "WindowGroupLimit" in plan
        assert "CartesianProduct" not in plan
        # one documents scan feeds the tf columns, one the corpus stats —
        # the text_bm25_rank budget; more means a regression re-reads text
        assert plan.count("Scan parquet") <= 2


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


class TestEvalChrf:
    def _replay(self, sf_dir):
        """Independent chrF counts: whitespace-stripped char n-grams from
        Counters, NOT the engine's (pair, n, gram-hash) fold."""
        docs = pd.read_parquet(f"{sf_dir}/documents.parquet")[["doc_id", "text"]]
        cand: dict[int, dict[int, Counter]] = {}
        ref: dict[int, dict[int, Counter]] = {}
        for _, row in docs.iterrows():
            pair, side = int(row.doc_id) // 2, int(row.doc_id) % 2
            s = re.sub(r"\s+", "", row.text)
            by_n = (cand if side == 1 else ref).setdefault(pair, {})
            for n in range(1, 7):
                by_n[n] = Counter(s[i : i + n] for i in range(len(s) - n + 1))
        m = dict.fromkeys(range(1, 7), 0)
        t = dict.fromkeys(range(1, 7), 0)
        r = dict.fromkeys(range(1, 7), 0)
        for pair in set(cand) | set(ref):
            c_by_n = cand.get(pair, {n: Counter() for n in range(1, 7)})
            r_by_n = ref.get(pair, {n: Counter() for n in range(1, 7)})
            for n in range(1, 7):
                t[n] += sum(c_by_n[n].values())
                r[n] += sum(r_by_n[n].values())
                m[n] += sum(
                    min(cnt, r_by_n[n].get(g, 0)) for g, cnt in c_by_n[n].items()
                )
        return m, t, r

    def test_corpus_chrf_replay(self, spark, sf_dir):
        m, t, r = self._replay(sf_dir)
        got = registry.REGISTRY["eval_chrf"](spark, sf_dir).collect()
        assert len(got) == 1
        row = got[0]
        for n in range(1, 7):
            assert row[f"m{n}"] == m[n], f"m{n}"
            assert row[f"t{n}"] == t[n], f"t{n}"
            assert row[f"r{n}"] == r[n], f"r{n}"
        # fixed-order 6-term chains, then beta=2 harmonic combine
        chrp = sum((m[n] / t[n] if t[n] else 0.0) for n in range(1, 7)) / 6.0
        chrr = sum((m[n] / r[n] if r[n] else 0.0) for n in range(1, 7)) / 6.0
        chrf = 5.0 * chrp * chrr / (4.0 * chrp + chrr) if chrp + chrr else 0.0
        assert row["chrp"] == round(chrp, 6)
        assert row["chrr"] == round(chrr, 6)
        assert abs(row["chrf"] - round(chrf, 6)) <= 1e-6  # reassoc-tolerant

    def test_liveness(self, spark, sf_dir):
        """chrF must be a real fraction: unigram char overlap is dense
        (shared alphabet), 6-gram overlap sparse — strictly decreasing
        per-order precision is the shape a real corpus shows."""
        row = registry.REGISTRY["eval_chrf"](spark, sf_dir).collect()[0]
        assert 0 < row["m6"] < row["m1"]
        assert 0.0 < row["chrf"] < 1.0
        assert row["m1"] / row["t1"] > row["m6"] / row["t6"]

    def test_hand_computed_fixture(self):
        """cand='ab cd', ref='ab ce' -> stripped 'abcd' vs 'abce'.
        1-grams: m=3 (a,b,c; d vs e miss), t=r=4. 2-grams: cand
        {ab,bc,cd}, ref {ab,bc,ce}: m=2, t=r=3."""
        c, r = "abcd", "abce"
        for n, exp_m, exp_t in ((1, 3, 4), (2, 2, 3)):
            cc = Counter(c[i : i + n] for i in range(len(c) - n + 1))
            rc = Counter(r[i : i + n] for i in range(len(r) - n + 1))
            m = sum(min(v, rc.get(g, 0)) for g, v in cc.items())
            assert (m, sum(cc.values())) == (exp_m, exp_t)


class TestEvalTokenF1:
    def _replay(self, sf_dir):
        """Independent macro token-F1: Python big-int pico fixed-point —
        the documented definition ((x*10^12) // denom per pair, exact sum),
        not either engine's decimal expression tree."""
        docs = pd.read_parquet(f"{sf_dir}/documents.parquet")[["doc_id", "text"]]
        cand: dict[int, Counter] = {}
        ref: dict[int, Counter] = {}
        for _, row in docs.iterrows():
            pair, side = int(row.doc_id) // 2, int(row.doc_id) % 2
            (cand if side == 1 else ref)[pair] = Counter(_toks(row.text))
        P = 10**12
        n_pairs = p_sum = r_sum = f_sum = m_tot = tc_tot = tr_tot = 0
        for pair in set(cand) | set(ref):
            cc = cand.get(pair, Counter())
            rc = ref.get(pair, Counter())
            m = sum(min(v, rc.get(g, 0)) for g, v in cc.items())
            tc, tr = sum(cc.values()), sum(rc.values())
            n_pairs += 1
            m_tot += m
            tc_tot += tc
            tr_tot += tr
            p_sum += (m * P) // tc if tc else 0
            r_sum += (m * P) // tr if tr else 0
            f_sum += (2 * m * P) // (tc + tr)
        return {
            "n_pairs": n_pairs,
            "m_tot": m_tot,
            "cand_tokens": tc_tot,
            "ref_tokens": tr_tot,
            "macro_precision": round(p_sum / (n_pairs * P), 6),
            "macro_recall": round(r_sum / (n_pairs * P), 6),
            "macro_f1": round(f_sum / (n_pairs * P), 6),
        }

    def test_macro_f1_replay(self, spark, sf_dir):
        exp = self._replay(sf_dir)
        got = registry.REGISTRY["eval_token_f1"](spark, sf_dir).collect()
        assert len(got) == 1
        row = got[0].asDict()
        for k, v in exp.items():
            assert row[k] == v, k

    def test_liveness_and_harmonic_bound(self, spark, sf_dir):
        """F1 must sit strictly between 0 and min(P, R)'s harmonic reach:
        for every pair f1 <= max(p, r), so the macro means obey the same
        bound; all three must be real fractions at the tested SF."""
        row = registry.REGISTRY["eval_token_f1"](spark, sf_dir).collect()[0]
        assert 0.0 < row["macro_f1"] < 1.0
        assert 0.0 < row["macro_precision"] < 1.0
        assert 0.0 < row["macro_recall"] < 1.0
        assert row["macro_f1"] <= max(row["macro_precision"], row["macro_recall"]) + 1e-9

    def test_hand_computed_fixture(self):
        """cand='a b a c' vs ref='a b b d': m=2, tc=tr=4 ->
        p=r=0.5, f1=2*2/8=0.5 (harmonic identity: 2pr/(p+r)=2m/(tc+tr))."""
        cc, rc = Counter(["a", "b", "a", "c"]), Counter(["a", "b", "b", "d"])
        m = sum(min(v, rc.get(g, 0)) for g, v in cc.items())
        tc, tr = sum(cc.values()), sum(rc.values())
        assert (m, tc, tr) == (2, 4, 4)
        assert 2 * m / (tc + tr) == 0.5 == (2 * (m / tc) * (m / tr)) / (m / tc + m / tr)


class TestEvalDistinctN:
    def _replay(self, sf_dir):
        """Independent distinct-n: Python sets over candidate-side token
        n-grams (doc_id odd), not the engine's hash fold."""
        docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
        docs = docs[docs.doc_id % 2 == 1][["text"]]
        out = {}
        for n in (1, 2):
            seen: set = set()
            total = 0
            for text in docs.text:
                toks = _toks(text)
                grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
                total += len(grams)
                seen.update(grams)
            out[n] = (len(seen), total)
        return out

    def test_distinct_n_replay(self, spark, sf_dir):
        exp = self._replay(sf_dir)
        got = registry.REGISTRY["eval_distinct_n"](spark, sf_dir).collect()
        assert len(got) == 1
        row = got[0]
        for n in (1, 2):
            d, t = exp[n]
            assert row[f"d{n}"] == d, f"d{n}"
            assert row[f"t{n}"] == t, f"t{n}"
            assert row[f"distinct_{n}"] == (d / t if t else 0.0)

    def test_liveness_and_ordering(self, spark, sf_dir):
        """Bigram diversity must exceed unigram diversity on any natural
        corpus (d2/t2 > d1/t1 — vocab reuse outpaces bigram reuse), and
        both must be real fractions: neither all-unique nor collapsed."""
        row = registry.REGISTRY["eval_distinct_n"](spark, sf_dir).collect()[0]
        assert 0.0 < row["distinct_1"] < row["distinct_2"] < 1.0


def _lev(a: str, b: str) -> int:
    """Textbook Wagner–Fischer DP — independent of both engines' C/JVM
    implementations (two-row rolling table)."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[len(b)]


class TestEvalCer:
    def _replay(self, sf_dir):
        """Independent CER arithmetic: Python DP edit distance + big-int
        pico fixed-point macro fold (the eval_token_f1 replay convention)."""
        docs = pd.read_parquet(f"{sf_dir}/documents.parquet")[["doc_id", "text"]]
        cand: dict[int, str] = {}
        ref: dict[int, str] = {}
        for _, row in docs.iterrows():
            pair, side = int(row.doc_id) // 2, int(row.doc_id) % 2
            (cand if side == 1 else ref)[pair] = row.text.strip()
        P = 10**12
        n_pairs = edits_tot = ref_tot = cand_tot = c_sum = 0
        for pair in set(cand) & set(ref):
            c, r = cand[pair], ref[pair]
            e = _lev(c, r)
            n_pairs += 1
            edits_tot += e
            ref_tot += len(r)
            cand_tot += len(c)
            c_sum += (e * P) // max(len(r), 1)
        return {
            "n_pairs": n_pairs,
            "total_edits": edits_tot,
            "ref_chars": ref_tot,
            "cand_chars": cand_tot,
            "cer_micro": round(edits_tot / ref_tot, 6) if ref_tot else 0.0,
            "cer_macro": round(c_sum / (n_pairs * P), 6),
        }

    def test_cer_replay(self, spark, sf_dir):
        exp = self._replay(sf_dir)
        got = registry.REGISTRY["eval_cer"](spark, sf_dir).collect()
        assert len(got) == 1
        row = got[0].asDict()
        for k, v in exp.items():
            assert row[k] == v, (k, row[k], v)

    def test_liveness(self, spark, sf_dir):
        """CER must be a real error rate at the tested SF: nonzero (the
        candidates aren't copies of their references), yet strictly below
        the delete-all-insert-all degenerate alignment (total_edits <
        ref_chars + cand_chars — the pairs share real structure). CER > 1
        is legitimate when candidates run longer than references
        (insertions are edits), so 1.0 is NOT an upper bound; the
        Levenshtein envelope edits <= max(|c|, |r|) per pair is."""
        row = registry.REGISTRY["eval_cer"](spark, sf_dir).collect()[0]
        assert row["n_pairs"] > 0
        assert 0.0 < row["cer_micro"]
        assert 0.0 < row["cer_macro"]
        assert row["total_edits"] < row["ref_chars"] + row["cand_chars"]

    def test_hand_computed_fixture(self):
        """kitten->sitting is the canonical 3-edit case; the DP helper must
        reproduce it plus the degenerate empty/equal cases the engine's
        zero-guards lean on."""
        assert _lev("kitten", "sitting") == 3
        assert _lev("", "abc") == 3
        assert _lev("", "") == 0
        assert _lev("ab" * 200, "ba" * 200) == 2

    def test_ascii_contract_probe(self, spark, sf_dir):
        """The documented oracle CONTRACT (llm_pipeline.eval_cer docstring):
        DuckDB's levenshtein counts BYTES, Spark's counts CODEPOINTS — they
        diverge on multi-byte characters ('héllo'->'hallo': 1 on Spark, 2
        on DuckDB), and the oracle equality therefore holds on ASCII text
        only. Pin BOTH engine facts and the corpus precondition so an
        engine upgrade or a fixture change that breaks the contract fails
        here, not in the driver."""
        import duckdb

        from pyspark.sql import functions as F

        assert duckdb.connect().execute(
            "select levenshtein('héllo', 'hallo')"
        ).fetchone()[0] == 2
        spark_d = (
            spark.range(1)
            .select(F.levenshtein(F.lit("héllo"), F.lit("hallo")))
            .collect()[0][0]
        )
        assert spark_d == 1
        non_ascii = (
            pd.read_parquet(f"{sf_dir}/documents.parquet")["text"]
            .str.contains(r"[^\x00-\x7f]", regex=True)
            .sum()
        )
        assert non_ascii == 0, "corpus gained non-ASCII text: CER oracle contract void"


class TestEvalDedupPr:
    def _replay(self, sf_dir):
        """Full independent replay of BOTH pair generators in pure Python:
        exact trigram-set Jaccard with the DF-cap semantics, and the
        declared-permutation MinHash signatures/banding — hashlib + ints,
        neither engine's SQL."""
        import hashlib
        from collections import defaultdict

        from wri_data_processing_spark.queries.llm_dedup import (
            _JACCARD_THRESHOLD,
            _MAX_DF,
            _MINHASH_BANDS,
            _MINHASH_P,
            _MINHASH_PERMS,
            _DEDUP_PR_THRESHOLDS,
        )

        docs = pd.read_parquet(f"{sf_dir}/documents.parquet")[["doc_id", "text"]]
        reps: dict[str, int] = {}
        for _, row in docs.iterrows():
            t = row.text
            if t not in reps or row.doc_id < reps[t]:
                reps[t] = int(row.doc_id)
        shingles = {}
        for text, did in reps.items():
            toks = _toks(text)
            shingles[did] = {
                " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
            }

        # exact side: posting lists with the DF cap
        posting = defaultdict(list)
        for did, ss in shingles.items():
            for s in ss:
                posting[s].append(did)
        common = defaultdict(int)
        for s, ds in posting.items():
            if 2 <= len(ds) <= _MAX_DF:
                ds = sorted(ds)
                for i in range(len(ds)):
                    for k in range(i + 1, len(ds)):
                        common[(ds[i], ds[k])] += 1
        truth = {
            p
            for p, c in common.items()
            if c / (len(shingles[p[0]]) + len(shingles[p[1]]) - c)
            >= _JACCARD_THRESHOLD
        }

        # minhash side: sha 60-bit base hash, declared permutations, banding
        def sig(ss):
            hs = [
                int(hashlib.sha256(s.encode()).hexdigest()[:15], 16) % _MINHASH_P
                for s in ss
            ]
            return [
                min((a * h + b) % _MINHASH_P for h in hs) for a, b in _MINHASH_PERMS
            ]

        sigs = {did: sig(ss) for did, ss in shingles.items() if ss}
        buckets = defaultdict(set)
        for did, ms in sigs.items():
            for j in range(_MINHASH_BANDS):
                buckets[(j, tuple(ms[4 * j : 4 * j + 4]))].add(did)
        cands = set()
        for ds in buckets.values():
            ds = sorted(ds)
            for i in range(len(ds)):
                for k in range(i + 1, len(ds)):
                    cands.add((ds[i], ds[k]))
        est = {
            p: sum(x == y for x, y in zip(sigs[p[0]], sigs[p[1]])) / 16.0
            for p in cands
        }

        rows = []
        for th in _DEDUP_PR_THRESHOLDS:
            pred = {p for p, e in est.items() if e >= th}
            rows.append((th, len(truth), len(pred), len(truth & pred)))
        return rows

    def test_curve_replay(self, spark, sf_dir):
        exp = self._replay(sf_dir)
        got = registry.REGISTRY["eval_dedup_pr"](spark, sf_dir).collect()
        assert len(got) == 4
        for row, (th, n_truth, n_pred, n_tp) in zip(got, exp):
            assert row["th"] == th
            assert row["n_truth"] == n_truth
            assert row["n_pred"] == n_pred
            assert row["n_tp"] == n_tp
            if n_pred:
                assert row["prec"] == round(n_tp / n_pred, 6)
            if n_truth:
                assert row["rec"] == round(n_tp / n_truth, 6)

    def test_shares_generator_with_lsh_op(self, spark, sf_dir):
        """The th=0.25 row audits dedup_minhash_lsh's SHIPPED operating
        point: its n_pred must equal the lsh op's row count exactly —
        the cross-op contract the shared helper exists to guarantee."""
        lsh = registry.REGISTRY["dedup_minhash_lsh"](spark, sf_dir).count()
        row = registry.REGISTRY["eval_dedup_pr"](spark, sf_dir).collect()[0]
        assert row["th"] == 0.25
        assert row["n_pred"] == lsh

    def test_curve_monotone_and_fn_branch_live(self, spark, sf_dir):
        """Raising the threshold can only shrink the candidate set (n_pred,
        n_tp non-increasing; recall non-increasing), and the strict 16/16
        point must MISS some truth pairs at every SF (the banding-loss
        branch this op exists to expose — near-verbatim pairs still sit
        below minhash-identical)."""
        got = registry.REGISTRY["eval_dedup_pr"](spark, sf_dir).collect()
        for a, b in zip(got, got[1:]):
            assert a["n_pred"] >= b["n_pred"]
            assert a["n_tp"] >= b["n_tp"]
            assert a["rec"] >= b["rec"]
        assert got[-1]["n_tp"] < got[-1]["n_truth"]
        assert all(r["n_truth"] == got[0]["n_truth"] for r in got)
