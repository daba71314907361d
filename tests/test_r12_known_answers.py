"""Round-12 known-answer tests: the mirrored-only proof-gap closure.

VERDICT r11 ("Next round" #1): a tail of formula-heavy ops had only the
mirrored engine<->DuckDB-oracle proof — the ONE proof class that has ever
let a formula bug through (Jarque-Bera r10; Brunner-Munzel and Cramér's V
r11, all caught by independent known-answer tests, none by the oracle).
These tests re-derive each statistic in PURE PYTHON / numpy straight from
the raw parquet, sharing zero code with the engine or the oracle SQL:

- text_kneser_ney      interpolated KN bigram cross-entropy
- text_bigram_lm       Jelinek-Mercer bigram per-doc cross-entropy
- text_lm_score        add-one unigram per-doc cross-entropy
- stats_cochran_q      k=3 repeated-measures binary test
- stats_fleiss_kappa   3-rater chance-corrected agreement
- stats_ljung_box      lag-1..7 portmanteau over daily counts
- stats_odds_ratio     2x2 OR/RR with Woolf CI
- stats_dunn_posthoc   pairwise rank z + BH step-up
- events_page_hinkley  exact-integer sequential drift detector

Tolerances: counts/integers exact; statistics computed by the engine as
ONE mirrored double tree get 1e-6..1e-5 (ROUND-6 emission); per-term
floor-quantized folds (kneser_ney) also get an UNQUANTIZED float check at
1e-4 so the quantization can't mask a formula error.
"""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter, defaultdict

import numpy as np
import pandas as pd
import pytest

from wri_data_processing_spark import registry

registry.load_all()

_TOK = re.compile(r"[a-z0-9]+")


def _doc_tokens(sf_dir):
    d = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return [(int(i), _TOK.findall(t.lower())) for i, t in zip(d["doc_id"], d["text"])]


def _daily_counts(sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])
    by_day = Counter(ev["ts"].dt.date)
    days = sorted(by_day)
    return days, [int(by_day[d]) for d in days]


class TestTextLMKnownAnswers:
    def test_kneser_ney(self, spark, sf_dir):
        # independent interpolated-KN reference (the ~30-line pure-Python
        # implementation the verdict asked for)
        c12 = Counter()
        for _, toks in _doc_tokens(sf_dir):
            for w1, w2 in zip(toks, toks[1:]):
                c12[(w1, w2)] += 1
        c1 = Counter()
        n1p_left = Counter()
        n1p_right = Counter()
        for (w1, w2), c in c12.items():
            c1[w1] += c
            n1p_left[w1] += 1
            n1p_right[w2] += 1
        n_types = len(c12)
        n_bigrams = sum(c12.values())
        d = 0.75

        def p_kn(w1, w2):
            return max(c12[(w1, w2)] - d, 0.0) / c1[w1] + d * n1p_left[w1] / c1[
                w1
            ] * n1p_right[w2] / n_types

        # formula-level check: unquantized mean negative log prob
        xent_float = (
            sum(-math.log(p_kn(w1, w2)) * c for (w1, w2), c in c12.items())
            / n_bigrams
        )
        # engine-discipline check: floor-scaled nano-unit fold (replicated
        # independently; catches scaling/weighting mistakes too)
        xent_q = (
            sum(
                math.floor(-math.log(p_kn(w1, w2)) * 1e9) * c
                for (w1, w2), c in c12.items()
            )
            / (1e9 * n_bigrams)
        )
        got = registry.REGISTRY["text_kneser_ney"](spark, sf_dir).first()
        assert got["n_bigrams"] == n_bigrams
        assert got["n_types"] == n_types
        assert abs(got["kn_xent"] - xent_q) < 5e-6
        assert abs(got["kn_xent"] - xent_float) < 1e-4

    def test_lm_score(self, spark, sf_dir):
        docs = _doc_tokens(sf_dir)
        vocab = Counter()
        for _, toks in docs:
            vocab.update(toks)
        n_total = sum(vocab.values())
        v_size = len(vocab)
        want = {}
        for doc_id, toks in docs:
            if not toks:
                continue
            cd = Counter(toks)
            xent = -sum(
                c * math.log((vocab[w] + 1.0) / (n_total + v_size))
                for w, c in cd.items()
            ) / len(toks)
            want[doc_id] = (len(toks), len(cd), xent)
        got = {
            r["doc_id"]: r
            for r in registry.REGISTRY["text_lm_score"](spark, sf_dir).collect()
        }
        assert set(got) == set(want)
        for doc_id, (n_tok, n_typ, xent) in want.items():
            r = got[doc_id]
            assert (r["n_tokens"], r["n_types"]) == (n_tok, n_typ), doc_id
            assert abs(r["xent"] - xent) < 2e-6, doc_id

    def test_bigram_lm(self, spark, sf_dir):
        docs = _doc_tokens(sf_dir)
        uni = Counter()
        for _, toks in docs:
            uni.update(toks)
        n_total = sum(uni.values())
        v_size = len(uni)
        cb = Counter()
        per_doc = {}
        for doc_id, toks in docs:
            if len(toks) < 2:
                continue
            db = Counter(zip(toks, toks[1:]))
            per_doc[doc_id] = db
            cb.update(db)
        cu = Counter()
        for (w1, _), c in cb.items():
            cu[w1] += c
        want = {}
        for doc_id, db in per_doc.items():
            n_bg = sum(db.values())
            s = 0.0
            for (w1, w2), c in db.items():
                p = 0.75 * (cb[(w1, w2)] + 1.0) / (cu[w1] + v_size) + 0.25 * (
                    uni[w2] + 1.0
                ) / (n_total + v_size)
                s += c * math.log(p)
            want[doc_id] = (n_bg, -s / n_bg)
        got = {
            r["doc_id"]: r
            for r in registry.REGISTRY["text_bigram_lm"](spark, sf_dir).collect()
        }
        assert set(got) == set(want)
        for doc_id, (n_bg, xent2) in want.items():
            r = got[doc_id]
            assert r["n_bigrams"] == n_bg, doc_id
            assert abs(r["xent2"] - xent2) < 2e-6, doc_id


class TestStatsKnownAnswersR12:
    def test_cochran_q(self, spark, sf_dir):
        ev = pd.read_parquet(
            f"{sf_dir}/events.parquet", columns=["ts", "user_id", "event_type"]
        )
        d0 = ev["ts"].dt.date.min()
        ev["w"] = ev["ts"].dt.date.map(lambda d: (d - d0).days // 7)
        ev["hit"] = (ev["event_type"] == "purchase").astype(int)
        bits = defaultdict(lambda: [0, 0, 0])
        users = set()
        for uid, w, hit in zip(ev["user_id"], ev["w"], ev["hit"]):
            users.add(uid)
            if w in (0, 1, 2) and hit:
                bits[uid][w] = 1
        n = len(users)
        cols = [sum(bits[u][j] for u in bits) for j in range(3)]
        rows = [sum(bits[u]) for u in users]
        t = sum(rows)
        k = 3.0
        q = (
            k
            * (k - 1)
            * sum((cj - t / k) ** 2 for cj in cols)
            / (k * t - sum(r * r for r in rows))
        )
        got = registry.REGISTRY["stats_cochran_q"](spark, sf_dir).first()
        assert got["n_users"] == n
        assert (got["hits_w0"], got["hits_w1"], got["hits_w2"]) == tuple(cols)
        assert abs(got["cochran_q"] - q) < 1e-5
        assert got["rejected"] == (q > 5.991465)

    def test_fleiss_kappa(self, spark, sf_dir):
        markers = {
            "en": ["the", "and", "with"],
            "es": ["el", "la", "con"],
            "fr": ["le", "la", "avec"],
            "de": ["der", "und", "mit"],
        }

        def predict(text):
            padded = f" {text} "
            score = {
                lang: sum(padded.count(f" {w} ") for w in ws)
                for lang, ws in markers.items()
            }
            if score["en"] >= max(score["es"], score["fr"], score["de"]) and score["en"] > 0:
                return "en"
            if score["es"] >= max(score["fr"], score["de"]) and score["es"] > 0:
                return "es"
            if score["fr"] >= score["de"] and score["fr"] > 0:
                return "fr"
            if score["de"] > 0:
                return "de"
            return "unknown"

        d = pd.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
        )
        items = []
        for doc_id, text, lang in zip(d["doc_id"], d["text"], d["lang"]):
            h = hashlib.sha256(f"fleiss:{int(doc_id)}".encode()).hexdigest()[:15]
            r3 = "en" if int(h, 16) % 8 == 0 else lang
            items.append([lang, predict(text), r3])
        n = len(items)
        r = 3
        p_bar = sum(
            (sum(c * c for c in Counter(row).values()) - r) / (r * (r - 1))
            for row in items
        ) / n
        cat_tot = Counter(c for row in items for c in row)
        p_e = sum((c / (n * r)) ** 2 for c in cat_tot.values())
        kappa = (p_bar - p_e) / (1.0 - p_e)
        got = registry.REGISTRY["stats_fleiss_kappa"](spark, sf_dir).first()
        assert (got["n_docs"], got["n_raters"]) == (n, 3)
        assert abs(got["p_bar"] - p_bar) < 1e-6
        assert abs(got["p_e"] - p_e) < 1e-6
        assert abs(got["fleiss_kappa"] - kappa) < 1e-5

    def test_ljung_box(self, spark, sf_dir):
        days, xs = _daily_counts(sf_dir)
        n = len(xs)
        mean = sum(xs) / n
        dev = {d: x - mean for d, x in zip(days, xs)}
        den = sum(v * v for v in dev.values())
        q = 0.0
        for h in range(1, 8):
            # calendar-shift pairing, exactly what the engine's date
            # equi-join does (a gap day drops its pairs)
            num = sum(
                dev[d] * dev[d2]
                for d in days
                if (d2 := d + pd.Timedelta(days=h).to_pytimedelta()) in dev
            )
            rho = num / den
            q += rho * rho / (n - h)
        q *= n * (n + 2.0)
        got = registry.REGISTRY["stats_ljung_box"](spark, sf_dir).first()
        assert got["n_days"] == n
        assert abs(got["ljung_box_q"] - q) < 1e-5
        assert got["autocorrelated"] == (q > 14.067140)

    def test_odds_ratio(self, spark, sf_dir):
        ev = pd.read_parquet(
            f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
        )
        exposed = (ev["user_id"] % 2 == 1).to_numpy()
        hit = (ev["event_type"] == "purchase").to_numpy()
        a = int((exposed & hit).sum())
        b = int((exposed & ~hit).sum())
        c = int((~exposed & hit).sum())
        d = int((~exposed & ~hit).sum())
        orr = a * d / (b * c)
        se = math.sqrt(1 / a + 1 / b + 1 / c + 1 / d)
        z = 1.959964
        rr = (a / (a + b)) / (c / (c + d))
        got = registry.REGISTRY["stats_odds_ratio"](spark, sf_dir).first()
        assert (got["a"], got["b"], got["c"], got["d"]) == (a, b, c, d)
        assert abs(got["odds_ratio"] - orr) < 1e-6
        assert abs(got["or_lo95"] - math.exp(math.log(orr) - z * se)) < 1e-5
        assert abs(got["or_hi95"] - math.exp(math.log(orr) + z * se)) < 1e-5
        assert abs(got["relative_risk"] - rr) < 1e-6
        assert got["significant"] == (
            math.log(orr) - z * se > 0 or math.log(orr) + z * se < 0
        )

    def test_dunn_posthoc(self, spark, sf_dir):
        ev = pd.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_type", "value"]
        )
        ev = ev[ev["value"].notna()]
        # midranks via pandas (independent of the engine's doubled-rank
        # prefix-sum machinery)
        ranks = ev["value"].rank(method="average")
        ntot = len(ev)
        mean_rank = ranks.groupby(ev["event_type"]).mean()
        ns = ev.groupby("event_type").size()
        tie_counts = Counter(ev["value"])
        tt = sum(t**3 - t for t in tie_counts.values())
        var_term = (ntot * (ntot + 1.0) * (ntot - 1.0) - tt) / (12.0 * (ntot - 1.0))
        types = sorted(ns.index)
        zs = {}
        for i, ta in enumerate(types):
            for tb in types[i + 1 :]:
                z = (mean_rank[ta] - mean_rank[tb]) / math.sqrt(
                    var_term * (1.0 / ns[ta] + 1.0 / ns[tb])
                )
                zs[(ta, tb)] = z
        # BH step-up on two-sided p-values (independent of the pinned-z
        # threshold route the engine takes)
        m = len(zs)
        pvals = {k: math.erfc(abs(z) / math.sqrt(2.0)) for k, z in zs.items()}
        order = sorted(pvals, key=lambda k: (pvals[k], k))
        cutoff = 0
        for i, k in enumerate(order, start=1):
            if pvals[k] <= 0.05 * i / m:
                cutoff = i
        sig = {k: (i <= cutoff) for i, k in enumerate(order, start=1)}
        got = registry.REGISTRY["stats_dunn_posthoc"](spark, sf_dir).collect()
        assert len(got) == m
        for r in got:
            k = (r["type_a"], r["type_b"])
            assert abs(r["z_dunn"] - zs[k]) < 1e-5, k
            assert r["bh_rank"] == order.index(k) + 1, k
            assert r["significant"] == sig[k], k


class TestPageHinkleyKnownAnswer:
    def test_page_hinkley(self, spark, sf_dir):
        # exact-integer replication with Python bigints: m_t = S_t*1e9 -
        # SUM_{s<=t} floor(S_s*1e9/s), gap vs running min, integer alarm
        days, xs = _daily_counts(sf_dir)
        s = 0
        fs_prefix = 0
        m_list = []
        for t, x in enumerate(xs, start=1):
            s += x
            fs_prefix += s * 10**9 // t
            m_list.append(s * 10**9 - fs_prefix)
        sn = s
        n = len(xs)
        run_min = None
        want = []
        for d, m in zip(days, m_list):
            run_min = m if run_min is None else min(run_min, m)
            gap = m - run_min
            want.append(
                (
                    str(d),
                    round(m / 1e9, 6),
                    round(gap / 1e9, 6),
                    2 * n * gap > sn * 10**9,
                )
            )
        got = registry.REGISTRY["events_page_hinkley"](spark, sf_dir).collect()
        assert len(got) == len(want)
        for r, (d, m_ph, gap, alarm) in zip(got, want):
            assert r["d"] == d
            assert abs(r["m_ph"] - m_ph) < 1e-9, d
            assert abs(r["gap"] - gap) < 1e-9, d
            assert r["alarm"] == alarm, d


class TestQualityClassifierKnownAnswer:
    def test_quality_classifier_score(self, spark, sf_dir):
        # independent recompute: hashlib sha256 per trigram, the pinned
        # weight formula restated (weights are CONFIG; what this verifies
        # independently is the hashing/feature/fold/sigmoid pipeline)
        W = [((j * 2654435761) % 4097) - 2048 for j in range(64)]
        d = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        want = {}
        for doc_id, text in zip(d["doc_id"], d["text"]):
            if len(text) < 3:
                continue
            wsum = 0
            for i in range(len(text) - 2):
                h = int(
                    hashlib.sha256(text[i : i + 3].encode()).hexdigest()[:15], 16
                )
                wsum += W[h % 64]
            n = len(text) - 2
            logit = wsum / (1024.0 * n)
            score = 1.0 / (1.0 + math.exp(-logit))
            bucket = "high" if score >= 0.6 else ("low" if score <= 0.4 else "mid")
            want[int(doc_id)] = (n, logit, score, bucket)
        got = {
            r["doc_id"]: r
            for r in registry.REGISTRY["quality_classifier_score"](
                spark, sf_dir
            ).collect()
        }
        assert set(got) == set(want)
        for doc_id, (n, logit, score, bucket) in want.items():
            r = got[doc_id]
            assert r["n_ngrams"] == n, doc_id
            assert abs(r["logit"] - logit) < 1e-6, doc_id
            assert abs(r["score"] - score) < 1e-6, doc_id
            assert r["bucket"] == bucket, doc_id
        # the classifier must be a live decision on this fixture, not a
        # constant column
        assert len({b for (_, _, _, b) in want.values()}) >= 2


class TestPiiKnownAnswer:
    def test_pii_detect_report(self, spark, sf_dir):
        # independent recompute with Python re + a hand-rolled Luhn — no
        # shared regex engine, no shared augmentation code (restated here)
        d = pd.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )

        def augment(doc_id, text):
            t = text
            if doc_id % 7 == 0:
                t += f" mail u{doc_id}@example.com"
            if doc_id % 5 == 0:
                t += f" call 415-555-{doc_id % 10000:04d}"
            if doc_id % 11 == 0:
                t += f" ip 10.{doc_id % 256}.0.{(doc_id * 3) % 256}"
            if doc_id % 13 == 0:
                t += f" ssn {doc_id % 1000:03d}-{doc_id % 100:02d}-{doc_id % 10000:04d}"
            if doc_id % 3 == 0:
                t += f" card {(doc_id * 7919) % 10**16:016d}"
            return t

        def luhn_ok(s):
            total = 0
            for i, ch in enumerate(reversed(s)):
                v = int(ch)
                total += (v * 2 - 9 if v * 2 > 9 else v * 2) if i % 2 == 1 else v
            return total % 10 == 0

        pats = {
            "n_emails": re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
            "n_phones": re.compile(r"\b\d{3}-\d{3}-\d{4}\b"),
            "n_ipv4": re.compile(r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
            "n_ssn": re.compile(r"\b\d{3}-\d{2}-\d{4}\b"),
        }
        card = re.compile(r"\b\d{16}\b")
        got = {
            r["doc_id"]: r
            for r in registry.REGISTRY["pii_detect_report"](spark, sf_dir).collect()
        }
        n_luhn_total = 0
        n_card_total = 0
        for doc_id, text in zip(d["doc_id"], d["text"]):
            doc_id = int(doc_id)
            t = augment(doc_id, text)
            r = got[doc_id]
            for col, pat in pats.items():
                assert r[col] == len(pat.findall(t)), (doc_id, col)
            cards = card.findall(t)
            valid = sum(1 for c in cards if luhn_ok(c))
            assert r["n_cards_luhn"] == valid, doc_id
            n_card_total += len(cards)
            n_luhn_total += valid
            want_any = any(
                len(p.findall(t)) for p in pats.values()
            ) or valid > 0
            assert r["has_pii"] == want_any, doc_id
        # Luhn must be a real decision: some candidates pass, most don't
        assert 0 < n_luhn_total < n_card_total

    def test_pii_redact_leaves_no_detectable_pii(self, spark, sf_dir):
        """Completeness property: running the detectors (independent
        Python re) over the REDACTED text finds zero matches of any type
        — masking that misses a span or re-creates a match by
        concatenation fails here."""
        pats = [
            re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
            re.compile(r"\b\d{3}-\d{3}-\d{4}\b"),
            re.compile(r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
            re.compile(r"\b\d{3}-\d{2}-\d{4}\b"),
            re.compile(r"\b\d{16}\b"),
        ]
        rows = registry.REGISTRY["pii_redact"](spark, sf_dir).collect()
        assert any(r["changed"] for r in rows)
        for r in rows:
            for pat in pats:
                assert not pat.search(r["redacted_text"]), (r["doc_id"], pat.pattern)

    def test_privacy_pipeline(self, spark, sf_dir):
        """Composed-flagship reference: rebuild the per-source rollup from
        the wave-1 detect/redact references and require docs_residual_pii
        == 0 everywhere (the release gate the verify stage exists for)."""
        d = pd.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
        )

        def augment(doc_id, text):
            t = text
            if doc_id % 7 == 0:
                t += f" mail u{doc_id}@example.com"
            if doc_id % 5 == 0:
                t += f" call 415-555-{doc_id % 10000:04d}"
            if doc_id % 11 == 0:
                t += f" ip 10.{doc_id % 256}.0.{(doc_id * 3) % 256}"
            if doc_id % 13 == 0:
                t += f" ssn {doc_id % 1000:03d}-{doc_id % 100:02d}-{doc_id % 10000:04d}"
            if doc_id % 3 == 0:
                t += f" card {(doc_id * 7919) % 10**16:016d}"
            return t

        def luhn_ok(s):
            total = 0
            for i, ch in enumerate(reversed(s)):
                v = int(ch)
                total += (v * 2 - 9 if v * 2 > 9 else v * 2) if i % 2 == 1 else v
            return total % 10 == 0

        pats = [
            re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
            re.compile(r"\b\d{3}-\d{3}-\d{4}\b"),
            re.compile(r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
            re.compile(r"\b\d{3}-\d{2}-\d{4}\b"),
        ]
        card = re.compile(r"\b\d{16}\b")
        reps = [
            (pats[0], "[EMAIL]"), (card, "[CARD]"), (pats[3], "[SSN]"),
            (pats[1], "[PHONE]"), (pats[2], "[IP]"),
        ]

        def n_pii(t):
            return sum(len(p.findall(t)) for p in pats) + sum(
                1 for c in card.findall(t) if luhn_ok(c)
            )

        per = {}
        for doc_id, text, src in zip(d["doc_id"], d["text"], d["source"]):
            t = augment(int(doc_id), text)
            rt = t
            for pat, tok in reps:
                rt = pat.sub(tok, rt)
            row = per.setdefault(src, [0, 0, 0, 0, 0])
            row[0] += 1
            row[1] += int(n_pii(t) > 0)
            row[2] += int(rt != t)
            row[3] += len(t) - len(rt)
            row[4] += int(n_pii(rt) > 0)
        got = registry.REGISTRY["privacy_pipeline"](spark, sf_dir).collect()
        assert {r["source"] for r in got} == set(per)
        for r in got:
            n, had, chg, rem, res = per[r["source"]]
            assert (
                r["n_docs"], r["docs_with_pii"], r["docs_redacted"],
                r["chars_removed"], r["docs_residual_pii"],
            ) == (n, had, chg, rem, res), r["source"]
            assert r["docs_residual_pii"] == 0, r["source"]
            assert abs(r["pii_doc_rate"] - had / n) < 1e-6, r["source"]
