"""Semantic verification of the r7 drift/quality/semantic-dedup ops against
INDEPENDENT pure-Python references (the segment-properties stance: the
DuckDB oracle proves cross-engine SQL equivalence; these prove the intended
SEMANTICS from the definition — PSI from its formula, the LM score from
corpus counts, the SemDeDup keep policy from the paper's rule).

The Python references reproduce the engines' ordered-fold arithmetic
(CPython float IS the platform double and math.log the same libm the
engines bind), so PSI and xent comparisons are exact, not tolerance-based.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import functions as F

from wri_data_processing_spark.catalog import table
from wri_data_processing_spark import registry


def _events_pd(spark, sf_dir):
    return (
        table(spark, sf_dir, "events")
        .select("ts", "event_type", "value")
        .toPandas()
    )


def _bin(v: float) -> int:
    return min(int(math.floor(v / 10.0)), 19)


def _round6(x: float) -> float:
    """Spark's double round: HALF_UP on the shortest decimal repr (Python's
    round() is banker's and disagrees at exact midpoints)."""
    return float(Decimal(repr(x)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP))


def test_stats_psi_matches_python_reference(spark, sf_dir):
    registry.load_all()
    got = registry.REGISTRY["stats_psi"](spark, sf_dir).collect()[0]

    pdf = _events_pd(spark, sf_dir)
    pdf = pdf[pdf["value"].notna() & pdf["event_type"].isin(["view", "click"])]
    ca: Counter = Counter()
    cb: Counter = Counter()
    for et, v in zip(pdf["event_type"], pdf["value"]):
        (ca if et == "view" else cb)[_bin(float(v))] += 1
    na, nb = float(sum(ca.values())), float(sum(cb.values()))
    acc = 0.0
    used = skipped = 0
    for b in sorted(set(ca) | set(cb)):
        if ca[b] > 0 and cb[b] > 0:
            p, q = ca[b] / na, cb[b] / nb
            acc += (p - q) * math.log(p / q)
            used += 1
        else:
            skipped += 1
    assert got["n_ref"] == int(na) and got["n_cur"] == int(nb)
    assert got["n_bins_used"] == used and got["n_bins_skipped"] == skipped
    assert got["psi"] == _round6(acc)
    assert got["psi"] >= 0.0  # PSI is a sum of (p-q)ln(p/q) >= 0 terms


def test_stream_drift_monitor_windows_partition_and_reference(spark, sf_dir):
    registry.load_all()
    rows = registry.REGISTRY["stream_drift_monitor"](spark, sf_dir).collect()
    assert len(rows) > 0
    e = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    n_total = e.count()
    # the whole-table reference covers every bin any window hits, so the
    # inner bin-join drops nothing and window n_cur partitions the input
    assert sum(r["n_cur"] for r in rows) == n_total
    for r in rows:
        assert r["psi"] >= 0.0
        assert 1 <= r["n_bins_used"] <= 20


def test_text_lm_score_matches_python_reference(spark, sf_dir):
    import re

    registry.load_all()
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_types"], r["xent"])
        for r in registry.REGISTRY["text_lm_score"](spark, sf_dir).collect()
    }

    docs = (
        table(spark, sf_dir, "documents").select("doc_id", "text").toPandas()
    )
    tok = re.compile(r"[a-z0-9]+")
    per_doc: dict[int, Counter] = {}
    vocab: Counter = Counter()
    for did, text in zip(docs["doc_id"], docs["text"]):
        c = Counter(tok.findall((text or "").lower()))
        if c:
            per_doc[int(did)] = c
            vocab.update(c)
    n_total, v_size = float(sum(vocab.values())), float(len(vocab))
    want = {}
    for did, c in per_doc.items():
        acc = 0.0
        for w in sorted(c):  # the engines' bin-ordered fold
            acc += c[w] * math.log((vocab[w] + 1.0) / (n_total + v_size))
        nd = sum(c.values())
        want[did] = (nd, len(c), _round6(-acc / nd))
    assert got == want
    assert all(x[2] > 0 for x in got.values())  # neg log prob is positive


def test_dedup_semantic_keep_policy(spark, sf_dir):
    """Re-derive the keep decision from the op's OWN csim frame and an
    independently-built qualifying-pair set: v is dropped iff a same-cluster
    similar u precedes it in (centroid_sim, vec_id) order; the minimal
    member of every duplicate group survives."""
    from wri_data_processing_spark.queries.llm_dedup import _SEMDEDUP_TAU
    from wri_data_processing_spark.queries.llm_similarity import (
        _IVF_NLIST,
        _dvec,
        bucketed_pair_candidates,
        cosine_from_norms,
        ivf_assign,
        vec_norm,
    )

    registry.load_all()
    out = registry.REGISTRY["dedup_semantic"](spark, sf_dir).collect()
    kept = {r["vec_id"]: r["kept"] for r in out}

    # raw (unrounded) centroid sims for the ordering — the op compares raw
    e0 = table(spark, sf_dir, "embeddings")
    cents = e0.filter(F.col("vec_id") < _IVF_NLIST).select(
        F.col("vec_id").alias("cid"),
        _dvec("embedding").alias("cv"),
        vec_norm(_dvec("embedding")).alias("cn"),
    )
    raw = (
        e0.join(ivf_assign(e0.select("vec_id", "embedding")), "vec_id")
        .join(F.broadcast(cents), "cid")
        .select(
            "vec_id",
            cosine_from_norms(
                _dvec("embedding"), F.col("cv"), vec_norm(_dvec("embedding")), F.col("cn")
            ).alias("csim"),
        )
        .collect()
    )
    key = {r["vec_id"]: (r["csim"], r["vec_id"]) for r in raw}
    rounded = {r["vec_id"]: r["centroid_sim"] for r in out}
    assert all(rounded[v] == _round6(c) for v, (c, _) in key.items())

    e = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    pairs = [
        (r["vec_a"], r["vec_b"])
        for r in bucketed_pair_candidates(e)
        .filter(
            cosine_from_norms(F.col("ea"), F.col("eb"), F.col("na"), F.col("nb"))
            >= _SEMDEDUP_TAU
        )
        .select("vec_a", "vec_b")
        .collect()
    ]
    assert len(pairs) > 0
    nbrs = defaultdict(set)
    for a, b in pairs:
        nbrs[a].add(b)
        nbrs[b].add(a)
    for v, ns in nbrs.items():
        expect_drop = any(key[u] < key[v] for u in ns)
        assert kept[v] == (not expect_drop), v
    # vectors with no similar neighbor are always kept
    for v, k in kept.items():
        if v not in nbrs:
            assert k, v


def test_sample_dsir_weights_direction(spark, sf_dir):
    """Target-domain (en) documents must score a higher mean per-token log
    importance weight than off-target ones — the direction DSIR selection
    relies on; and the weights must be finite everywhere (the shared-vocab
    add-one smoothing can never emit -inf)."""
    registry.load_all()
    rows = registry.REGISTRY["sample_dsir_weights"](spark, sf_dir).collect()
    assert all(math.isfinite(r["log_weight"]) for r in rows)
    per_tok = lambda r: r["log_weight"] / r["n_tokens"]  # noqa: E731
    en = [per_tok(r) for r in rows if r["lang"] == "en"]
    other = [per_tok(r) for r in rows if r["lang"] != "en"]
    assert en and other
    assert sum(en) / len(en) > sum(other) / len(other)
