"""Behavioral pins for sim_ann_pq beyond the DuckDB oracle.

The oracle proves cross-engine equivalence; these pin that the
approximation is USEFUL (the ADC candidate pool recovers the exact top-k on
the fixture) and that the plan keeps its scale shape (the per-vector
scoring shuffles carry ids + one BIGINT, never embedding arrays).
"""

from __future__ import annotations

SF_DIR = "/root/testdata/sf0.01"


def _load(spark, name):
    from wri_data_processing_spark import registry

    registry.load_all()
    return registry.REGISTRY[name](spark, SF_DIR)


def test_pq_rerank_recovers_exact_topk(spark):
    """With a 5x-oversampled ADC pool and exact re-rank, the PQ result on
    the fixture matches the exact brute-force top-10 — pinned as full
    overlap HERE (a property of this data + codebooks, asserted so a
    quantization regression that guts recall fails loudly; a real corpus
    asserts a recall floor instead)."""
    exact = [r.vec_id for r in _load(spark, "sim_topk").collect()]
    pq = [r.vec_id for r in _load(spark, "sim_ann_pq").collect()]
    assert pq == exact


def test_pq_scoring_exchanges_carry_codes_not_vectors(spark):
    """Every exchange in the PQ plan must be free of the embedding column:
    sub-vector coding aggregates (vec_id, m, d2-argmin) rows and ADC sums
    (vec_id, BIGINT) rows; embeddings re-enter only via the broadcast-side
    re-rank join of the 50-row candidate pool."""
    df = _load(spark, "sim_ann_pq")
    plan = df._jdf.queryExecution().executedPlan().toString()
    import re

    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "embedding" not in m.group(1), m.group(0)


def test_sq8_rerank_recovers_exact_topk(spark):
    """Regression guard for the r6 centering fix: uncentered affine-code
    scoring ranked the true top-10 nowhere near the 50-pool (recall 0.0 at
    sf0.1); centered codes put them all within rank 26 at both SFs. Pinned
    as full overlap on the fixture, same stance as the PQ pin."""
    exact = [r.vec_id for r in _load(spark, "sim_topk").collect()]
    sq8 = [r.vec_id for r in _load(spark, "sim_ann_sq8").collect()]
    assert sq8 == exact


def test_batch_topk_prunes_rank_before_exchange(spark):
    """sim_topk_batch's per-query top-k must carry the WindowGroupLimit
    rewrite (partial map-side + final), so the shuffle moves at most k rows
    per (task, query) instead of the full scored fan-out."""
    df = _load(spark, "sim_topk_batch")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("WindowGroupLimit") >= 2, plan
