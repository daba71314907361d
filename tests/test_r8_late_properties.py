"""Invariant properties of the late-r8 greedy/fold operators — the claims
their docstrings make, asserted on real output rather than trusted."""

from __future__ import annotations

from wri_data_processing_spark import registry


def _run(spark, sf_dir, name):
    registry.load_all()
    return registry.REGISTRY[name](spark, sf_dir).collect()


def test_kcenter_radius_monotone_and_distinct(spark, sf_dir):
    """Farthest-first coverage radius can never grow: each greedy pick is
    the farthest point from a SUPERSET of the previous chosen set, so its
    selection distance is <= the previous pick's. Centers are distinct."""
    rows = _run(spark, sf_dir, "sample_coreset_kcenter")
    assert [r.round for r in rows] == [1, 2, 3, 4, 5]
    assert len({r.vec_id for r in rows}) == 5
    ds = [r.d2_sel for r in rows[1:]]  # seed row is 0 by convention
    assert all(a >= b for a, b in zip(ds, ds[1:])), ds


def test_mmr_first_pick_is_pure_relevance(spark, sf_dir):
    """MMR's first pick has no diversity term: it must be the pool's
    relevance argmax (maxsim = 0), and all picks are distinct."""
    rows = _run(spark, sf_dir, "sim_mmr_rerank")
    assert rows[0].maxsim == 0
    assert rows[0].rel == max(r.rel for r in rows)
    assert len({r.vec_id for r in rows}) == len(rows) == 5


def test_retrieval_pipeline_serves_mmr_contract(spark, sf_dir):
    """The serving flagship obeys the same contract as the full-scan MMR
    (first pick pure relevance, distinct picks) — and on this fixture the
    probed pool recovers the exact picks (measured recall note)."""
    rows = _run(spark, sf_dir, "retrieval_pipeline")
    exact = _run(spark, sf_dir, "sim_mmr_rerank")
    assert rows[0].maxsim == 0
    assert len({r.vec_id for r in rows}) == 5
    assert [r.vec_id for r in rows] == [r.vec_id for r in exact]


def test_survival_life_table_invariants(spark, sf_dir):
    """KM life table: at-risk strictly decreases, ln-survival is
    non-increasing (until the possible S=0 NULL tail), and every subject
    is accounted for exactly once (sum of events+censored == n at risk
    at t_min)."""
    rows = _run(spark, sf_dir, "events_survival_km")
    nr = [r.n_risk for r in rows]
    assert all(a > b for a, b in zip(nr, nr[1:])), nr
    ls = [r.ln_surv for r in rows if r.ln_surv is not None]
    assert all(a >= b for a, b in zip(ls, ls[1:])), ls
    assert sum(r.n_event + r.n_censor for r in rows) == rows[0].n_risk


def test_stickiness_bounds(spark, sf_dir):
    """DAU <= WAU always (a day's actives are a subset of its trailing
    week's), so stickiness is in (0, 1]."""
    rows = _run(spark, sf_dir, "events_stickiness")
    assert rows, "no days"
    for r in rows:
        assert r.dau <= r.wau
        assert 0.0 < r.stickiness <= 1.0


def test_heaps_cumulatives_close(spark, sf_dir):
    """Vocabulary growth: cumulative vocab is non-decreasing and the final
    cumulative token count equals the sum of per-decile counts."""
    rows = _run(spark, sf_dir, "text_heaps_law")
    vc = [r.vocab_cum for r in rows]
    assert vc == sorted(vc)
    assert rows[-1].tokens_cum == sum(r.n_tokens for r in rows)


def test_kcore_trajectory_monotone(spark, sf_dir):
    """Peeling only removes: node and edge counts are non-increasing per
    round, and two equal consecutive rows certify the fixpoint."""
    rows = _run(spark, sf_dir, "graph_kcore")
    ns = [(r.n_nodes, r.n_edges) for r in rows]
    assert all(a >= b for a, b in zip(ns, ns[1:])), ns
