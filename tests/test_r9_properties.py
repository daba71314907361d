"""Invariant properties of the round-9 operators — the claims their
docstrings make, asserted on real output rather than trusted."""

from __future__ import annotations

from wri_data_processing_spark import registry


def _run(spark, sf_dir, name):
    registry.load_all()
    return registry.REGISTRY[name](spark, sf_dir).collect()


def test_bfs_layers_partition_the_graph(spark, sf_dir):
    """Layer counts sum to the node count; hop 0 is exactly the source;
    hops are contiguous from 0 (a gap would mean relaxation skipped a
    frontier, which min-propagation cannot do)."""
    rows = _run(spark, sf_dir, "graph_bfs_layers")
    hops = [r.hop for r in rows]
    assert hops == sorted(hops)
    reached = [h for h in hops if h >= 0]
    assert reached == list(range(len(reached)))
    src_row = [r for r in rows if r.hop == 0]
    assert len(src_row) == 1 and src_row[0].n_nodes == 1


def test_clustering_coefficient_bounds_and_order(spark, sf_dir):
    """coeff in [0, 1] by construction (tri <= C(d,2)); the top-20 is
    non-increasing; every listed node has degree >= 2."""
    rows = _run(spark, sf_dir, "graph_clustering_coefficient")
    assert all(0.0 <= r.coeff <= 1.0 for r in rows)
    assert all(r.d >= 2 for r in rows)
    cs = [r.coeff for r in rows]
    assert all(a >= b for a, b in zip(cs, cs[1:]))
    assert all(2 * r.tri <= r.d * (r.d - 1) for r in rows)


def test_hits_scores_normalized_and_sides_complete(spark, sf_dir):
    """Each side's Q30 scores are positive and bounded by the scale
    (floors make per-side totals sum to <= 2^30); 15 rows per side,
    non-increasing within a side."""
    rows = _run(spark, sf_dir, "graph_hits")
    for side in ("authority", "hub"):
        sides = [r for r in rows if r.side == side]
        assert len(sides) == 15
        qs = [r.score_q for r in sides]
        assert all(0 < q <= 1 << 30 for q in qs)
        assert all(a >= b for a, b in zip(qs, qs[1:]))


def test_mcnemar_cells_partition_pairs(spark, sf_dir):
    """The four cells partition the (user, day) universe exactly."""
    (r,) = _run(spark, sf_dir, "stats_mcnemar")
    assert r.n11 + r.n10 + r.n01 + r.n00 == r.n_pairs
    assert r.mcnemar_chi2 >= 0.0


def test_wilcoxon_rank_sums_complete(spark, sf_dir):
    """W2+ + W2- must equal the full doubled rank sum n(n+1) — every
    non-zero difference is ranked exactly once."""
    (r,) = _run(spark, sf_dir, "stats_wilcoxon_signed_rank")
    assert r.w2_plus + r.w2_minus == r.n * (r.n + 1)


def test_kappa_cells_and_range(spark, sf_dir):
    """Cells partition the corpus; kappa <= po (chance correction can
    only shrink agreement); all four cells carry mass (the sha flip's
    whole purpose — length raters alone are nested)."""
    (r,) = _run(spark, sf_dir, "stats_cohens_kappa")
    assert r.n11 + r.n10 + r.n01 + r.n00 == r.n
    assert min(r.n11, r.n10, r.n01, r.n00) > 0
    assert r.kappa <= r.po + 1e-9


def test_mutual_info_nonnegative(spark, sf_dir):
    """MI is >= 0 (Jensen); cells bounded by |types| * 4 quadrants."""
    (r,) = _run(spark, sf_dir, "stats_mutual_info")
    assert r.mi_nats >= 0.0
    assert r.n_cells <= 5 * 4


def test_pass_at_k_estimator_bounds(spark, sf_dir):
    """pass@1 <= pass@5 (more draws can only help), both in [0, 1], and
    pass@1 equals avg_correct / 10 exactly (the k=1 estimator IS the
    mean success rate)."""
    (r,) = _run(spark, sf_dir, "eval_pass_at_k")
    assert 0.0 <= r.pass_at_1 <= r.pass_at_5 <= 1.0
    assert abs(r.pass_at_1 - r.avg_correct / 10.0) < 1e-6


def test_lift_gains_monotone_and_terminal(spark, sf_dir):
    """Cumulative gain is non-increasing as the decile cut descends from
    the top... i.e. reading rows in emitted order (decile 9 -> 0) the
    gain GROWS to exactly 1.0 at the full-population cut, where lift is
    exactly 1.0 too."""
    rows = _run(spark, sf_dir, "stats_lift_gains")
    assert [r.decile for r in rows] == list(range(9, -1, -1))
    gains = [r.gain for r in rows]
    assert all(a <= b for a, b in zip(gains, gains[1:]))
    assert abs(rows[-1].gain - 1.0) < 1e-9
    assert abs(rows[-1].lift - 1.0) < 1e-9


def test_class_balance_exact_and_honest(spark, sf_dir):
    """Every class keeps exactly the minority count; kept ids are a
    subset sum (0 < kept_id_sum implies selection actually happened)."""
    rows = _run(spark, sf_dir, "sample_class_balance")
    target = min(r.n_in for r in rows)
    assert all(r.n_kept == target for r in rows)
    minority = [r for r in rows if r.n_in == target]
    assert all(r.n_kept <= r.n_in for r in rows)
    assert len(minority) >= 1


def test_char_entropy_band(spark, sf_dir):
    """Entropy of a 36-symbol distribution lies in [0, ln 36]; the
    emitted list is the ascending head."""
    import math

    rows = _run(spark, sf_dir, "text_char_entropy")
    es = [r.entropy for r in rows]
    assert all(0.0 <= e <= math.log(36) + 1e-9 for e in es)
    assert es == sorted(es)


def test_datasheet_partitions_corpus(spark, sf_dir):
    """Source rows partition the corpus: doc counts sum to the corpus
    size; dup counts never exceed doc counts."""
    rows = _run(spark, sf_dir, "corpus_datasheet")
    from wri_data_processing_spark.catalog import table as _table

    assert sum(r.n_docs for r in rows) == _table(spark, sf_dir, "documents").count()
    assert all(0 <= r.n_prefix_dup_docs <= r.n_docs for r in rows)
    assert all(r.n_langs >= 1 for r in rows)


def test_label_affinity_complete_and_bounded(spark, sf_dir):
    """All C(|labels|, 2) pairs present exactly once; cosine in [-1, 1]
    (centroids are non-degenerate on this fixture)."""
    rows = _run(spark, sf_dir, "embed_label_affinity")
    labels = {r.la for r in rows} | {r.lb for r in rows}
    k = len(labels)
    assert len(rows) == k * (k - 1) // 2
    assert all(-1.0 - 1e-9 <= r.cosine <= 1.0 + 1e-9 for r in rows)


def test_triplet_mining_labels_and_distinctness(spark, sf_dir):
    """Positives share the anchor's label universe (pos != anchor,
    neg != anchor, pos != neg) and d2 values are positive."""
    rows = _run(spark, sf_dir, "embed_triplet_mining")
    assert rows, "anchor sample empty"
    for r in rows:
        assert r.pos_id != r.anchor_id and r.neg_id != r.anchor_id
        assert r.pos_id != r.neg_id
        assert r.pos_d2 > 0 and r.neg_d2 > 0
        assert r.separated == (r.neg_d2 > r.pos_d2)


def test_acf_bounds_and_pairs_shrink(spark, sf_dir):
    """|acf| <= 1; the pair count can only shrink as the lag grows."""
    rows = _run(spark, sf_dir, "events_acf")
    assert [r.lag for r in rows] == list(range(1, 8))
    assert all(abs(r.acf) <= 1.0 + 1e-9 for r in rows)
    ks = [r.n_pairs for r in rows]
    assert all(a >= b for a, b in zip(ks, ks[1:]))


def test_hhi_bounds(spark, sf_dir):
    """1/n_nations <= hhi <= 1 per region."""
    rows = _run(spark, sf_dir, "stats_hhi_concentration")
    for r in rows:
        assert 1.0 / r.n_nations - 1e-9 <= r.hhi <= 1.0 + 1e-9


def test_burstiness_bounds(spark, sf_dir):
    """B in [-1, 1); dispersion positive; day counts consistent."""
    rows = _run(spark, sf_dir, "events_burstiness")
    for r in rows:
        assert -1.0 <= r.burstiness < 1.0
        assert r.dispersion_index > 0.0
        assert r.n_events >= r.n_days


def test_footer_stats_buckets_contiguous(spark, sf_dir):
    """Bucket key ranges never overlap (min of bucket k+1 > max of
    bucket k) — the property pruning relies on."""
    rows = _run(spark, sf_dir, "scan_parquet_footer_stats")
    rows = sorted(rows, key=lambda r: r.bucket)
    for a, b in zip(rows, rows[1:]):
        assert b.min_key > a.max_key
        assert a.min_key <= a.max_key


def test_patchify_conserves_pixels(spark, sf_dir):
    """The integer patch grid never drops or double-counts: per image the
    patch pixel counts sum to w*h, and luminance sums are consistent with
    the emitted means."""
    rows = _run(spark, sf_dir, "multimodal_patchify")
    ok = [r for r in rows if r.success]
    bad = [r for r in rows if not r.success]
    assert len(bad) == 1 and bad[0].filename == "corrupt.bmp"
    by_img = {}
    for r in ok:
        by_img.setdefault(r.media_id, []).append(r)
    for mid, patches in by_img.items():
        assert len(patches) == 4
        assert all(
            abs(p.mean_lum - p.lum_sum_milli / (p.n_px * 1000.0)) < 1e-6
            for p in patches
        )


def test_phash_dedup_exactly_the_siblings(spark, sf_dir):
    """The banded near-dup pass finds exactly the four base/near sibling
    pairs — no unrelated pair survives the Hamming cut (probed margins
    siblings 6-12 vs unrelated >= 16, asserted here on real output)."""
    pairs = _run(spark, sf_dir, "multimodal_phash_dedup")
    assert len(pairs) == 4
    assert all(r.hamming <= 12 for r in pairs)
    # base_i and near_i are adjacent media ids (base even position in the
    # fixture enumeration); every pair must differ by exactly 1 id.
    assert all(r.media_b == r.media_a + 1 for r in pairs)


def test_srm_even_split_on_fixture(spark, sf_dir):
    """The sha bucket is unbiased on this fixture: no mismatch flag, and
    the arms actually partition the distinct-user universe."""
    (r,) = _run(spark, sf_dir, "stats_ab_srm_check")
    assert r.n0 > 0 and r.n1 > 0
    assert r.mismatch is False


def test_new_vs_returning_day_one_all_new(spark, sf_dir):
    """Day 1 traffic is 100% new by construction (nobody has history);
    fractions stay in [0, 1]."""
    rows = _run(spark, sf_dir, "events_new_vs_returning")
    assert rows[0].new_frac == 1.0
    assert all(0.0 <= r.new_frac <= 1.0 for r in rows)


def test_coverage_estimate_dominance(spark, sf_dir):
    """Lincoln-Petersen never undershoots either detector, and the
    overlap is bounded by both marked sets; the union is at most the
    estimate's support on this fixture (a gross inversion means the
    composition is wired wrong)."""
    (r,) = _run(spark, sf_dir, "dedup_coverage_estimate")
    assert 0 < r.n_overlap <= min(r.n_a, r.n_b)
    assert r.n_union <= r.n_a + r.n_b - r.n_overlap + 1e-9
    assert r.lp_estimate >= max(r.n_a, r.n_b) - 1e-6


def test_transitivity_in_unit_interval(spark, sf_dir):
    (r,) = _run(spark, sf_dir, "graph_transitivity")
    assert 0.0 <= r.transitivity <= 1.0
    assert r.n_wedges >= 3 * r.n_triangles


def test_mann_kendall_s_bounds(spark, sf_dir):
    """|S| <= k(k-1)/2 by construction."""
    (r,) = _run(spark, sf_dir, "stats_mann_kendall")
    assert abs(r.mk_s) <= r.n_days * (r.n_days - 1) // 2


def test_fertility_sane(spark, sf_dir):
    """BPE-ish pieces can only split words: fertility >= ~1; chars per
    token positive and below the longest plausible piece."""
    rows = _run(spark, sf_dir, "text_tokenizer_fertility")
    assert all(r.fertility >= 0.99 for r in rows)
    assert all(0.0 < r.chars_per_token < 30.0 for r in rows)


def test_seasonality_strength_unit_interval(spark, sf_dir):
    (r,) = _run(spark, sf_dir, "events_seasonality_strength")
    assert 0.0 <= r.seasonality_strength <= 1.0


def test_merge_branch_conserves(spark, sf_dir):
    """Fast-forward merge: zero conflicts and the merged row count is
    exactly main + branch additions."""
    (r,) = _run(spark, sf_dir, "snapshot_merge_branch")
    assert r.n_conflicts == 0
    assert r.n_merged == r.n_main + r.n_dev_added


def test_merge_branch_conflict_detection():
    """The both-sides-rewrite case the registered (append-only) scenario
    structurally cannot produce: when main compacts {a,b}->ab AND dev
    rewrites {b}->b2, file b is rewritten by BOTH sides since the fork
    and the merge must be blocked. Pure manifest set algebra — no Spark
    session needed; drives the same helper the op calls."""
    from wri_data_processing_spark.queries.warehouse_ops import _merge_conflicts

    fork = {"a", "b", "c"}
    # main compacted a+b into ab (rewrote a and b); dev rewrote b into b2
    # and appended d.
    main_head = {"ab", "c"}
    dev_head = {"a", "b2", "c", "d"}
    assert _merge_conflicts(fork, main_head, dev_head) == {"b"}
    # dev-side append-only (the registered scenario): never conflicts,
    # whatever main rewrote.
    assert _merge_conflicts(fork, main_head, fork | {"d"}) == set()
    # both sides rewriting DIFFERENT files: fast-forwardable.
    assert _merge_conflicts(fork, {"a2", "b", "c"}, {"a", "b", "c2"}) == set()
