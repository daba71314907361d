#!/usr/bin/env python
"""Regenerate PLANS.md: formatted physical plans for the headline queries.

The plan review loop the repo follows (explain -> iterate until it's the
plan you'd WANT at 100 TB) leaves artifacts in tests/test_plan_shapes.py;
this script captures the current plans themselves so a reviewer can read
them without running Spark. Run from the repo root:

    python experiments/dump_plans.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wri_data_processing_spark import registry
from wri_data_processing_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

# (query, what to look for in the plan)
SHOWCASE = [
    ("q1_pricing_summary", "single scan, partial+final hash agg, no joins; "
     "all arithmetic whole-stage-codegen'd"),
    ("q3_shipping_priority", "broadcast dims onto the lineitem scan, one shuffle "
     "for the final aggregate, TakeOrderedAndProject for the top-N"),
    ("join_broadcast_left", "dimension side becomes BroadcastExchange; fact side "
     "never shuffles"),
    ("join_asof", "union + last-observation window: one shuffle per side, no "
     "range explosion"),
    ("dedup_ngram_jaccard", "posting-list inverted index: ONE wide shuffle on "
     "shingle, double explode, pair count — no sort-merge self-join"),
    ("sim_topk", "broadcast 1-row query vector, TakeOrderedAndProject top-k — "
     "no global sort"),
    ("text_tfidf", "tf and df reuse one token exchange; vocabulary broadcasts "
     "back; window only on doc_id"),
    ("graph_pagerank", "5 unrolled scatter/gather rounds, all equi hash joins, "
     "integer-only arithmetic"),
    ("layout_zorder", "Morton interleave as pure project expressions; the "
     "32-file NTILE split runs as the two-phase distributed rank — "
     "bucket-partitioned window, NO Exchange SinglePartition"),
    ("sim_pairs_threshold", "IVF bucket equi-join candidates with block "
     "fan-out (cid x blk keys), norms computed per vector before the join; "
     "no theta self-join of embeddings"),
    ("user_rfm_segments", "three exact NTILE quartiles via bucket-partitioned "
     "windows over the persisted per-user aggregate — no single-partition "
     "exchange"),
    ("skyline_pareto_frontier", "O(n log n) sweep replaces the NOT EXISTS "
     "quadratic: price-level aggregate, prefix-max window over aggregated "
     "rows only, then one join back"),
    ("dedup_containment", "same single-shuffle posting-list plan as jaccard; "
     "both asymmetric ratios computed from one pair row"),
    ("dedup_minhash_lsh", "sha-sliced base hash, 16 partial-aggregated "
     "minhash mins in one groupBy, band equi-join candidates, signature "
     "re-join estimate — sub-quadratic and oracle-exact"),
    ("events_cumulative_distinct", "first-seen rewrite: COUNT(DISTINCT) OVER "
     "becomes two hash aggregates + a prefix sum over |days| rows"),
    ("dedup_substring", "windows hashed inside transform() BEFORE the "
     "explode: exchanges carry (doc_id, 16-char key), never text; posting "
     "agg + coverage agg are the only wide shuffles"),
    ("sim_ann_sq8", "two 1-row broadcasts (per-dim stats, query vector); "
     "int8 codes built JVM-side; BIGINT dot-product scoring feeds "
     "TakeOrderedAndProject, exact cosine only on the candidate pool"),
    ("corpus_prep_pipeline", "the fate report: marker sets LEFT-JOIN back "
     "onto the checkpointed survivor frame, conditional sums in one agg; "
     "the propagation rounds are separate checkpointed jobs upstream"),
    ("geo_focal_mean", "3x3 neighborhood as scatter: constant-width explode "
     "+ one target-keyed aggregation, ZERO joins — not a 9-way self-join"),
    ("dedup_segments_rewrite", "segments hashed to 16-hex keys before the "
     "rank window (hashpartitioning on sha2, not text); reassembly is "
     "array_sort inside ONE per-doc aggregate — no second window"),
    ("sim_ann_pq", "codebook and query LUT broadcast; coding argmin and ADC "
     "sum are the only keyed shuffles (ids + one BIGINT); "
     "TakeOrderedAndProject candidate cut; exact cosine on 128 rows"),
    ("packing_pipeline", "one (doc,token) exchange feeds every quality "
     "rule; survivors checkpoint once then flow into the segment rank; "
     "manifest join is per-source broadcast-sized"),
    ("stats_quantiles_exact", "two-phase distributed prefix sum: the "
     "window is BUCKET-partitioned (no single-partition sort); the only "
     "SinglePartition exchange is the global-N aggregate's one-row-per-"
     "partition partials; 1-row N broadcast; all five ranks answered by "
     "one min-CASE aggregate"),
    ("stats_psi", "the shuffle carries BIN COUNTS (20 keys), never rows; "
     "the ordered ln-term fold runs on a single ~20-element array"),
    ("text_lm_score", "tokenize fused into the scan; (doc,token) then "
     "(token) map-side-combined aggs; vocab equi-join back; 1-row totals "
     "broadcast; per-doc bounded fold"),
    ("dedup_semantic", "ivf_assign centroid broadcast + fan-out bucket "
     "pair equi-join (the dedup_embedding topology); centroid-sim join "
     "broadcasts nlist rows; drop set is a broadcast left join"),
    ("events_user_entropy", "per-(user,type) counts then per-user totals: "
     "two map-side-combined shuffles on progressively smaller keys; the "
     "ln-ratio entropy fold runs on each user's bounded type array"),
    ("events_path_analysis", "user-partitioned rank window (no "
     "single-partition exchange) whose exchange the per-user collect "
     "REUSES; rows past rank 5 drop before the collect; path counts are "
     "map-side combined; top-20 is TakeOrdered, not a global sort"),
    ("events_rate_test", "1-row midpoint broadcast back over the scan "
     "(whitelisted bounded NLJ), then ONE map-side-combined aggregate "
     "yields all four statistics — zero shuffled rows beyond the two "
     "1-row frames"),
    ("join_interval_overlap", "both interval sides chunk-explode in the "
     "scan stage; ONE (user, chunk) equi-join; the claim-bucket filter "
     "dedups pairs with no distinct(), then one aggregation"),
    ("dedup_url_canonical", "the whole canonicalization rule chain as "
     "scan-stage string expressions inside WholeStageCodegen; one "
     "map-side-combined groupBy on the canonical key"),
    ("text_bigram_lm", "bigrams zipped inside the token array (no "
     "posexplode self-join, no per-doc window); two map-side-combined "
     "count shuffles; vocab equi-joins back; 1-row totals broadcast; "
     "bounded per-doc ordered fold"),
    ("web_corpus_pipeline", "three stages as ONE DAG: the semi-join on "
     "URL keepers pipelines into the LM scan; grouped two-phase cumsum "
     "for per-lang thirds (no single-reducer sort); fate report joins "
     "are |langs|-row broadcasts"),
    ("events_stl_decompose", "window over the reduced |types| x |days| "
     "daily frame partitioned by event_type; integer sum7/det7 core; "
     "|types| x 7 seasonal frame broadcasts for the join-back"),
    ("embed_pca_power", "one map-side-combined covariance shuffle into "
     "4096 groups, REUSED by all three power rounds (ReusedExchange — "
     "measured faster than checkpointing); bounded-row broadcasts after"),
    ("snapshot_publish_audit", "audit = one aggregate over the staged "
     "manifest's scan; publish = a pointer write, no data motion"),
    ("events_changepoint_binary", "cumsum + argmax windows over the "
     "reduced daily frame; |types|-row totals broadcast"),
    ("recsys_item_similar", "order-key equi self-join pair counts, two "
     "part-key join-backs, WindowGroupLimit prunes to 3 rows per item "
     "map-side before the final exchange"),
    ("graph_kcore", "six peel rounds, each one degree aggregate + two "
     "survivor equi-joins over a localCheckpointed shrinking edge set — "
     "the 3^R plan blowup cut per round"),
    ("events_survival_km", "per-user conditional-min aggregate, "
     "calendar-bounded duration agg, then the whole life table folds "
     "inside ONE row (array slices) — no window, no join"),
    ("sample_coreset_kcenter", "per greedy round: <=5-row chosen-set "
     "broadcast over the quantized scan, BIGINT distance fold, 1-row "
     "TakeOrdered pick"),
    ("events_stickiness", "trailing-7-day DISTINCT as a coverage "
     "explode: (user,day) distinct, constant 7x fan-out collapsed "
     "map-side, two equi aggregates — no range join, no window"),
    ("retrieval_pipeline", "the serving flagship: nlist-row centroid "
     "broadcast (assign + probe) prunes the scan to 3/8 of the corpus "
     "BEFORE the BIGINT dot re-rank; the 20-row pool checkpoints and "
     "the MMR rounds run on it alone"),
    ("stats_auc", "Mann-Whitney AUC: distinct-value two-phase prefix "
     "sums (no single-partition window), decimal(38,0) rank-sums, one "
     "1-row aggregate — no joins"),
    ("graph_bfs_layers", "Pregel-on-DataFrames frontier: six integer "
     "min-relaxation rounds, each one neighbor-min aggregate + one "
     "equi-join back, label frame localCheckpointed per round (2^R "
     "plan blowup cut)"),
    ("graph_hits", "bipartite HITS: one orders-lineitem edge build "
     "(localCheckpointed, three consumers), then three broadcast "
     "score-vector joins + 1-row renormalization totals"),
    ("text_char_entropy", "ZERO exchanges before the TakeOrdered: 36 "
     "length-diff expressions + a fixed-order array fold evaluate "
     "scan-side; the only movement is the top-20 cut"),
    ("corpus_datasheet", "two shuffles total: the 64-byte-prefix window "
     "census, then the per-source rollup with its mirrored divisions"),
    ("eval_pass_at_k", "per-user partitioned rank (never global), "
     "map-side-combined per-task fold, one 4-column scalar fold — the "
     "falling-factorial polynomial runs inside the aggregate"),
    ("model_eval_pipeline", "the 5th flagship: four independent 1-row "
     "component subplans (SRM, AUC two-phase rank sums, calibration "
     "bins, lift deciles) stitched by three 1-row broadcasts"),
    ("drift_report_pipeline", "the monitoring scorecard: KS two-phase "
     "ECDF + PSI bins + JSD cells + chi2 cells, three 1-row broadcast "
     "stitches, one pager-ready boolean"),
    ("dedup_coverage_estimate", "two banded detector subplans "
     "(MinHash-LSH pairs, SimHash 15-bit bands) -> pair-key equi-join "
     "overlap + union-distinct -> Lincoln-Petersen row"),
    ("stats_qq_table", "grouped two-phase cumulative counts, 9-row "
     "decile broadcast, pure-integer thresholds, 9-row self-join"),
    ("stats_effect_sizes", "Cohen's d / Hedges' g from decimal38 moment "
     "folds, Cliff's delta = u1_x2/(n1*n2) - 1 reusing Mann-Whitney's "
     "doubled-U subplan; three 1-row broadcast stitches"),
    ("stats_skewness_kurtosis", "one map-side-combined fold: centi-unit "
     "ci^4 stays in int64 per row, s3/s4 accumulate in decimal38, "
     "m2^1.5 computed as m2*sqrt(m2) — never pow"),
    ("stats_tost_equivalence", "two one-sided Welch z statistics from the "
     "same two-group moment fold; 1.644854 pinned as a literal, 1-row "
     "verdict"),
    ("events_burstiness", "daily-count aggregate then per-type Fano and "
     "Goh-Barabasi B from one (type) fold — the shuffle carries "
     "|types| x |days| counts, never events"),
    ("events_new_vs_returning", "per-user first-seen min-aggregate joined "
     "back on (user, day): acquisition/engagement split with no window "
     "over the raw event stream"),
    ("graph_transitivity", "ordered-edge triangle join (a<b<c) for 3T, "
     "wedge count as sum d*(d-1)/2 from the degree aggregate; two "
     "scalar subplans, one 1-row output"),
    ("stats_mann_kendall", "day-pair self-join on d2 > d1 (the theil_sen "
     "pair frame) for S; tie-corrected variance from the value-count "
     "aggregate — no global sort"),
    ("text_tokenizer_fertility", "all five aggregates are map-side array "
     "sizes (regex counts fused into the scan, no token explode); one "
     "per-lang fold, |langs| rows"),
    ("events_seasonality_strength", "dow eta-squared in pure integers via "
     "2520-LCM scaling: daily counts -> 7-row dow means -> 1-row "
     "strength; exact on the fixture span"),
    ("snapshot_merge_branch", "manifest set algebra is metadata-only "
     "(driver-side file lists); the only data-sized work is the merged "
     "multi-file scan's single fold"),
    # r10 wave: association/agreement stats + the model-eval family
    ("stats_kendall_tau", "CALENDAR-squared day-pair join (|days|^2, never "
     "data-sized) over the shared daily rollup; concordance counts fold to "
     "one row"),
    ("stats_ccc_lin", "one moment fold over the daily frame: Pearson and "
     "Lin's CCC both close from the same five decimal sums, zero joins"),
    ("stats_jarque_bera", "one map-side-combined per-type power-sum "
     "aggregate (s1..s4); the moment algebra runs on the 5-row frame"),
    ("stats_mood_median", "pooled exact median via the stats_quantiles "
     "machinery, then one 2x2 contingency fold — two passes, no sort"),
    ("stats_hodges_lehmann", "day-pair crossJoin is |days|^2 broadcast "
     "(calendar-bounded); median-of-diffs via ordered rank, no global sort"),
    ("stats_durbin_watson", "1-row OLS-coefficient broadcast over the daily "
     "frame, adjacency self-join on d = prev+1, micro-unit integer fold"),
    ("stats_cronbach_alpha", "user x week pivot folds as k exact per-week "
     "variance sums + one total-score variance — all map-side combines"),
    ("eval_classifier_report", "lang-id marker heuristic is pure column "
     "expressions; confusion counts are one grouped fold, |classes| rows"),
    ("eval_brier_score", "one map-side-combined scalar fold over the scan; "
     "integer (u - y*2^30)^2 accumulates in decimal(38,0)"),
    ("eval_log_loss", "per-row ln is the only transcendental; pico-unit "
     "floor-scaled BIGINTs fold in decimal(38,0) — order-independent"),
    ("eval_ece", "10 score bins via integer division; the gap fold is "
     "all-integer |sy*2^30 - su| — one grouped fold then one scalar fold"),
    ("eval_retrieval_per_query", "8-row query-set broadcast over the scan, "
     "per-query partitioned rank (never global), grouped fold to 8 rows"),
    ("retrieval_eval_pipeline", "the per-query subplan into ONE 1-row fold; "
     "reciprocal ranks as exact 2^30 div rank integers"),
    # r11 wave
    ("eval_auc_delong", "two distinct-value rank subplans (bucket-parallel "
     "prefix sums, no single-partition window), two equi joins back on the "
     "score keys, ONE 1-row eleven-sum moment fold"),
    ("bpe_train_rounds", "per round: ONE pair-count shuffle, TakeOrdered(1) "
     "argmax, 1-row broadcast, scan-stage array fold over the vocab; "
     "localCheckpoint breaks the K-round lineage"),
    ("graph_label_propagation", "per round: neighbor-label equi-join + "
     "(src,lbl) count + src argmax — all vertex-keyed shuffles, Pregel LPA "
     "as DataFrame joins"),
    ("tokenizer_pipeline", "the shared BPE training loop (pair-count "
     "shuffle, TakeOrdered(1) argmax, 1-row broadcast, array fold per "
     "round) into ONE lang-keyed join+rollup"),
    ("stats_cvm", "one distinct-value count, bucket-parallel prefix sums, "
     "one 1-row HUGEINT fold — no sort, no window"),
    ("eval_average_precision", "distinct-score prefix sums into exact "
     "integral-div block terms; one 1-row fold, zero floats before the "
     "closing division"),
    ("eval_ann_recall", "8-row centroid + probe-query broadcasts; ANN "
     "candidates from the cell-id equi-join; two per-query partitioned "
     "ranks (never global)"),
    ("embed_silhouette", "k-row centroid broadcast against the vector "
     "scan; in-row zip_with distances; per-label pico-unit fold"),
    ("events_page_hinkley", "three calendar-squared triangular self-joins "
     "on the daily frame; everything integer until the emit"),
    ("stats_dunn_posthoc", "rank sums off the shared prefix-sum frame; "
     "the BH rank is a 10x10 triangular self-join — deliberately NOT a "
     "global window, so no Exchange SinglePartition anywhere"),
    ("orders_abc_classification", "descending cumulative via two-phase "
     "prefix sums over a packed unique key — no data-sized self-join, "
     "no global window"),
    # r12: close the r11 doc drift (VERDICT #5/#7) — the two unpinned
    # expensive headline plans plus the five r11 ops PLANS.md missed
    ("dedup_clusters_unique", "exact-dup collapse is ONE sha2-digest "
     "groupBy (32-byte keys, map-side combined) checkpointed once for "
     "both consumers; near-dup join runs on representatives only; star "
     "edges keep the graph linear in duplication; LPA pointer-jumping "
     "rounds localCheckpoint per round"),
    ("stats_bartlett", "one map-side-combined per-type moment fold "
     "(n, sum, sum of squares in decimal38), then the k-group pooled-"
     "variance algebra on the |types|-row frame — no joins, no window"),
    ("stats_wilson_ci", "ONE map-side-combined scalar fold over the scan "
     "(n, x); Wilson and Wald bounds are scalar algebra on the 1-row "
     "frame"),
    ("eval_macro_f1", "scan-fused confusion aggregate to <= |langs|^2 "
     "rows, two bounded rollups, FULL-OUTER class-union join "
     "(broadcastable), ordered per-class F1 fold in one 1-row close"),
    ("multimodal_image_entropy", "decode + 8-bin histogram inside the "
     "Arrow-batched mapInPandas (8 longs cross the boundary per image); "
     "the c·ln c entropy algebra is JVM column expressions in fixed "
     "b0..b7 order"),
    ("maintenance_compaction_plan", "one partition rollup, first-fit "
     "assignment as integer floor over an exact ordered cumulative sum "
     "on the |months|-row frame — planning-as-data, no data-sized stage "
     "after the rollup"),
    # r12 wave: PII family + quality classifier
    ("pii_detect_report", "SCAN-STAGE ONLY: regex counts and the Luhn "
     "digit fold are per-document projections inside WholeStageCodegen "
     "— zero exchanges, zero Python; reader throughput at 100 TB"),
    ("pii_redact", "the regexp_replace masking chain as one scan-stage "
     "projection — zero exchanges; text never shuffles"),
    ("pii_prevalence_by_source", "detectors scan-stage, ONE map-side-"
     "combined groupBy on source; |sources| rows out"),
    ("quality_classifier_score", "trigram windows materialize inside "
     "transform() (never exploded); hash + weight lookup + fold are one "
     "scan-stage expression — zero exchanges"),
    ("privacy_pipeline", "the 8th flagship: detect + redact + residual-"
     "verify fuse into ONE scan-stage projection (text never shuffles); "
     "the per-source rollup is the family's single map-side-combined "
     "groupBy"),
    # r12 late wave: release audits, BT ranking, novelty
    ("privacy_k_anonymity", "ONE map-side-combined groupBy to the "
     "QI-bounded equivalence-class table, then an in-stage literal-array "
     "4-threshold explode and a 4-row re-aggregate — no join anywhere"),
    ("privacy_l_diversity", "two bounded exchanges (QI+sensitive partial "
     "dedup, then the QI fold with COUNT DISTINCT) + the in-stage "
     "threshold explode — agg_multi_distinct topology"),
    ("eval_bradley_terry", "one groupBy to per-user type counts, one "
     "user-keyed self-join bounded by |types|^2 per user; all 3 MM "
     "rounds ride |types|^2-bounded broadcast joins — no data-sized "
     "shuffle after the duel stage"),
    ("text_ngram_novelty", "per-doc distinct shingles hash scan-stage to "
     "int64; one distinct exchange per side; ONE partitioned left-anti "
     "join (train side corpus-sized — deliberately not broadcast); "
     "|sources|-row rollup"),
    ("text_lang_id_multi", "r13 multiclass lang-ID: the trigram bucket "
     "array materializes ONCE per row, all five class folds read it — "
     "zero exchanges, zero Python; reader throughput"),
    ("eval_krippendorff_alpha", "three raters as a same-scan 3x "
     "projection (union, not join); ONE (doc,cat) count exchange; the "
     "scalar closes over broadcast 1-row frames"),
    ("eval_rank_biased_overlap", "both ranking pools compile to "
     "TakeOrderedAndProject; the IVF side's probe restriction is a "
     "broadcast join BEFORE ranking; all RBO algebra on one row"),
    ("stats_logrank_test", "the KM/NA survival plan shape: per-user "
     "conditional min/max shuffle + calendar-bounded duration agg, then "
     "the whole hypergeometric test on a single-row ordered array"),
    ("stats_breusch_pagan", "one (type, day) aggregate; both the trend "
     "and the squared-residual auxiliary regression are in-row folds "
     "over the day-sorted array — the raw log never joins or windows"),
    ("drift_positive_control", "one view-cohort scan projected twice "
     "(union, no re-read), the KS two-phase distributed prefix sum, a "
     "20-row bin aggregate, 1-row scalar stitches"),
    ("embed_separation_control", "the embed_triplet_mining shape on the "
     "boosted space: broadcast anchor sample over the scan, per-anchor "
     "partitioned window ranks — never a global window"),
    ("retrieval_hybrid_rrf", "zero hash/range exchanges: both source "
     "rankings end in TakeOrderedAndProject(20) (BM25 tf = scan-stage "
     "array filters + 1-row stats broadcast; dense dot = 1-row query "
     "broadcast), then a 20x20 full outer fusion join on bounded frames"),
    ("eval_bleu", "one (pair, n, h) count shuffle carries the whole metric: "
     "4-way n-gram expansion is an in-row flatten+explode in the scan "
     "stage, cand/ref counts are conditional sums in the SAME aggregate "
     "(no cand-vs-ref join), corpus fold is a 1-row aggregate"),
    ("text_bm25_batch", "the parameterized serving shape: per-term tfs are "
     "scan-stage array filters (one column per distinct term in the query "
     "SET), 1-row widened stats broadcast, in-row |Q|-struct explode fans "
     "out per query, and the only data-sized exchange is the per-query "
     "rank — WindowGroupLimit prunes map-side to <=10 before the shuffle"),
    ("eval_cer",
     "one (pair) groupBy assembling the paired texts via conditional MAX "
     "(map-side partial) is the ONLY data exchange; the quadratic "
     "Levenshtein DP is the built-in JVM expression in the post-shuffle "
     "project — no join, no Python; pico decimal(38,0) macro fold, 1-row "
     "finish"),
    ("eval_dedup_pr",
     "both proven sub-quadratic candidate generators (posting-list exact "
     "Jaccard, declared-permutation MinHash banding) feed one pair-level "
     "full-outer hash join; per-threshold counts are conditional sums in "
     "a 1-row fold, and the operating curve is a bounded 4-row in-row "
     "struct explode — thresholds never join"),
]


def main() -> None:
    registry.load_all()
    spark = get_spark(app_name="wri-plan-dump")
    out = [
        "# PLANS — formatted physical plans for the headline queries",
        "",
        f"Generated by `experiments/dump_plans.py` at sf dir `{SF_DIR}` "
        "(plans are data-size dependent only through AQE; shapes below are "
        "the pre-AQE compile-time plans, which is what survives scale-up).",
        "",
    ]
    for name, note in SHOWCASE:
        df = registry.REGISTRY[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        out.append(f"## {name}")
        out.append("")
        out.append(f"*What to see:* {note}.")
        out.append("")
        out.append("```")
        out.append(plan.rstrip())
        out.append("```")
        out.append("")
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print(f"PLANS.md written ({len(SHOWCASE)} plans)")


if __name__ == "__main__":
    main()
