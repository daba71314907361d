#!/usr/bin/env python
"""Interleaved warm A/B of the r16 query rewrites, one process.

Same discipline as r15 (experiments/r15_query_ab.py): the old (r15/HEAD)
implementation of each rewritten query is copied inline below; the new one
is imported from the engine. Both run alternately in ONE SparkSession,
warm, median of N, noop sink — the only comparison that holds on this
load-flappy host. Usage:

    python experiments/r16_ab.py [substring|winnow|spans|privacy|cer ...]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from wri_data_processing_spark import registry
from wri_data_processing_spark.catalog import table
from wri_data_processing_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("AB_REPS", "5"))


def _time(mk) -> float:
    t0 = time.perf_counter()
    mk().write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def ab(name, mk_old, mk_new):
    _time(mk_old), _time(mk_new)  # warm both plans
    olds, news = [], []
    for _ in range(REPS):
        olds.append(_time(mk_old))
        news.append(_time(mk_new))
    o, n = statistics.median(olds), statistics.median(news)
    print(
        f"{name}: old {o:.3f}s new {n:.3f}s ({n / o:.2f}x)"
        f"  olds={[round(x, 2) for x in olds]} news={[round(x, 2) for x in news]}",
        flush=True,
    )


# ---- old shapes (r15 HEAD, copied verbatim) --------------------------------

_SUBSTR_K = 40
_WINNOW_W = 8


def old_substring_coverage(spark, sf_dir, k=_SUBSTR_K):
    from wri_data_processing_spark.queries.llm_dedup import _spread_small_scan

    d = table(spark, sf_dir, "documents").filter(F.length("text") >= k)
    wins = _spread_small_scan(d).select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("text") - (k - 1)),
                lambda i: F.substring(
                    F.sha2(F.col("text").substr(i, F.lit(k)), 256), 1, 16
                ),
            )
        ).alias("wh"),
    )
    dup = (
        wins.groupBy("wh")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("wh", F.lit(1).alias("isdup"))
    )
    return (
        wins.join(dup, "wh", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.count("isdup").alias("n_dup_windows"),
        )
    )


def old_winnow_coverage(spark, sf_dir, k=_SUBSTR_K, w=_WINNOW_W):
    from wri_data_processing_spark.queries.llm_dedup import _spread_small_scan

    d = table(spark, sf_dir, "documents").filter(F.length("text") >= k + w - 1)
    hs = F.transform(
        F.sequence(F.lit(1), F.length("text") - (k - 1)),
        lambda i: F.substring(F.sha2(F.col("text").substr(i, F.lit(k)), 256), 1, 16),
    )
    fps = (
        _spread_small_scan(d)
        .select("doc_id", hs.alias("hs"))
        .select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    F.transform(
                        F.sequence(F.lit(1), F.size("hs") - (w - 1)),
                        lambda j: F.array_min(F.slice("hs", j, w)),
                    )
                )
            ).alias("fp"),
        )
    )
    dup = (
        fps.groupBy("fp")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("fp", F.lit(1).alias("isdup"))
    )
    return (
        fps.join(dup, "fp", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_fingerprints"),
            F.count("isdup").alias("n_dup_fingerprints"),
        )
    )


def old_dup_spans(spark, sf_dir, k=_SUBSTR_K):
    from pyspark.sql import Window

    from wri_data_processing_spark.queries.llm_dedup import _spread_small_scan

    d = table(spark, sf_dir, "documents").filter(F.length("text") >= k)
    wins = (
        _spread_small_scan(d)
        .select(
            "doc_id",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(1), F.length("text") - (k - 1)),
                    lambda i: F.substring(
                        F.sha2(F.col("text").substr(i, F.lit(k)), 256), 1, 16
                    ),
                )
            ).alias("i0", "wh"),
        )
        .select("doc_id", (F.col("i0") + 1).cast("long").alias("i"), "wh")
    )
    dup = (
        wins.groupBy("wh")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("wh")
    )
    hits = wins.join(dup, "wh").select("doc_id", "i")
    w = Window.partitionBy("doc_id").orderBy("i")
    marked = hits.select(
        "doc_id",
        "i",
        F.when(F.lag("i").over(w).isNull(), 1)
        .when(F.col("i") - F.lag("i").over(w) > k, 1)
        .otherwise(0)
        .alias("brk"),
    )
    islands = marked.select(
        "doc_id",
        "i",
        F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("island"),
    )
    return islands.groupBy("doc_id", "island").agg(
        F.min("i").alias("span_start"),
        (F.max("i") + (k - 1)).alias("span_end"),
        (F.max("i") + k - F.min("i")).alias("span_len"),
    )


def old_privacy_pipeline(spark, sf_dir):
    from wri_data_processing_spark.queries.pii import (
        _RE_CARD,
        _RE_EMAIL,
        _RE_IPV4,
        _RE_PHONE,
        _RE_SSN,
        _luhn_ok_col,
        _pii_text_col,
    )

    d = table(spark, sf_dir, "documents")
    t = _pii_text_col()

    def n_pii(col):
        total = sum(
            (
                F.size(F.regexp_extract_all(col, F.lit(p), F.lit(0)))
                for p in (_RE_PHONE, _RE_IPV4, _RE_SSN)
            ),
            F.size(F.regexp_extract_all(col, F.lit(_RE_EMAIL), F.lit(0))),
        )
        cards = F.filter(
            F.regexp_extract_all(col, F.lit(_RE_CARD), F.lit(0)),
            lambda c: _luhn_ok_col(c),
        )
        return total + F.size(cards)

    red = t
    for pat, tok in [
        (_RE_EMAIL, "[EMAIL]"),
        (_RE_CARD, "[CARD]"),
        (_RE_SSN, "[SSN]"),
        (_RE_PHONE, "[PHONE]"),
        (_RE_IPV4, "[IP]"),
    ]:
        red = F.regexp_replace(red, pat, tok)
    per = d.select(
        "source",
        F.when(n_pii(t) > 0, 1).otherwise(0).alias("had"),
        F.when(red != t, 1).otherwise(0).alias("changed"),
        (F.length(t) - F.length(red)).cast("long").alias("removed"),
        F.when(n_pii(red) > 0, 1).otherwise(0).alias("residual"),
    )
    return (
        per.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("had").cast("long").alias("docs_with_pii"),
            F.sum("changed").cast("long").alias("docs_redacted"),
            F.sum("removed").cast("long").alias("chars_removed"),
            F.sum("residual").cast("long").alias("docs_residual_pii"),
            F.round(
                F.sum("had").cast("double") / F.count(F.lit(1)).cast("double"), 6
            ).alias("pii_doc_rate"),
        )
        .orderBy("source")
    )


def old_eval_cer(spark, sf_dir):
    from wri_data_processing_spark.queries.llm_dedup import _spread_small_scan

    d = table(spark, sf_dir, "documents")
    tk = _spread_small_scan(d).select(
        F.floor(F.col("doc_id") / 2).cast("long").alias("pair"),
        (F.col("doc_id") % 2).cast("int").alias("side"),
        F.trim(F.col("text")).alias("t"),
    )
    p = (
        tk.groupBy("pair")
        .agg(
            F.max(F.when(F.col("side") == 1, F.col("t"))).alias("cand"),
            F.max(F.when(F.col("side") == 0, F.col("t"))).alias("ref"),
        )
        .filter(F.col("cand").isNotNull() & F.col("ref").isNotNull())
    )
    e = p.select(
        F.levenshtein("cand", "ref").cast("long").alias("edits"),
        F.length("ref").cast("long").alias("ref_len"),
        F.length("cand").cast("long").alias("cand_len"),
    )
    terms = e.withColumn(
        "c_i",
        F.expr(
            "cast(edits as decimal(38,0)) * cast(1000000000000 as decimal(38,0))"
            " div cast(greatest(ref_len, 1) as decimal(38,0))"
        ).cast("decimal(38,0)"),
    )
    f = terms.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum("edits").cast("long").alias("total_edits"),
        F.sum("ref_len").cast("long").alias("ref_chars"),
        F.sum("cand_len").cast("long").alias("cand_chars"),
        F.sum("c_i").alias("c_sum"),
    )
    return f.select(
        "n_pairs",
        "total_edits",
        "ref_chars",
        "cand_chars",
        F.when(F.col("ref_chars") == 0, F.lit(0.0))
        .otherwise(
            F.round(
                F.col("total_edits").cast("double") / F.col("ref_chars").cast("double"),
                6,
            )
        )
        .alias("cer_micro"),
        F.round(
            F.col("c_sum").cast("double")
            / (F.col("n_pairs").cast("double") * F.lit(1000000000000.0)),
            6,
        ).alias("cer_macro"),
    )


def old_web_corpus_pipeline(spark, sf_dir):
    from wri_data_processing_spark.queries.llm_pipeline import _canonical_urls
    from wri_data_processing_spark.queries.llm_text import _lm_xent
    from wri_data_processing_spark.queries.stats_numeric import (
        _grouped_two_phase_cumsum,
    )

    d = table(spark, sf_dir, "documents")
    keep = (
        _canonical_urls(d)
        .groupBy("canonical_url")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    surv = d.join(keep, "doc_id", "left_semi")
    x = (
        _lm_xent(surv)
        .join(surv.select("doc_id", "lang"), "doc_id")
        .localCheckpoint()
    )
    gd = x.groupBy("lang", "xent").agg(
        F.count(F.lit(1)).cast("long").alias("c"),
        F.sum("n_tokens").cast("long").alias("tk"),
    )
    cum = _grouped_two_phase_cumsum(gd, "lang", "xent", ["c"])
    n = gd.groupBy("lang").agg(F.sum("c").cast("long").alias("n"))
    tails = (
        cum.withColumn("cumb", F.col("cum_c") - F.col("c"))
        .join(F.broadcast(n), "lang")
        .filter(F.expr("(cumb * 3) div n") == 2)
        .groupBy("lang")
        .agg(
            F.sum("c").cast("long").alias("n_tail"),
            F.sum("tk").cast("long").alias("tail_tokens"),
        )
    )
    inp = d.groupBy("lang").agg(F.count(F.lit(1)).cast("long").alias("n_input"))
    sv = x.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_surv"),
        F.sum("n_tokens").cast("long").alias("surv_tokens"),
    )
    return (
        inp.join(sv, "lang")
        .join(tails, "lang", "left")
        .select(
            "lang",
            "n_input",
            (F.col("n_input") - F.col("n_surv")).alias("n_url_dup"),
            F.coalesce("n_tail", F.lit(0)).cast("long").alias("n_tail_dropped"),
            (F.col("n_surv") - F.coalesce("n_tail", F.lit(0))).cast("long").alias("n_kept"),
            (F.col("surv_tokens") - F.coalesce("tail_tokens", F.lit(0)))
            .cast("long")
            .alias("kept_tokens"),
        )
    )


def old_text_ngram_novelty(spark, sf_dir):
    from wri_data_processing_spark.queries.llm_dedup import _spread_small_scan

    d = table(spark, sf_dir, "documents")
    n = 3
    d2 = _spread_small_scan(d).select(
        "source",
        F.when(F.substring(F.md5("text"), 1, 1) <= "b", "train")
        .otherwise("holdout")
        .alias("split"),
        F.split(F.trim(F.col("text")), r"\s+").alias("toks"),
    ).filter(F.size("toks") >= n)
    sh = F.regexp_extract_all(
        F.array_join("toks", " "),
        F.lit(r"(?<=^|\s)(?=(" + " ".join([r"\S+"] * n) + r"))"),
        1,
    )
    hs = d2.select(
        "source",
        "split",
        F.explode_outer(F.array_distinct(sh)).alias("shingle"),
    ).select(
        "source",
        "split",
        F.conv(F.substring(F.sha2("shingle", 256), 1, 15), 16, 10)
        .cast("long")
        .alias("h"),
    )
    train = hs.filter(F.col("split") == "train").select("h").distinct()
    hold = hs.filter(F.col("split") == "holdout").select("source", "h").distinct()
    novel = hold.join(train, "h", "left_anti")
    rep = hold.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("holdout_ngrams"))
    nvc = novel.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("nv"))
    return (
        rep.join(nvc, "source", "left")
        .select(
            "source",
            "holdout_ngrams",
            F.coalesce(F.col("nv"), F.lit(0)).cast("long").alias("novel_ngrams"),
            F.round(
                F.coalesce(F.col("nv"), F.lit(0)).cast("double")
                / F.col("holdout_ngrams").cast("double"),
                6,
            ).alias("novelty_rate"),
        )
        .orderBy("source")
    )


def old_tokenizer_pipeline(spark, sf_dir):
    from tests.test_r16_optimizations import _sequential_bpe
    from wri_data_processing_spark.queries.llm_pipeline import (
        _BPE_ROUNDS,
        _bpe_word_syms,
    )

    d = table(spark, sf_dir, "documents")
    wl = (
        d.select(
            "lang",
            F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("word"),
        )
        .filter(F.col("word") != "")
        .groupBy("lang", "word")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    syms = _bpe_word_syms(d)
    _, final_syms = _sequential_bpe(syms, _BPE_ROUNDS, rewrite_last=True)
    final = final_syms.select(
        "word",
        F.size("syms").cast("long").alias("n_tok"),
        F.length("word").cast("long").alias("n_chr"),
    )
    return (
        wl.join(final, "word")
        .groupBy("lang")
        .agg(
            F.sum("cnt").cast("long").alias("n_word_tokens"),
            F.count(F.lit(1)).cast("long").alias("n_word_types"),
            F.round(
                F.sum(F.col("cnt") * F.col("n_tok")).cast("double")
                / F.sum("cnt").cast("double"),
                6,
            ).alias("fertility"),
            F.round(
                F.sum(F.col("cnt") * F.col("n_chr")).cast("double")
                / F.sum("cnt").cast("double"),
                6,
            ).alias("mean_word_chars"),
            F.round(
                F.sum(F.col("cnt") * F.col("n_tok")).cast("double")
                / F.sum(F.col("cnt") * F.col("n_chr")).cast("double"),
                6,
            ).alias("tokens_per_char"),
        )
        .orderBy("lang")
    )


# ---- main ------------------------------------------------------------------

CASES = {
    "substring": (
        old_substring_coverage,
        lambda s, sf: registry.REGISTRY["dedup_substring"](s, sf),
    ),
    "winnow": (
        old_winnow_coverage,
        lambda s, sf: registry.REGISTRY["dedup_substring_winnow"](s, sf),
    ),
    "spans": (
        old_dup_spans,
        lambda s, sf: registry.REGISTRY["dedup_substring_spans"](s, sf),
    ),
    "privacy": (
        old_privacy_pipeline,
        lambda s, sf: registry.REGISTRY["privacy_pipeline"](s, sf),
    ),
    "cer": (
        old_eval_cer,
        lambda s, sf: registry.REGISTRY["eval_cer"](s, sf),
    ),
    "web_corpus": (
        old_web_corpus_pipeline,
        lambda s, sf: registry.REGISTRY["web_corpus_pipeline"](s, sf),
    ),
    "tokenizer": (
        old_tokenizer_pipeline,
        lambda s, sf: registry.REGISTRY["tokenizer_pipeline"](s, sf),
    ),
    "novelty": (
        old_text_ngram_novelty,
        lambda s, sf: registry.REGISTRY["text_ngram_novelty"](s, sf),
    ),
}


def main() -> None:
    names = sys.argv[1:] or list(CASES)
    registry.load_all()
    spark = get_spark("r16-ab")
    for nm in names:
        mk_old, mk_new = CASES[nm]
        ab(nm, lambda: mk_old(spark, SF_DIR), lambda: mk_new(spark, SF_DIR))


if __name__ == "__main__":
    main()
