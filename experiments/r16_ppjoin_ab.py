#!/usr/bin/env python
"""PPJoin-style positional prefix cut for _jaccard_pairs — the r15 deferred
item 1 / VERDICT r15 top_next, measured against its documented adoption bar:

  adopt only if (interleaved sf0.1 >= neutral) AND (pair-stream rows strictly
  below the current 822K) AND oracle green for all seven consumers.

Theory (exact, no approximation):
  For threshold t = 3/5, a qualifying pair (a, b) has
    c >= (3/8)(n_a + n_b)            [J = c/(n_a+n_b-c) >= t]
  and J <= n_b/n_a forces n_b >= (3/5) n_a, so c >= ceil(3*n_a/5) =: alpha_a
  (symmetrically alpha_b). Order ELIGIBLE shingles (global DF in
  [2, _MAX_DF]) by any global total order; the smallest common eligible
  shingle of a qualifying pair sits at position <= m - c + 1 <= m - alpha + 1
  in BOTH docs' sorted eligible arrays — so generating candidates only from
  the first p_d = m_d - alpha_d + 1 entries ("prefix") of each doc misses no
  qualifying pair. Docs with m_d < alpha_d cannot qualify at all. A verify
  join (array_intersect over the full eligible arrays, full-n denominators)
  recomputes the exact c, so the output is identical to the full posting
  explode.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from wri_data_processing_spark.catalog import table
from wri_data_processing_spark.queries.llm_dedup import (
    _JACCARD_THRESHOLD,
    _JT_DEN,
    _JT_NUM,
    _MAX_DF,
    _PACK,
    _jaccard_pairs,
    _shingles_hashed,
)
from wri_data_processing_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("AB_REPS", "5"))


def ppjoin_pairs(sh: DataFrame, max_df: int = _MAX_DF) -> DataFrame:
    """Prefix-cut variant of _jaccard_pairs: identical output frame."""
    pk = F.col("doc_id") * _PACK + F.col("n")
    g = (
        sh.select(pk.alias("pk"), "shingle")
        .groupBy("shingle")
        .agg(F.collect_list("pk").alias("ds"))
        .filter((F.size("ds") >= 2) & (F.size("ds") <= max_df))
    )
    # eligible (pk, shingle) entries, then per-doc sorted eligible arrays
    el = g.select(F.explode("ds").alias("pk"), "shingle")
    ea = (
        el.groupBy("pk")
        .agg(F.array_sort(F.collect_list("shingle")).alias("es"))
        .withColumn("m", F.size("es").cast("long"))
        .withColumn("alpha", F.expr(f"(pk % {_PACK}) * {_JT_NUM} div {_JT_DEN} + "
                                    f"if((pk % {_PACK}) * {_JT_NUM} % {_JT_DEN} = 0, 0, 1)"))
        .filter(F.col("m") >= F.col("alpha"))
        .withColumn("p", (F.col("m") - F.col("alpha") + 1).cast("int"))
    )
    pe = ea.select("pk", F.explode(F.slice("es", F.lit(1), F.col("p"))).alias("shingle"))
    pg = (
        pe.groupBy("shingle")
        .agg(F.collect_list("pk").alias("ds"))
        .filter(F.size("ds") >= 2)
    )
    pa, pb = F.col("a") % _PACK, F.col("b") % _PACK
    cand = (
        pg.select(F.explode("ds").alias("a"), "ds")
        .select("a", F.explode("ds").alias("b"))
        .filter(
            (F.col("a") < F.col("b"))
            & (F.least(pa, pb) * _JT_DEN >= F.greatest(pa, pb) * _JT_NUM)
        )
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("_dup"))
        .select("a", "b")
    )
    ver = (
        cand.join(ea.select(F.col("pk").alias("a"), F.col("es").alias("es_a")), "a")
        .join(ea.select(F.col("pk").alias("b"), F.col("es").alias("es_b")), "b")
        .select(
            "a",
            "b",
            F.size(F.array_intersect("es_a", "es_b")).cast("long").alias("n_common"),
        )
    )
    n_a, n_b = F.col("a") % _PACK, F.col("b") % _PACK
    jac = F.col("n_common") / (n_a + n_b - F.col("n_common"))
    return ver.filter(jac >= _JACCARD_THRESHOLD).select(
        F.floor(F.col("a") / _PACK).cast("long").alias("doc_a"),
        F.floor(F.col("b") / _PACK).cast("long").alias("doc_b"),
        F.round(jac, 4).alias("jaccard"),
    )


def main() -> None:
    spark = get_spark("r16-ppjoin")
    d = table(spark, SF_DIR, "documents")
    sh = _shingles_hashed(d)

    # --- equivalence first ---------------------------------------------
    old = _jaccard_pairs(sh)
    new = ppjoin_pairs(sh)
    d1 = old.exceptAll(new).count()
    d2 = new.exceptAll(old).count()
    print(f"equivalence: old\\new={d1} new\\old={d2}", flush=True)

    # --- pair-stream volumes --------------------------------------------
    pk = F.col("doc_id") * _PACK + F.col("n")
    g = (
        sh.select(pk.alias("pk"), "shingle")
        .groupBy("shingle")
        .agg(F.collect_list("pk").alias("ds"))
        .filter((F.size("ds") >= 2) & (F.size("ds") <= _MAX_DF))
    )
    pa, pb = F.col("a") % _PACK, F.col("b") % _PACK
    old_pairs = (
        g.select(F.explode("ds").alias("a"), "ds")
        .select("a", F.explode("ds").alias("b"))
        .filter(
            (F.col("a") < F.col("b"))
            & (F.least(pa, pb) * _JT_DEN >= F.greatest(pa, pb) * _JT_NUM)
        )
        .count()
    )
    # candidate rows entering the prefix pair groupBy + the verify join size
    el = g.select(F.explode("ds").alias("pk"), "shingle")
    ea = (
        el.groupBy("pk")
        .agg(F.array_sort(F.collect_list("shingle")).alias("es"))
        .withColumn("m", F.size("es").cast("long"))
        .withColumn("alpha", F.expr(f"(pk % {_PACK}) * {_JT_NUM} div {_JT_DEN} + "
                                    f"if((pk % {_PACK}) * {_JT_NUM} % {_JT_DEN} = 0, 0, 1)"))
        .filter(F.col("m") >= F.col("alpha"))
        .withColumn("p", (F.col("m") - F.col("alpha") + 1).cast("int"))
    )
    pe = ea.select("pk", F.explode(F.slice("es", F.lit(1), F.col("p"))).alias("shingle"))
    pg = pe.groupBy("shingle").agg(F.collect_list("pk").alias("ds")).filter(F.size("ds") >= 2)
    cand_rows = (
        pg.select(F.explode("ds").alias("a"), "ds")
        .select("a", F.explode("ds").alias("b"))
        .filter(
            (F.col("a") < F.col("b"))
            & (F.least(pa, pb) * _JT_DEN >= F.greatest(pa, pb) * _JT_NUM)
        )
        .count()
    )
    cand_distinct = (
        pg.select(F.explode("ds").alias("a"), "ds")
        .select("a", F.explode("ds").alias("b"))
        .filter(
            (F.col("a") < F.col("b"))
            & (F.least(pa, pb) * _JT_DEN >= F.greatest(pa, pb) * _JT_NUM)
        )
        .distinct()
        .count()
    )
    print(
        f"pair streams: old explode rows={old_pairs}  prefix cand rows={cand_rows}"
        f"  distinct candidates={cand_distinct}",
        flush=True,
    )

    # --- interleaved timing ----------------------------------------------
    def _t(mk) -> float:
        t0 = time.perf_counter()
        mk().write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    mk_old = lambda: _jaccard_pairs(_shingles_hashed(table(spark, SF_DIR, "documents")))
    mk_new = lambda: ppjoin_pairs(_shingles_hashed(table(spark, SF_DIR, "documents")))
    _t(mk_old), _t(mk_new)
    olds, news = [], []
    for _ in range(REPS):
        olds.append(_t(mk_old))
        news.append(_t(mk_new))
    o, n = statistics.median(olds), statistics.median(news)
    print(
        f"jaccard_pairs: old {o:.3f}s new {n:.3f}s ({n / o:.2f}x)"
        f"  olds={[round(x, 2) for x in olds]} news={[round(x, 2) for x in news]}",
        flush=True,
    )


if __name__ == "__main__":
    main()
