#!/usr/bin/env python
"""A/B: guard the BPE rewrite fold with a contains() pre-check (r15).

Each _bpe_loop round rewrites the whole vocabulary through an interpreted
aggregate/slice/when fold, but a word changes only if it CONTAINS the
merged pair. `contains(array_join(syms,' '), lt || ' ' || rt)` is a
codegen'd substring check and a strict SUPERSET of the words the fold
would change (an adjacent pair always appears as "lt rt" in the joined
stream; false positives just run the fold and change nothing), so
`when(contains, fold).otherwise(syms)` is value-identical and skips the
interpreted fold for the unaffected majority.

Run: python experiments/r15_bpe_ab.py [reps]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wri_data_processing_spark.session import get_spark
from wri_data_processing_spark.queries import llm_pipeline as lp

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 5


def _bpe_loop_guarded(syms: DataFrame, rounds: int, rewrite_last: bool):
    merges = []
    for r in range(1, rounds + 1):
        bgarr = F.regexp_extract_all(
            F.array_join("syms", " "), F.lit(r"(?<=^|\s)(?=(\S+ \S+))"), 1
        )
        pc = (
            syms.filter(F.size("syms") >= 2)
            .select("cnt", F.explode_outer(bgarr).alias("b"))
            .select(
                "cnt",
                F.substring_index("b", " ", 1).alias("left_tok"),
                F.substring_index("b", " ", -1).alias("right_tok"),
            )
            .groupBy("left_tok", "right_tok")
            .agg(F.sum("cnt").cast("long").alias("n_pairs"))
        )
        best = (
            pc.orderBy(F.col("n_pairs").desc(), "left_tok", "right_tok")
            .limit(1)
            .select(
                F.lit(r).cast("long").alias("round"),
                "left_tok",
                "right_tok",
                F.concat(F.col("left_tok"), F.col("right_tok")).alias("merged"),
                "n_pairs",
            )
            .localCheckpoint()
        )
        merges.append(best)
        if r < rounds or rewrite_last:
            lt, rt = F.col("left_tok"), F.col("right_tok")
            fold = F.aggregate(
                F.slice(F.col("syms"), F.lit(2), F.size("syms") - 1),
                F.slice(F.col("syms"), F.lit(1), F.lit(1)),
                lambda acc, x: F.when(
                    (F.element_at(acc, -1) == lt) & (x == rt),
                    F.concat(
                        F.slice(acc, F.lit(1), F.size(acc) - 1),
                        F.array(F.concat(lt, rt)),
                    ),
                ).otherwise(F.concat(acc, F.array(x))),
            )
            has_pair = F.contains(
                F.array_join("syms", " "), F.concat(lt, F.lit(" "), rt)
            )
            syms = (
                syms.crossJoin(F.broadcast(best.select("left_tok", "right_tok")))
                .select(
                    "word",
                    "cnt",
                    F.when(has_pair, fold).otherwise(F.col("syms")).alias("syms"),
                )
                .localCheckpoint()
            )
    return merges, syms


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    spark = get_spark(app_name="r15-bpe-ab")
    from wri_data_processing_spark.catalog import table

    # equivalence: per-round merge rows and the final rewritten vocabulary
    for sf in ("/root/testdata/sf0.01", SF_DIR):
        d = table(spark, sf, "documents")
        m_old, s_old = lp._bpe_loop(lp._bpe_word_syms(d), lp._BPE_ROUNDS, True)
        m_new, s_new = _bpe_loop_guarded(lp._bpe_word_syms(d), lp._BPE_ROUNDS, True)
        for a, b in zip(m_old, m_new):
            assert a.collect() == b.collect()
        assert s_new.exceptAll(s_old).count() == 0
        assert s_old.exceptAll(s_new).count() == 0
    print("EQUIVALENCE OK (merges + final syms, both SFs)")

    def run(loop_fn):
        d = table(spark, SF_DIR, "documents")
        t0 = time.perf_counter()
        merges, syms = loop_fn(lp._bpe_word_syms(d), lp._BPE_ROUNDS, True)
        noop(syms)
        return time.perf_counter() - t0

    cases = {"fold_always(engine)": lp._bpe_loop, "fold_guarded": _bpe_loop_guarded}
    for name, fn in cases.items():
        run(fn)
    res = {k: [] for k in cases}
    for r in range(REPS):
        for name, fn in cases.items():
            spark.sparkContext.setJobDescription(f"bpe {name} rep{r}")
            res[name].append(run(fn))
    for name, ts in res.items():
        print(
            f"{name:20s} median {statistics.median(ts):6.3f}  min {min(ts):6.3f}  "
            + " ".join(f"{t:.2f}" for t in ts)
        )


if __name__ == "__main__":
    main()
