#!/usr/bin/env python
"""A/B text_lang_id_multi's scoring formulation (r15).

The op hashes every char trigram (sha256 slice mod 2048) and folds five
class-weight sums per doc. Current shape: one interpreted transform()
building the bucket array + FIVE interpreted aggregate() folds over it.
Variants (identical scores by construction):

- engine:   current (transform + 5 folds)
- fold1:    transform + ONE fold carrying a 5-field struct accumulator
            (one array iteration instead of five)
- explode:  regex trigram extraction (codegen) -> explode -> hash+
            weight lookups in a codegen'd projection -> groupBy(doc_id)
            + first(lang) partial-agg sums (adds one doc-sized exchange).
            NOTE: first(lang) has a string aggregation buffer, which
            HashAggregate cannot hold -> SortAggregate, which sorts every
            exploded trigram row per partition.
- hashagg:  explode shape but lang as a GROUPING KEY (doc_id, lang) —
            pure HashAggregate, no per-partition sort. THE SHIPPED r15
            ENGINE SHAPE (measured 2.51 -> 2.06 s median vs explode in
            the adopting session, exceptAll-equal both ways at sf0.01).
- xxprobe:  engine shape with xxhash64 instead of sha256 — NOT a candidate
            (different values); run only to attribute how much of the cost
            is the sha itself.

Run: python experiments/r15_lid_ab.py [reps]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from wri_data_processing_spark.session import get_spark
from wri_data_processing_spark.catalog import table
from wri_data_processing_spark.queries import llm_text as lt

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 5


def lid_fold1(spark, sf_dir):
    d = table(spark, sf_dir, "documents").filter(F.length("text") >= 3)
    text = F.col("text")
    bkts = F.transform(
        F.sequence(F.lit(1), F.length(text) - 2),
        lambda i: (
            F.conv(F.substring(F.sha2(F.substr(text, i, F.lit(3)), 256), 1, 15), 16, 10)
            .cast("long")
            % lt._LID_D
        ).cast("int"),
    )
    b = d.select("doc_id", "lang", bkts.alias("bkts"))
    ws = {c: F.array(*[F.lit(w) for w in lt._LID_W[c]]) for c in lt._LID_CLASSES}
    zero = F.struct(
        *[F.lit(0).cast("long").alias(f"s_{c}") for c in lt._LID_CLASSES]
    )
    folded = F.aggregate(
        F.col("bkts"),
        zero,
        lambda acc, x: F.struct(
            *[
                (acc[f"s_{c}"] + F.element_at(ws[c], x + 1)).alias(f"s_{c}")
                for c in lt._LID_CLASSES
            ]
        ),
    )
    s = b.select("doc_id", "lang", folded.alias("f")).select(
        "doc_id", "lang", *[F.col(f"f.s_{c}").alias(f"s_{c}") for c in lt._LID_CLASSES]
    )
    return s.withColumn("pred_lang", lt._lid_pred_col()).select(
        "doc_id", F.col("lang").alias("labeled_lang"),
        "s_de", "s_en", "s_es", "s_fr", "s_zh", "pred_lang",
    )


def lid_explode(spark, sf_dir):
    d = table(spark, sf_dir, "documents").filter(F.length("text") >= 3)
    # (?s)(?=(...)): one capture per char position — every length-3 window,
    # '.' crossing newlines, same trigram stream as substr(text, i, 3)
    tri = F.regexp_extract_all(F.col("text"), F.lit(r"(?s)(?=(...))"), 1)
    g = d.select("doc_id", "lang", F.explode(tri).alias("t"))
    bkt = (
        F.conv(F.substring(F.sha2(F.col("t"), 256), 1, 15), 16, 10).cast("long")
        % lt._LID_D
    ).cast("int")
    ws = {c: F.array(*[F.lit(w) for w in lt._LID_W[c]]) for c in lt._LID_CLASSES}
    h = g.select("doc_id", "lang", bkt.alias("x"))
    s = h.groupBy("doc_id").agg(
        F.first("lang").alias("lang"),
        *[
            F.sum(F.element_at(ws[c], F.col("x") + 1)).cast("long").alias(f"s_{c}")
            for c in lt._LID_CLASSES
        ],
    )
    return s.withColumn("pred_lang", lt._lid_pred_col()).select(
        "doc_id", F.col("lang").alias("labeled_lang"),
        "s_de", "s_en", "s_es", "s_fr", "s_zh", "pred_lang",
    )


def lid_hashagg(spark, sf_dir):
    d = table(spark, sf_dir, "documents").filter(F.length("text") >= 3)
    tri = F.regexp_extract_all(F.col("text"), F.lit(r"(?s)(?=(...))"), 1)
    g = d.select("doc_id", "lang", F.explode(tri).alias("t"))
    bkt = (
        F.conv(F.substring(F.sha2(F.col("t"), 256), 1, 15), 16, 10).cast("long")
        % lt._LID_D
    ).cast("int")
    ws = {c: F.array(*[F.lit(w) for w in lt._LID_W[c]]) for c in lt._LID_CLASSES}
    h = g.select("doc_id", "lang", bkt.alias("x"))
    s = h.groupBy("doc_id", "lang").agg(
        *[
            F.sum(F.element_at(ws[c], F.col("x") + 1)).cast("long").alias(f"s_{c}")
            for c in lt._LID_CLASSES
        ],
    )
    return s.withColumn("pred_lang", lt._lid_pred_col()).select(
        "doc_id", F.col("lang").alias("labeled_lang"),
        "s_de", "s_en", "s_es", "s_fr", "s_zh", "pred_lang",
    )


def lid_xxprobe(spark, sf_dir):
    d = table(spark, sf_dir, "documents").filter(F.length("text") >= 3)
    text = F.col("text")
    bkts = F.transform(
        F.sequence(F.lit(1), F.length(text) - 2),
        lambda i: (F.xxhash64(F.substr(text, i, F.lit(3))) % lt._LID_D).cast("int"),
    )
    b = d.select("doc_id", "lang", bkts.alias("bkts"))

    def score(c):
        w_arr = F.array(*[F.lit(w) for w in lt._LID_W[c]])
        return F.aggregate(
            F.col("bkts"), F.lit(0).cast("long"),
            lambda acc, x: acc + F.element_at(w_arr, F.abs(x) + 1),
        ).alias(f"s_{c}")

    return b.select("doc_id", *[score(c) for c in lt._LID_CLASSES])


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    spark = get_spark(app_name="r15-lid-ab")
    base = lt.text_lang_id_multi(spark, "/root/testdata/sf0.01")
    for name, fn in (
        ("fold1", lid_fold1),
        ("explode", lid_explode),
        ("hashagg", lid_hashagg),
    ):
        v = fn(spark, "/root/testdata/sf0.01")
        assert v.exceptAll(base).count() == 0 and base.exceptAll(v).count() == 0, name
    print("EQUIVALENCE OK (fold1 + explode + hashagg == engine, sf0.01)")

    cases = {
        "engine(=hashagg)": lambda: lt.text_lang_id_multi(spark, SF_DIR),
        "fold1(struct)": lambda: lid_fold1(spark, SF_DIR),
        "explode(sortagg)": lambda: lid_explode(spark, SF_DIR),
        "xxprobe(attrib)": lambda: lid_xxprobe(spark, SF_DIR),
    }

    def run(mk):
        t0 = time.perf_counter()
        noop(mk())
        return time.perf_counter() - t0

    for name, mk in cases.items():
        run(mk)
    res = {k: [] for k in cases}
    for r in range(REPS):
        for name, mk in cases.items():
            spark.sparkContext.setJobDescription(f"lid {name} rep{r}")
            res[name].append(run(mk))
    for name, ts in res.items():
        print(
            f"{name:18s} median {statistics.median(ts):6.3f}  min {min(ts):6.3f}  "
            + " ".join(f"{t:.2f}" for t in ts)
        )


if __name__ == "__main__":
    main()
