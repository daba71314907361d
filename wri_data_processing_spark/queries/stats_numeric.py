"""Deterministic numerical statistics: moments, correlation, regression,
histograms.

Spark's built-in corr/covar/stddev use streaming co-moment merges whose
float rounding depends on partition boundaries — correct statistically,
but not bit-reproducible and never equal to another engine's result. These
operators instead aggregate EXACT decimal power sums (Σx, Σx², Σxy, n) —
order-insensitive integer-like arithmetic — and evaluate the closed-form
formulas once, in double, on the driver-free final row. Same trick as the
engine's revenue aggregates, extended to second moments.

Scale notes: one map-side-combined shuffle per grouping, carrying five
decimal accumulators per group regardless of row count. Inputs cast to
decimal(18,6) so the second-moment products are EXACT decimal(37,12) —
within the 38-digit cap in both engines (a (38,12) product would overflow
and round per-row, engine-dependently; the DuckDB oracle widens one factor
to (19,6) to force its int128 multiply path — same exact value); the sums
hold ~1e13 rows before overflow, extensible by hierarchical
re-aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wri_data_processing_spark.catalog import table
from wri_data_processing_spark.registry import query


@query(
    "stats_moments",
    oracle="""
    WITH s AS (
        SELECT l_returnflag,
               COUNT(*) AS n,
               SUM(CAST(l_quantity AS DECIMAL(18,6))) AS sx,
               SUM(CAST(l_quantity AS DECIMAL(19,6))
                   * CAST(l_quantity AS DECIMAL(18,6))) AS sxx,
               SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS sy,
               SUM(CAST(l_extendedprice AS DECIMAL(19,6))
                   * CAST(l_extendedprice AS DECIMAL(18,6))) AS syy,
               SUM(CAST(l_quantity AS DECIMAL(19,6))
                   * CAST(l_extendedprice AS DECIMAL(18,6))) AS sxy
        FROM lineitem GROUP BY l_returnflag
    ),
    d AS (
        SELECT l_returnflag, n,
               CAST(FLOOR(sx) AS DOUBLE) + CAST(sx - FLOOR(sx) AS DOUBLE) AS sx,
               CAST(FLOOR(sxx) AS DOUBLE) + CAST(sxx - FLOOR(sxx) AS DOUBLE) AS sxx,
               CAST(FLOOR(sy) AS DOUBLE) + CAST(sy - FLOOR(sy) AS DOUBLE) AS sy,
               CAST(FLOOR(syy) AS DOUBLE) + CAST(syy - FLOOR(syy) AS DOUBLE) AS syy,
               CAST(FLOOR(sxy) AS DOUBLE) + CAST(sxy - FLOOR(sxy) AS DOUBLE) AS sxy
        FROM s
    )
    SELECT l_returnflag, n,
           sx / n AS mean_qty,
           (sxx - sx * sx / n) / (n - 1) AS var_qty,
           (sxy - sx * sy / n)
             / sqrt((sxx - sx * sx / n) * (syy - sy * sy / n)) AS corr_qty_price,
           (sxy - sx * sy / n) / (sxx - sx * sx / n) AS slope_price_on_qty
    FROM d ORDER BY l_returnflag
    """,
)
def stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean/variance/correlation/regression-slope per group from exact
    decimal power sums, evaluated with identical double expression trees on
    both engines — bit-reproducible under any partitioning, unlike built-in
    corr/covar whose merge order leaks into the low bits.
    """
    l = table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("decimal(18,6)")
    y = F.col("l_extendedprice").cast("decimal(18,6)")
    s = l.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(x * x).alias("sxx"),
        F.sum(y).alias("sy"),
        F.sum(y * y).alias("syy"),
        F.sum(x * y).alias("sxy"),
    )
    n = F.col("n")

    def d2d(name: str) -> F.Column:
        # Split-cast: decimal -> floor (exact int-to-double below 2^53) +
        # fraction (unscaled < 10^12, one correctly-rounded division).
        # A direct wide-decimal -> double cast double-rounds in DuckDB
        # (int128 converts as upper*2^64 + lower), so the engines disagree
        # in the last ulp; the split makes both sides exact + one rounding.
        c = F.col(name)
        return F.floor(c).cast("double") + (c - F.floor(c)).cast("double")

    sx, sxx = d2d("sx"), d2d("sxx")
    sy, syy = d2d("sy"), d2d("syy")
    sxy = d2d("sxy")
    css_x = sxx - sx * sx / n
    css_y = syy - sy * sy / n
    ccp = sxy - sx * sy / n
    return s.select(
        "l_returnflag",
        "n",
        (sx / n).alias("mean_qty"),
        (css_x / (n - 1)).alias("var_qty"),
        (ccp / F.sqrt(css_x * css_y)).alias("corr_qty_price"),
        (ccp / css_x).alias("slope_price_on_qty"),
    ).orderBy("l_returnflag")


@query(
    "agg_histogram",
    oracle="""
    SELECT CAST(floor(l_quantity / 5) AS BIGINT) AS bucket,
           CAST(floor(l_quantity / 5) AS BIGINT) * 5 AS lo,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY bucket ORDER BY bucket
    """,
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram: bucket = floor(x / width). A histogram over
    any column is one map-side-combined aggregation on the bucket id —
    shuffle volume is |buckets|, independent of row count; floor of an
    exact double division by a power-of-10-free constant is deterministic.
    """
    l = table(spark, sf_dir, "lineitem")
    b = F.floor(F.col("l_quantity") / 5).cast("long")
    return (
        l.groupBy(b.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select("bucket", (F.col("bucket") * 5).alias("lo"), "n")
        .orderBy("bucket")
    )


@query(
    "events_zscore_outliers",
    oracle="""
    WITH s AS (
        SELECT event_type, COUNT(*) AS n,
               SUM(CAST(value AS DECIMAL(18,6))) AS sx,
               SUM(CAST(value AS DECIMAL(19,6)) * CAST(value AS DECIMAL(18,6)))
                 AS sxx
        FROM events GROUP BY event_type
    ),
    d AS (
        SELECT event_type, n,
               CAST(FLOOR(sx) AS DOUBLE) + CAST(sx - FLOOR(sx) AS DOUBLE) AS sx,
               CAST(FLOOR(sxx) AS DOUBLE) + CAST(sxx - FLOOR(sxx) AS DOUBLE) AS sxx
        FROM s
    ),
    m AS (
        SELECT event_type, sx / n AS mean,
               sqrt((sxx - sx * sx / n) / (n - 1)) AS std
        FROM d
    )
    SELECT e.event_id, e.event_type, e.value,
           (e.value - m.mean) / m.std AS z
    FROM events e JOIN m ON e.event_type = m.event_type
    WHERE abs((e.value - m.mean) / m.std) > 3.0
    """,
)
def events_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-pass standardization: per-type mean/std from exact decimal power
    sums, broadcast back onto the event scan; emit events beyond 3 sigma.

    The per-type stats table is |event types| rows — it always broadcasts,
    so the second pass is a map-only scan (no shuffle of the event log).
    Because mean/std come from the same exact sums on both engines, the
    z threshold cut is bit-deterministic: no event flips sides.
    """
    e = table(spark, sf_dir, "events")
    x = F.col("value").cast("decimal(18,6)")
    s = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(x * x).alias("sxx"),
    )

    def d2d(name: str) -> F.Column:
        c = F.col(name)
        return F.floor(c).cast("double") + (c - F.floor(c)).cast("double")

    n = F.col("n")
    sx, sxx = d2d("sx"), d2d("sxx")
    m = s.select(
        "event_type",
        (sx / n).alias("mean"),
        F.sqrt((sxx - sx * sx / n) / (n - 1)).alias("std"),
    )
    z = (F.col("value") - F.col("mean")) / F.col("std")
    return (
        e.join(F.broadcast(m), "event_type")
        .filter(F.abs(z) > 3.0)
        .select("event_id", "event_type", "value", z.alias("z"))
    )


@query(
    "profile_columns",
    oracle="""
    SELECT 'o_orderkey' AS col, COUNT(*) - COUNT(o_orderkey) AS n_null,
           COUNT(DISTINCT o_orderkey) AS n_distinct,
           CAST(MIN(o_orderkey) AS VARCHAR) AS min_str,
           CAST(MAX(o_orderkey) AS VARCHAR) AS max_str
    FROM orders
    UNION ALL
    SELECT 'o_custkey', COUNT(*) - COUNT(o_custkey),
           COUNT(DISTINCT o_custkey),
           CAST(MIN(o_custkey) AS VARCHAR), CAST(MAX(o_custkey) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', COUNT(*) - COUNT(o_orderstatus),
           COUNT(DISTINCT o_orderstatus), MIN(o_orderstatus), MAX(o_orderstatus)
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', COUNT(*) - COUNT(o_orderpriority),
           COUNT(DISTINCT o_orderpriority), MIN(o_orderpriority),
           MAX(o_orderpriority)
    FROM orders
    ORDER BY col
    """,
)
def profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table profiling: per-column null count, distinct count, and min/max
    — the statistics pass a warehouse runs to feed its cost-based
    optimizer (Spark's own ANALYZE TABLE ... COMPUTE STATISTICS computes
    exactly these).

    All four column profiles come from a single aggregation (Catalyst
    plans the multi-distinct via one Expand pass — 4x the rows, not 4
    scans), then unpivot to long form by exploding an inline struct array.
    Min/max stringified through identical integer formatting on both
    engines (no float formatting ambiguity — numeric profile columns here
    are integral).
    """
    o = table(spark, sf_dir, "orders")
    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"]
    aggs = []
    for c in cols:
        aggs += [
            (F.count(F.lit(1)) - F.count(c)).alias(f"{c}__null"),
            F.count_distinct(F.col(c)).alias(f"{c}__distinct"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    one = o.agg(*aggs)
    profiles = F.array(
        *[
            F.struct(
                F.lit(c).alias("col"),
                F.col(f"{c}__null").alias("n_null"),
                F.col(f"{c}__distinct").alias("n_distinct"),
                F.col(f"{c}__min").alias("min_str"),
                F.col(f"{c}__max").alias("max_str"),
            )
            for c in cols
        ]
    )
    return (
        one.select(F.explode(profiles).alias("p")).select("p.*").orderBy("col")
    )


@query(
    "events_mad_outliers",
    oracle="""
    WITH med AS (
      SELECT event_type, MEDIAN(value) AS med_value
      FROM events GROUP BY event_type
    ),
    dev AS (
      SELECT e.event_id, e.event_type, e.value,
             ABS(e.value - m.med_value) AS abs_dev
      FROM events e JOIN med m USING (event_type)
    ),
    mad AS (
      SELECT event_type, MEDIAN(abs_dev) AS mad_value
      FROM dev GROUP BY event_type
    )
    SELECT d.event_id, d.event_type, d.value
    FROM dev d JOIN mad m USING (event_type)
    WHERE d.abs_dev > 8.0 * m.mad_value
    """,
)
def events_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection: |value - median| > 8 * MAD per event type
    — the median-absolute-deviation rule that, unlike the z-score variant
    (events_zscore_outliers), is not itself dragged by the outliers it
    hunts.

    Medians are exact interpolated percentiles (sort-then-pick, NO float
    summation — order-independent, so bit-identical across engines and
    partitionings, same argument as the pandas UDAF median). Both the
    per-type medians and MADs are |types|-row tables that broadcast back
    onto the scan; the events table is read twice (median needs a full
    pass before deviations exist — the two-pass structure is inherent).
    At 100 TB pass one degrades gracefully to approx_percentile(0.5)
    with documented error, same plan shape.
    """
    e = table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    med = e.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med_value")
    )
    dev = e.join(F.broadcast(med), "event_type").withColumn(
        "abs_dev", F.abs(F.col("value") - F.col("med_value"))
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(abs_dev, 0.5)").alias("mad_value")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .filter(F.col("abs_dev") > 8.0 * F.col("mad_value"))
        .select("event_id", "event_type", "value")
    )
