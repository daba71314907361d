"""Aggregations (SURVEY.md §2.4).

Reference parity:
- agg_count_by_group     : status accounting, ``01b_make_cog_all.R:117-123``.
- agg_conditional_count  : hosted/local counts, ``02b_make_stac_all.R:161-162``.
- agg_distinct_sorted    : collection summaries, ``02b:299-304``.
- agg_duplicate_keys     : dup-key abort, ``02b:128-131``.
- agg_first_value        : first-row extent, ``02b:134-139`` (min/max variant,
                           which SURVEY A6 notes is the principled form).
- agg_minmax_stats       : COG band statistics (min/max/mean/stddev),
                           ``meta.json:92-93,145-148``.
- agg_cube_rollup / agg_approx_distinct: mandated capability (A8/A9).

Scale notes: all of these are partial+final hash aggregations — Catalyst
plans the map-side combine automatically, so the shuffle carries only
per-group partials. ``approx_count_distinct`` (HLL) replaces exact distinct
counting at 100 TB; its estimate is engine-specific, so its oracle checks
the exact counts plus an accuracy-bound boolean instead of the raw HLL value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from wri_data_processing_spark.catalog import table
from wri_data_processing_spark.registry import query


@query(
    "agg_count_by_group",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_count_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag", "l_linestatus").agg(F.count(F.lit(1)).alias("n"))


@query(
    "agg_conditional_count",
    oracle="""
    SELECT
      COUNT(*) FILTER (WHERE o_totalprice > 100000) AS n_big,
      COUNT(*) FILTER (WHERE o_totalprice <= 100000) AS n_small,
      COUNT(*) AS n_total
    FROM orders
    """,
)
def agg_conditional_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    big = F.col("o_totalprice") > 100000
    return o.agg(
        F.count_if(big).alias("n_big"),
        F.count_if(~big).alias("n_small"),
        F.count(F.lit(1)).alias("n_total"),
    )


@query(
    "agg_distinct_sorted",
    oracle="SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment",
)
def agg_distinct_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    return c.select("c_mktsegment").distinct().orderBy("c_mktsegment")


@query(
    "agg_duplicate_keys",
    oracle="""
    SELECT o_custkey, COUNT(*) AS n_orders
    FROM orders GROUP BY o_custkey HAVING COUNT(*) > 1
    """,
)
def agg_duplicate_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") > 1)
    )


@query(
    "agg_first_value",
    oracle="""
    SELECT o_custkey,
           strftime(MIN(o_orderdate), '%Y-%m-%d %H:%M:%S') AS first_orderdate,
           strftime(MAX(o_orderdate), '%Y-%m-%d %H:%M:%S') AS last_orderdate
    FROM orders GROUP BY o_custkey
    """,
)
def agg_first_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(
        F.date_format(F.min("o_orderdate"), "yyyy-MM-dd HH:mm:ss").alias("first_orderdate"),
        F.date_format(F.max("o_orderdate"), "yyyy-MM-dd HH:mm:ss").alias("last_orderdate"),
    )


@query(
    "agg_minmax_stats",
    oracle="""
    SELECT
      MIN(l_extendedprice) AS min_price,
      MAX(l_extendedprice) AS max_price,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS mean_price,
      floor(sqrt((COUNT(*) * CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(28,8))) AS DOUBLE)
            - CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
              * CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE))
           / (COUNT(*) * (COUNT(*) - 1))) * 1000.0 + 0.5) / 1000.0 AS stddev_price,
      COUNT(*) AS n
    FROM lineitem
    """,
)
def agg_minmax_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band statistics (A7). stddev is computed from EXACT decimal sums via
    the textbook sqrt((n*Sxx - Sx^2)/(n(n-1))) identity so both engines see
    bit-identical doubles (streaming stddev accumulation is order-dependent).
    """
    l = table(spark, sf_dir, "lineitem")
    dec = F.col("l_extendedprice").cast("decimal(18,6)")
    sq = (F.col("l_extendedprice") * F.col("l_extendedprice")).cast("decimal(28,8)")
    sx = F.sum(dec).cast("double")
    sxx = F.sum(sq).cast("double")
    n = F.count(F.lit(1))
    return l.agg(
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        (sx / n).alias("mean_price"),
        # floor-quantize at 1e-3: the variance identity amplifies the one
        # place the engines can differ by an ulp (int128 decimal -> double
        # cast of the squares sum); floor of identical-to-1e-11 doubles is
        # deterministic, unlike round() which has midpoint-semantics drift.
        (F.floor(F.sqrt((n * sxx - sx * sx) / (n * (n - 1))) * 1000.0 + 0.5) / 1000.0).alias(
            "stddev_price"
        ),
        n.alias("n"),
    )


@query(
    "agg_cube_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_cube_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    return l.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(18,6)")).cast("double").alias("sum_qty"),
    )


@query(
    "agg_approx_distinct",
    oracle="""
    SELECT COUNT(DISTINCT l_partkey) AS exact_parts,
           COUNT(DISTINCT l_orderkey) AS exact_orders,
           TRUE AS parts_within_3rsd,
           TRUE AS orders_within_3rsd
    FROM lineitem
    """,
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct estimate — the 100 TB substitute for COUNT(DISTINCT).

    rsd=0.01 keeps the sketch ~thousands of bytes per group; the shuffle
    carries sketches, not values.

    Oracle strategy: the HLL value itself is engine-specific, so the checked
    columns are the EXACT counts plus booleans asserting the estimate lands
    within 3x the requested relative standard deviation — the oracle pins
    those booleans to TRUE. This turns a "no oracle possible" op into a
    checked accuracy contract.
    """
    l = table(spark, sf_dir, "lineitem")
    within = lambda approx, exact: (  # noqa: E731
        F.abs(F.col(approx) - F.col(exact)) <= 3 * 0.01 * F.col(exact)
    )
    return (
        l.agg(
            F.count_distinct("l_partkey").alias("exact_parts"),
            F.count_distinct("l_orderkey").alias("exact_orders"),
            F.approx_count_distinct("l_partkey", rsd=0.01).alias("approx_parts"),
            F.approx_count_distinct("l_orderkey", rsd=0.01).alias("approx_orders"),
        )
        .select(
            "exact_parts",
            "exact_orders",
            within("approx_parts", "exact_parts").alias("parts_within_3rsd"),
            within("approx_orders", "exact_orders").alias("orders_within_3rsd"),
        )
    )


@query(
    "agg_pivot",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN l_returnflag = 'A'
                         THEN CAST(l_quantity AS DECIMAL(18,6)) END) AS DOUBLE) AS qty_A,
           CAST(SUM(CASE WHEN l_returnflag = 'N'
                         THEN CAST(l_quantity AS DECIMAL(18,6)) END) AS DOUBLE) AS qty_N,
           CAST(SUM(CASE WHEN l_returnflag = 'R'
                         THEN CAST(l_quantity AS DECIMAL(18,6)) END) AS DOUBLE) AS qty_R
    FROM lineitem GROUP BY l_linestatus
    """,
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide aggregation): one column per l_returnflag value.

    Values are ENUMERATED (not discovered) — at 100 TB an unenumerated pivot
    first runs a distinct scan over the pivot column; passing the value list
    keeps it a single partial+final aggregation.
    """
    l = table(spark, sf_dir, "lineitem")
    pivoted = (
        l.groupBy("l_linestatus")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,6)")).cast("double"))
    )
    return pivoted.select(
        "l_linestatus",
        F.col("A").alias("qty_A"),
        F.col("N").alias("qty_N"),
        F.col("R").alias("qty_R"),
    )


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           GROUPING(l_returnflag) AS g_rf, GROUPING(l_linestatus) AS g_ls
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (A8) — the grouping-id columns disambiguate a
    genuine NULL group key from a superaggregate row, which matters once
    nullable group columns appear."""
    l = table(spark, sf_dir, "lineitem")
    l.createOrReplaceTempView("lineitem_gs")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
               CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
               CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@query(
    "agg_percentile",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.5) AS median_qty,
           quantile_cont(l_quantity, 0.9) AS p90_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (SQL PERCENTILE_CONT semantics on both
    engines). At 100 TB swap to approx_percentile — the exact form buffers
    per-group values; the sketch form shuffles fixed-size summaries."""
    l = table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.5)").alias("median_qty"),
        F.expr("percentile(l_quantity, 0.9)").alias("p90_qty"),
    )


@query(
    "agg_approx_percentile",
    oracle="""
    SELECT quantile_cont(l_extendedprice, 0.5) AS exact_p50,
           quantile_cont(l_extendedprice, 0.95) AS exact_p95,
           TRUE AS p50_within_1pct,
           TRUE AS p95_within_1pct
    FROM lineitem
    """,
)
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KLL/GK-sketch percentile — the 100 TB substitute for exact
    percentiles (exact buffers every group value; the sketch shuffles a
    fixed-size summary). The sketch estimate is engine-specific, so —
    like agg_approx_distinct's HLL oracle — the check emits the exact
    interpolated percentiles plus booleans asserting the approx estimate
    lands within 1% relative error; the oracle states the booleans must
    be TRUE.
    """
    l = table(spark, sf_dir, "lineitem")
    row = l.agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact_p50"),
        F.expr("percentile(l_extendedprice, 0.95)").alias("exact_p95"),
        F.expr("approx_percentile(l_extendedprice, 0.5, 10000)").alias("a50"),
        F.expr("approx_percentile(l_extendedprice, 0.95, 10000)").alias("a95"),
    )
    ok = lambda a, e: (F.abs(F.col(a) - F.col(e)) / F.col(e)) <= 0.01  # noqa: E731
    return row.select(
        "exact_p50",
        "exact_p95",
        ok("a50", "exact_p50").alias("p50_within_1pct"),
        ok("a95", "exact_p95").alias("p95_within_1pct"),
    )


@query(
    "agg_mode",
    oracle="""
    SELECT o_orderpriority, mode_status, n FROM (
      SELECT o_orderpriority, o_orderstatus AS mode_status,
             CAST(COUNT(*) AS BIGINT) AS n,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY COUNT(*) DESC, o_orderstatus) AS rn
      FROM orders
      GROUP BY o_orderpriority, o_orderstatus
    ) WHERE rn = 1
    """,
)
def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped mode (argmax by frequency): the most common order status per
    priority, deterministic tie-break on the value itself.

    Mode has no distributive aggregate form, so it is stated as what it is:
    a count-by-(group, value) aggregate — fully partial-aggregatable, the
    heavy reduction — followed by a window top-1 over the tiny distinct
    value set. The same two-phase shape computes any argmax-by-measure at
    100 TB; the window input is |groups| x |distinct values|, not |rows|.
    """
    o = table(spark, sf_dir, "orders")
    counts = o.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    w = Window.partitionBy("o_orderpriority").orderBy(F.col("n").desc(), "o_orderstatus")
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_orderpriority",
            F.col("o_orderstatus").alias("mode_status"),
            "n",
        )
    )


@query(
    "agg_pareto_share",
    oracle="""
    WITH rev AS (
      SELECT c_mktsegment, o_custkey,
             SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS rev_dec
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment, o_custkey
    )
    SELECT c_mktsegment, o_custkey,
           CAST(CAST(rev_dec * 1000000 AS BIGINT) AS DOUBLE) / 1000000.0
             AS revenue,
           ROUND(CAST(SUM(rev_dec) OVER (PARTITION BY c_mktsegment
                                         ORDER BY rev_dec DESC, o_custkey
                                         ROWS UNBOUNDED PRECEDING) AS DOUBLE)
                 / CAST(SUM(rev_dec) OVER (PARTITION BY c_mktsegment) AS DOUBLE),
                 6) AS cum_share,
           CAST(ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                   ORDER BY rev_dec DESC, o_custkey) AS BIGINT) AS rnk
    FROM rev
    """,
)
def agg_pareto_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto / concentration analysis: customers ranked by revenue within
    segment, with cumulative revenue share (the 80/20 curve).

    Running and total sums stay in exact DECIMAL inside the window
    (order-independent), converting to double only for the final ratio.
    r14 cast-audit closes: per-customer revenue emits through the
    micros-int64 BRIDGE — (rev*1e6)::BIGINT::DOUBLE/1e6 — because a
    direct DECIMAL->double cast is engine-divergent by one ULP once the
    scaled value passes 2^53 (the spearman mechanism; bridge is exact and
    bit-identical to $9.2e12/customer, int64->double casts agree per
    IEEE at ANY magnitude); cum_share's operands are segment-scale sums
    whose casts CAN diverge at 100 TB, so the O(1) ratio closes with the
    house ROUND-6. One shuffle on segment; the two window specs and the
    rank share a single sort. This is the query that decides "what
    fraction of the corpus do the top-k sources contribute" in a
    training-data audit — same shape, swap tables.
    """
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    rev = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment", "o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,6)")).alias("rev_dec"))
    )
    w_ord = Window.partitionBy("c_mktsegment").orderBy(F.col("rev_dec").desc(), "o_custkey")
    w_run = w_ord.rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy("c_mktsegment")
    return rev.select(
        "c_mktsegment",
        "o_custkey",
        ((F.col("rev_dec") * 1000000).cast("long").cast("double") / F.lit(1000000.0))
        .alias("revenue"),
        F.round(
            F.sum("rev_dec").over(w_run).cast("double")
            / F.sum("rev_dec").over(w_all).cast("double"),
            6,
        ).alias("cum_share"),
        F.row_number().over(w_ord).cast("long").alias("rnk"),
    )


@query("agg_freq_items")  # rows-only: approximate algorithm, superset guarantee
def agg_freq_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate heavy hitters: event types exceeding ~10% frequency via
    DataFrame.stat.freqItems (Karp-Papadimitriou-Shenker streaming
    counters) — the sketch-side answer to "what dominates this column"
    that never materializes a full group-by.

    KPS guarantees a SUPERSET: every value above the support threshold is
    returned (false positives possible, false negatives not) — the
    semantic test asserts exactly that against exact counts. One pass, no
    shuffle (per-partition counters merge at the driver as a single tiny
    array row): the 100 TB profile is a scan at full parallelism plus a
    KB-sized merge, which is why this runs where an exact top-k groupBy
    would be a full shuffle.
    """
    e = table(spark, sf_dir, "events").select("event_type")
    # Sorted comma-joined string, not array<string>: every registered query
    # keeps a flat scalar schema (the driver canonicalizer can't sort list
    # cells — tests/test_driver_safety.py pins the invariant repo-wide).
    return e.stat.freqItems(["event_type"], support=0.1).select(
        F.concat_ws(",", F.array_sort(F.col("event_type_freqItems"))).alias("heavy_hitters")
    )


@query(
    "orders_yoy_growth",
    oracle="""
    WITH yearly AS (
      SELECT CAST(date_part('year', o_orderdate) AS BIGINT) AS yr,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) * 1000000
                  AS BIGINT) AS rev_u,
             CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM orders GROUP BY 1
    )
    SELECT yr,
           CAST(rev_u AS DOUBLE) / 1000000.0 AS revenue,
           n_orders,
           CAST(rev_u AS DOUBLE)
             / CAST(LAG(rev_u) OVER (ORDER BY yr) AS DOUBLE) - 1.0
             AS yoy_growth
    FROM yearly
    """,
)
def orders_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year revenue growth: yearly exact-decimal totals with a
    lag ratio — the canonical reporting query for any time-grain trend.

    r14 cast-audit close: yearly totals narrow to exact int64 MICROS
    before any double appears — a direct DECIMAL->double cast diverges by
    one ULP across engines above 2^53 scaled (yearly corpus revenue
    crosses $9e9 long before 100 TB), while int64->double casts agree per
    IEEE at any magnitude, so both the emitted revenue (micros/1e6) and
    the growth ratio (micros/micros — the 1e6 cancels) are bit-identical
    on both engines as long as a year stays under $9.2e12 (the BIGINT
    micros ceiling). Overflow past it (ADVICE r14, sharpened r15): DuckDB
    raises, and Spark raises too UNDER ITS DEFAULTS — ANSI mode is on
    since Spark 4.0, and the r15 10x-synth sweep empirically confirmed
    the ARITHMETIC_OVERFLOW raise in this runtime (stats_bartlett). The
    failure is silent (NULL, no error) only in deployments that opt OUT
    via spark.sql.ansi.enabled=false — such legacy-mode runs past that
    magnitude lose the loud guarantee (the same caveat applies to every
    micros-bridge emitter and the Krippendorff S_e BIGINT narrowing). The window runs over |years|
    rows — a single-partition sort
    of a handful of rows is fine precisely because the heavy reduction
    already happened; this is the shape where a global window is NOT a
    scale bug.
    """
    o = table(spark, sf_dir, "orders")
    yearly = o.groupBy(F.year("o_orderdate").cast("long").alias("yr")).agg(
        (F.sum(F.col("o_totalprice").cast("decimal(18,6)")) * 1000000)
        .cast("long")
        .alias("rev_u"),
        F.count(F.lit(1)).cast("long").alias("n_orders"),
    )
    w = Window.orderBy("yr")
    return yearly.select(
        "yr",
        (F.col("rev_u").cast("double") / F.lit(1000000.0)).alias("revenue"),
        "n_orders",
        (
            F.col("rev_u").cast("double") / F.lag("rev_u").over(w).cast("double")
            - 1.0
        ).alias("yoy_growth"),
    )


@query(
    "agg_argmax",
    oracle="""
    SELECT o_orderpriority, top_orderkey, top_price FROM (
      SELECT o_orderpriority,
             o_orderkey AS top_orderkey,
             o_totalprice AS top_price,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn
      FROM orders) WHERE rn = 1
    """,
)
def agg_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argmax per group via max_by over a composite ordering struct.

    ``max_by(key, struct(value, key))`` makes the comparator injective, so
    ties on value resolve deterministically (highest key wins) — plain
    max_by's tie winner is engine-dependent. This stays one hash aggregate
    (partial+final, shuffle carries one struct per group); the window
    formulation the oracle uses would shuffle every row. DuckDB's max_by
    rejects struct comparators, hence the ROW_NUMBER oracle.
    """
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.expr("max_by(o_orderkey, struct(o_totalprice, o_orderkey))").alias(
            "top_orderkey"
        ),
        F.max("o_totalprice").alias("top_price"),
    )


@query(
    "agg_string_concat",
    oracle="""
    SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def agg_string_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG): per region, sorted nation CSV.

    Spark has no ordered string_agg aggregate; the deterministic form is
    collect_list -> array_sort -> array_join, all JVM-side. collect_list's
    arrival order is nondeterministic under parallelism, so the sort is
    NOT optional — any LISTAGG without an explicit order is a flaky query.
    The dimension join is broadcast (region is 5 rows).
    """
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("r_name")
        .agg(F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations"))
    )


@query(
    "agg_bitwise_flags",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             bit_or(CASE event_type
                      WHEN 'click' THEN 1 WHEN 'error' THEN 2
                      WHEN 'purchase' THEN 4 WHEN 'signup' THEN 8
                      WHEN 'view' THEN 16 ELSE 0 END) AS profile
      FROM events GROUP BY user_id
    )
    SELECT profile, bit_count(CAST(profile AS BIGINT)) AS n_types,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM per_user GROUP BY profile
    """,
)
def agg_bitwise_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise aggregation: per-user behavior profile as a bitmask.

    Each event type maps to one bit; bit_or folds a user's whole history
    into one int64 (the cheapest possible "which-types-did-X-ever-do"
    representation — a set under union becomes a CPU OR). The outer
    rollup histograms the profiles; popcount recovers the type count
    without re-touching the events. Two hash aggregations, both with
    map-side partials; the second input is one row per user.
    """
    e = table(spark, sf_dir, "events")
    flag = (
        F.when(F.col("event_type") == "click", 1)
        .when(F.col("event_type") == "error", 2)
        .when(F.col("event_type") == "purchase", 4)
        .when(F.col("event_type") == "signup", 8)
        .when(F.col("event_type") == "view", 16)
        .otherwise(0)
    )
    per_user = (
        e.select("user_id", flag.alias("flag"))
        .groupBy("user_id")
        .agg(F.expr("bit_or(flag)").alias("profile"))
    )
    return per_user.groupBy("profile").agg(
        F.bit_count(F.col("profile").cast("long")).alias("n_types"),
        F.count(F.lit(1)).cast("long").alias("n_users"),
    )


@query(
    "agg_multi_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_multi_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple COUNT(DISTINCT ...) over different columns in one pass.

    Catalyst plans this with an Expand operator: each input row is
    replicated once per distinct-aggregate branch with a gid, then a
    two-level aggregation dedups and counts. One query, one shuffle
    (of the expanded rows) — versus three self-joined single-distinct
    queries. At 100 TB the expansion factor (3x here) is the cost to
    watch; approx_count_distinct collapses it back to one HLL pass when
    exactness is negotiable (see agg_approx_distinct).
    """
    l = table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "agg_count_min_sketch",
    oracle="""
    WITH exact AS (
      SELECT l_partkey AS k, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM lineitem GROUP BY 1),
    h AS (
      SELECT k, cnt, 0 AS j,
             ((k % 2147483647) * 99371 + 12345) % 2147483647 % 1024 AS b
      FROM exact
      UNION ALL SELECT k, cnt, 1,
             ((k % 2147483647) * 50923 + 67891) % 2147483647 % 1024
      FROM exact
      UNION ALL SELECT k, cnt, 2,
             ((k % 2147483647) * 76031 + 24683) % 2147483647 % 1024
      FROM exact
      UNION ALL SELECT k, cnt, 3,
             ((k % 2147483647) * 85247 + 13579) % 2147483647 % 1024
      FROM exact),
    cells AS (
      SELECT j, b, CAST(SUM(cnt) AS BIGINT) AS cell FROM h GROUP BY 1, 2),
    top5 AS (SELECT k, cnt FROM exact ORDER BY cnt DESC, k LIMIT 5),
    probe AS (SELECT t.k, t.cnt, h.j, h.b FROM top5 t JOIN h ON h.k = t.k),
    est AS (
      SELECT p.k, p.cnt, MIN(c.cell) AS est_cnt
      FROM probe p JOIN cells c ON p.j = c.j AND p.b = c.b GROUP BY 1, 2)
    SELECT k AS l_partkey, cnt AS exact_cnt, est_cnt, est_cnt - cnt AS overest
    FROM est ORDER BY exact_cnt DESC, l_partkey
    """,
)
def agg_count_min_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch (d=4 rows x w=1024 buckets) over part frequencies,
    audited against truth: the 5 true-heaviest parts with their exact
    count, the sketch's point estimate, and the collision overestimate
    (always >= 0 — CMS never undercounts). The frequency-sketch sibling
    of agg_approx_distinct's HLL: constant memory per executor, and
    MERGE is cell-wise sum — exactly what the (j, bucket) groupBy-sum
    shuffle performs, so map-side partial sketches combine into the
    global sketch with no extra machinery (same story for cross-day or
    streaming sketch unions at 100 TB).

    Exactness: the d hash functions are pinned affine literals
    h_j(k) = ((k mod p) · a_j + b_j) mod p mod w with p = 2^31 − 1 —
    pure int64 arithmetic on both engines ((k mod p) · a_j < ~2e15, no
    overflow for any BIGINT key), so cells, estimates, and the error
    column are all exact integers; there is no float anywhere.

    Scale: ONE aggregate to the distinct-key frame (summing per-key
    counts into buckets is row-for-row identical to per-row increments),
    a 4096-cell sketch, a TakeOrdered top-5, and a broadcast probe join.
    The sketch size is independent of N and of key cardinality — the
    point of carrying a sketch instead of the exact frame.
    """
    P, W = 2147483647, 1024
    A = (99371, 50923, 76031, 85247)
    B = (12345, 67891, 24683, 13579)
    li = table(spark, sf_dir, "lineitem")
    exact = li.groupBy(F.col("l_partkey").alias("k")).agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    # Feeds the sketch cells, the top-5 probe, and the probe's hash
    # re-expansion — three distinct subplans, so materialize once.
    exact = exact.localCheckpoint()

    def hashes():
        return F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).cast("int").alias("j"),
                        (((F.col("k") % P) * A[j] + B[j]) % P % W).alias("b"),
                    )
                    for j in range(4)
                ]
            )
        ).alias("h")

    h = exact.select("k", "cnt", hashes()).select(
        "k", "cnt", F.col("h.j").alias("j"), F.col("h.b").alias("b")
    )
    cells = h.groupBy("j", "b").agg(F.sum("cnt").cast("long").alias("cell"))
    top5 = exact.orderBy(F.col("cnt").desc(), "k").limit(5)
    probe = top5.select("k", "cnt", hashes()).select(
        "k", "cnt", F.col("h.j").alias("j"), F.col("h.b").alias("b")
    )
    est = (
        probe.join(cells, ["j", "b"])
        .groupBy("k", "cnt")
        .agg(F.min("cell").alias("est_cnt"))
    )
    return est.select(
        F.col("k").alias("l_partkey"),
        F.col("cnt").alias("exact_cnt"),
        "est_cnt",
        (F.col("est_cnt") - F.col("cnt")).alias("overest"),
    ).orderBy(F.col("exact_cnt").desc(), "l_partkey")
