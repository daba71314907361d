"""Data-quality audit operators.

The reference enforces quality imperatively: required-column contract checks
(`scripts/02b_make_stac_all.R:112-123`), duplicate-key aborts (`02b:128-131`),
and an assumption-validation split that quarantines bad rows instead of
failing the run (`scripts/00b_extract_metadata_all.R:105-141,163-177`).
These operators generalize that into declarative, table-wide audits a
training-data pipeline runs before every ingest: referential-integrity
orphan counts and an expectation suite (null / range / set-membership
rules), each emitting one row per rule so the report is itself a table.

Scale notes: every rule is a predicate aggregated with count_if-style
conditional sums — one scan per table, no shuffle beyond a 1-row partial
aggregate per rule. Orphan checks are LEFT ANTI joins; the dimension sides
(customer, part, orders keys) broadcast when small, and at 100 TB the
orders-side check degrades gracefully to a shuffled join that AQE can
re-plan. Nothing here collects to the driver.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from wri_data_processing_spark.catalog import table
from wri_data_processing_spark.registry import query


def _orphan_count(fact: DataFrame, key: str, dim: DataFrame, dim_key: str,
                  check: str) -> DataFrame:
    """One referential check: rows of `fact` whose `key` has no match in
    `dim` (NULL keys excluded — nullability is a separate expectation)."""
    missing = (
        fact.filter(F.col(key).isNotNull())
        .join(dim.select(F.col(dim_key).alias(key)), key, "left_anti")
    )
    return missing.agg(F.count(F.lit(1)).cast("long").alias("orphans")).select(
        F.lit(check).alias("check_name"), "orphans"
    )


@query(
    "dq_referential_orphans",
    oracle="""
    SELECT 'lineitem.orderkey->orders' AS check_name,
           (SELECT COUNT(*) FROM lineitem l WHERE l.l_orderkey IS NOT NULL
              AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
           AS orphans
    UNION ALL
    SELECT 'lineitem.partkey->part',
           (SELECT COUNT(*) FROM lineitem l WHERE l.l_partkey IS NOT NULL
              AND NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey))
    UNION ALL
    SELECT 'orders.custkey->customer',
           (SELECT COUNT(*) FROM orders o WHERE o.o_custkey IS NOT NULL
              AND NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
    UNION ALL
    SELECT 'customer.nationkey->nation',
           (SELECT COUNT(*) FROM customer c WHERE c.c_nationkey IS NOT NULL
              AND NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey))
    """,
)
def dq_referential_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Foreign-key orphan audit across the star schema (4 edges).

    Spark plan: four LEFT ANTI joins, each reduced to a single count row,
    unioned. The anti join's build side is the dimension's key column only
    (column pruning), so each check broadcasts at any realistic dimension
    size; the driver never sees per-row data.
    """
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    part = table(spark, sf_dir, "part")
    nation = table(spark, sf_dir, "nation")
    checks = [
        _orphan_count(li, "l_orderkey", orders, "o_orderkey", "lineitem.orderkey->orders"),
        _orphan_count(li, "l_partkey", part, "p_partkey", "lineitem.partkey->part"),
        _orphan_count(orders, "o_custkey", cust, "c_custkey", "orders.custkey->customer"),
        _orphan_count(cust, "c_nationkey", nation, "n_nationkey", "customer.nationkey->nation"),
    ]
    return reduce(DataFrame.unionByName, checks)


@query(
    "dq_expectations",
    oracle="""
    SELECT 'lineitem.quantity_in_1_50' AS rule,
           COUNT(*) AS rows_checked,
           COUNT(*) FILTER (WHERE l_quantity IS NULL
                               OR l_quantity < 1 OR l_quantity > 50) AS violations
    FROM lineitem
    UNION ALL
    SELECT 'lineitem.discount_in_0_0.1', COUNT(*),
           COUNT(*) FILTER (WHERE l_discount IS NULL
                               OR l_discount < 0 OR l_discount > 0.1)
    FROM lineitem
    UNION ALL
    SELECT 'lineitem.returnflag_in_set', COUNT(*),
           COUNT(*) FILTER (WHERE l_returnflag NOT IN ('A', 'N', 'R')
                               OR l_returnflag IS NULL)
    FROM lineitem
    UNION ALL
    SELECT 'lineitem.tax_in_0_0.08', COUNT(*),
           COUNT(*) FILTER (WHERE l_tax IS NULL OR l_tax < 0 OR l_tax > 0.08)
    FROM lineitem
    UNION ALL
    SELECT 'orders.totalprice_positive', COUNT(*),
           COUNT(*) FILTER (WHERE o_totalprice IS NULL OR o_totalprice <= 0)
    FROM orders
    UNION ALL
    SELECT 'customer.name_not_null', COUNT(*),
           COUNT(*) FILTER (WHERE c_name IS NULL OR TRIM(c_name) = '')
    FROM customer
    """,
)
def dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expectation suite: null / range / set-membership / cross-column rules,
    one result row per rule with (rows_checked, violations).

    Generalizes the reference's per-row `passes_assumptions` +
    `assumption_error` validation (`00b_extract_metadata_all.R:105-141`)
    into whole-table conditional counts. Each source table is scanned ONCE
    for all its rules (conditional sums share the scan), then 1-row results
    union — the cheapest possible audit shape at 100 TB.
    """

    def audit(df: DataFrame, rules: list[tuple[str, F.Column]]) -> DataFrame:
        aggs = [F.count(F.lit(1)).cast("long").alias("rows_checked")] + [
            F.sum(cond.cast("long")).cast("long").alias(f"v{i}")
            for i, (_, cond) in enumerate(rules)
        ]
        one = df.agg(*aggs)
        # Explode the single aggregated row into one row per rule — NOT a
        # union of per-rule selects, which would replay the aggregate (and
        # its scan) once per rule.
        pairs = F.array(
            *[
                F.struct(
                    F.lit(name).alias("rule"),
                    F.col("rows_checked").alias("rows_checked"),
                    F.col(f"v{i}").alias("violations"),
                )
                for i, (name, _) in enumerate(rules)
            ]
        )
        return one.select(F.explode(pairs).alias("r")).select(
            "r.rule", "r.rows_checked", "r.violations"
        )

    li = table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    d = F.col("l_discount")
    li_rules = [
        ("lineitem.quantity_in_1_50", q.isNull() | (q < 1) | (q > 50)),
        ("lineitem.discount_in_0_0.1", d.isNull() | (d < 0) | (d > 0.1)),
        (
            "lineitem.returnflag_in_set",
            ~F.col("l_returnflag").isin("A", "N", "R")
            | F.col("l_returnflag").isNull(),
        ),
        (
            "lineitem.tax_in_0_0.08",
            F.col("l_tax").isNull() | (F.col("l_tax") < 0) | (F.col("l_tax") > 0.08),
        ),
    ]
    orders = table(spark, sf_dir, "orders")
    o_rules = [
        (
            "orders.totalprice_positive",
            F.col("o_totalprice").isNull() | (F.col("o_totalprice") <= 0),
        )
    ]
    cust = table(spark, sf_dir, "customer")
    c_rules = [
        (
            "customer.name_not_null",
            F.col("c_name").isNull() | (F.trim(F.col("c_name")) == ""),
        )
    ]
    return (
        audit(li, li_rules)
        .unionByName(audit(orders, o_rules))
        .unionByName(audit(cust, c_rules))
    )


# The production day-over-day rule's SQL body, shared by the monitor's
# oracle and its positive control's (one source of truth for the
# arithmetic — the control's oracle differs ONLY in which daily frame
# feeds it). Expects a CTE named `daily` with (event_type, d, n).
_DOD_RULE_SQL = """
    delta AS (
      SELECT event_type, d, n,
             LAG(n) OVER (PARTITION BY event_type ORDER BY d) AS prev_n
      FROM daily)
    SELECT event_type, CAST(d AS VARCHAR) AS day, n, prev_n,
           CAST(n - prev_n AS DOUBLE) / CAST(prev_n AS DOUBLE) AS pct_change,
           ABS(CAST(n - prev_n AS DOUBLE) / CAST(prev_n AS DOUBLE)) > 0.5
             AS anomaly
    FROM delta WHERE prev_n IS NOT NULL
"""


def _daily_counts(e: DataFrame) -> DataFrame:
    """Per-(event_type, day) exact row counts — the monitor's input frame."""
    return e.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )


def _dod_rule(daily: DataFrame) -> DataFrame:
    """THE day-over-day volume rule — shared verbatim by the production
    monitor (dq_day_over_day_anomaly) and its positive control
    (dq_volume_positive_control), so the control exercises the exact
    expression tree that pages, not a reimplementation. Input: one row per
    (event_type, d) with exact BIGINT count n; output: the per-transition
    change ratio and the >50% alert boolean."""
    w = Window.partitionBy("event_type").orderBy("d")
    delta = daily.withColumn("prev_n", F.lag("n").over(w)).filter(
        F.col("prev_n").isNotNull()
    )
    pct = (F.col("n") - F.col("prev_n")).cast("double") / F.col("prev_n").cast(
        "double"
    )
    return delta.select(
        "event_type",
        F.col("d").cast("string").alias("day"),
        "n",
        "prev_n",
        pct.alias("pct_change"),
        (F.abs(pct) > 0.5).alias("anomaly"),
    )


@query(
    "dq_day_over_day_anomaly",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2),
    {_DOD_RULE_SQL}
    """,
)
def dq_day_over_day_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-anomaly monitor: day-over-day count swings per event type.

    The standard pipeline health check — ingestion volume that halves or
    doubles overnight is the first symptom of an upstream break. The
    change ratio is one division of two exact daily counts; the 50%
    alert threshold compares that double against a literal, so the
    boolean is engine-stable. The window partitions by event_type over
    |days| rows per type — everything reduces before anything sorts.

    Liveness: the synthetic corpus's daily counts concentrate as volume
    grows, so the alert branch goes genuinely dead at sf0.1 (SCALE.md
    "r14 cross-SF degeneracy"); the True branch is pinned at every SF by
    dq_volume_positive_control, which drives this SAME ``_dod_rule``
    with an injected 3x volume swing.
    """
    e = table(spark, sf_dir, "events")
    return _dod_rule(_daily_counts(e))


@query(
    "dq_volume_positive_control",
    oracle=f"""
    WITH real_daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2),
    tot AS (
      SELECT event_type, CAST(SUM(n) AS BIGINT) AS t
      FROM real_daily GROUP BY 1),
    daily AS (
      SELECT r.event_type, r.d,
             CAST(t.t * (1 + 2 * (ROW_NUMBER() OVER (
               PARTITION BY r.event_type ORDER BY r.d) % 2)) AS BIGINT) AS n
      FROM real_daily r JOIN tot t ON r.event_type = t.event_type),
    {_DOD_RULE_SQL}
    """,
)
def dq_volume_positive_control(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positive control for the volume monitor — the pager test
    (VERDICT r14 item 1; the drift_positive_control template): push a
    KNOWN volume break through the exact ``_dod_rule`` expression tree
    dq_day_over_day_anomaly pages on and require ``anomaly = TRUE`` on
    every transition. The r14 cross-SF sweep found the production
    monitor's True branch goes dead at sf0.1 — correctly (the synthetic
    daily counts concentrate as volume grows), but that meant nothing at
    the bench SF proved the alert still fires.

    The injected series keeps the REAL day axis per event_type but
    replaces each day's count with T (the type's total, a constant) on
    even day-ranks and 3*T on odd day-ranks: every transition is exactly
    a 3x surge (pct = +2.0) or a collapse to a third (pct = -2/3), both
    strictly past the 50% gate at EVERY scale factor by construction —
    the swing is scale-free, unlike a count threshold. Deliberately NOT
    a pure halving: a 2x drop lands exactly ON the boundary
    (pct = -0.5, ABS(...) > 0.5 false) — the strict inequality is part
    of the production rule, so the control injects a swing with margin.

    Exactness: n = T or 3*T is an exact BIGINT product; pct_change is
    ONE int64-difference/int64 double division — IEEE-identical across
    engines (no rounding needed, same as the production monitor).

    Plan at 100 TB: the same one-reduce daily rollup as the monitor, a
    |types|-row total broadcast back, and the rule's per-type window
    over |days| rows — everything reduces before anything sorts; the
    injection adds zero data-sized stages.
    """
    e = table(spark, sf_dir, "events")
    real_daily = _daily_counts(e)
    tot = real_daily.groupBy("event_type").agg(
        F.sum("n").cast("long").alias("t")
    )
    rn = F.row_number().over(Window.partitionBy("event_type").orderBy("d"))
    ctl = (
        real_daily.join(F.broadcast(tot), "event_type")
        .select(
            "event_type",
            "d",
            (F.col("t") * (1 + 2 * (rn % 2))).cast("long").alias("n"),
        )
    )
    return _dod_rule(ctl)


@query(
    "dq_duplicate_payments",
    oracle="""
    WITH p AS (
      SELECT o_custkey,
             CAST(floor(o_totalprice / 1000.0) AS BIGINT) AS band,
             o_totalprice, o_orderkey, o_orderdate
      FROM orders),
    d AS (
      SELECT a.o_custkey AS custkey, a.band,
             a.o_orderkey AS k1, b.o_orderkey AS k2,
             a.o_totalprice AS amount1, b.o_totalprice AS amount2,
             CAST(abs(date_diff('day', a.o_orderdate, b.o_orderdate))
                  AS BIGINT) AS gap_days
      FROM p a JOIN p b
        ON a.o_custkey = b.o_custkey AND a.band = b.band
       AND a.o_orderkey < b.o_orderkey
      WHERE abs(date_diff('day', a.o_orderdate, b.o_orderdate)) <= 365)
    SELECT custkey, band, k1, k2, amount1, amount2, gap_days
    FROM d ORDER BY custkey, band, k1, k2 LIMIT 50
    """,
)
def dq_duplicate_payments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate-payment audit — the classic payables sweep: two
    orders from the SAME customer in the SAME $1000 price band within a
    year are double-submit/retry/fraud candidates a reviewer should eye.
    (Exact-amount equality finds nothing on realistic data — amounts are
    near-unique — so the band IS the operator: block on a coarse key,
    review the block, the same blocking idea fuzzy_match_levenshtein
    uses for names.) Emits the first 50 suspect pairs with both amounts
    for review.

    Plan: pair generation is an EQUI self-join on (custkey, band) — the
    band keeps blocks tiny (a customer rarely repeats a price band), so
    join output stays near-linear at 100 TB; the 365-day window and the
    k1 < k2 de-mirror ride as post-join predicates. floor(price/1000) is
    one exact IEEE division + floor, identical in both engines; gaps are
    integer day diffs; the 50-row cut is a TakeOrdered on the full key.
    """
    o = table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice", "o_orderkey", "o_orderdate"
    )
    band = F.floor(F.col("o_totalprice") / 1000.0).cast("long")
    a = o.select(
        F.col("o_custkey").alias("custkey"),
        band.alias("band"),
        F.col("o_orderkey").alias("k1"),
        F.col("o_totalprice").alias("amount1"),
        F.col("o_orderdate").alias("d1"),
    )
    b = o.select(
        F.col("o_custkey").alias("custkey"),
        band.alias("band"),
        F.col("o_orderkey").alias("k2"),
        F.col("o_totalprice").alias("amount2"),
        F.col("o_orderdate").alias("d2"),
    )
    return (
        a.join(b, ["custkey", "band"])
        .filter(
            (F.col("k1") < F.col("k2")) & (F.abs(F.datediff("d2", "d1")) <= 365)
        )
        .select(
            "custkey",
            "band",
            "k1",
            "k2",
            "amount1",
            "amount2",
            F.abs(F.datediff("d2", "d1")).cast("long").alias("gap_days"),
        )
        .orderBy("custkey", "band", "k1", "k2")
        .limit(50)
    )
