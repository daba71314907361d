"""Distributed exact global ranking: NTILE / row_number without the
single-partition global window.

``Window.orderBy(...)`` with no partitionBy collapses the whole frame into
ONE task — correct answers, dead at 100 TB. This module computes the exact
same assignment with a parallel plan, the classic two-phase distributed
rank:

1. **Bucket by value.** Pull ~``nbuckets`` approximate quantile cutpoints of
   the leading sort key (one cheap pass, driver gets ≤ nbuckets doubles) and
   assign each row a bucket with a literal CASE chain. Bucketing on the
   leading key alone is order-consistent: ties stay in one bucket, so every
   row of bucket *i* precedes every row of bucket *i+1* under the full sort
   order. Buckets need not be balanced — they only provide parallelism.
2. **Rank within buckets in parallel.** ``row_number() OVER (PARTITION BY
   bucket ORDER BY <keys>)`` — an exchange on the bucket id, nbuckets-wide.
3. **Offset by bucket prefix counts.** ``groupBy(bucket).count()`` collects
   ≤ nbuckets rows to the driver (bounded, like the catalog finalize),
   prefix-sums them, and adds the offset back via a literal CASE — no join,
   no second shuffle. Global rank = local rank + offset.
4. **NTILE arithmetic.** With N total rows and k tiles, NTILE assigns the
   first ``N % k`` tiles ``N//k + 1`` rows and the rest ``N//k`` — a pure
   expression over the global rank.

Determinism: callers must pass a tie-broken (total) ordering, same as they
would for a deterministic NTILE. The input frame is executed for the one
small statistics job plus the main query; with a total order and
deterministic lineage every execution agrees.

Reference anchor: the reference has no window functions at all (SURVEY §2.5)
— this is engine-surface work, designed Spark-first.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_BUCKET = "__gr_bucket"
_LOCAL_RANK = "__gr_local_rank"


def _bucket_expr(key_as_double: Column, cuts: list[float]) -> Column:
    """CASE chain assigning a bucket id from sorted unique cut values."""
    expr = F.lit(0)
    for i, c in enumerate(cuts):
        expr = F.when(key_as_double >= F.lit(c), F.lit(i + 1)).otherwise(expr)
    return expr


def _ranked_with_total(
    df: DataFrame,
    order_cols: list[str],
    out_col: str,
    nbuckets: int,
    rel_err: float,
) -> tuple[DataFrame, int]:
    """Rank df by order_cols into out_col; return (ranked_df, total_rows).

    The per-bucket counts pass doubles as the row-count source, so NTILE
    callers don't pay a separate count job.
    """
    key_d = F.col(order_cols[0]).cast("double")
    tagged = df.withColumn("__gr_key_d", key_d)
    cuts = tagged.stat.approxQuantile(
        "__gr_key_d", [i / nbuckets for i in range(1, nbuckets)], rel_err
    )
    cuts = sorted(set(cuts))
    bucketed = tagged.withColumn(_BUCKET, _bucket_expr(F.col("__gr_key_d"), cuts))

    counts = {
        r[_BUCKET]: r["n"]
        for r in bucketed.groupBy(_BUCKET).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offset = 0
    offsets: dict[int, int] = {}
    for b in sorted(counts):
        offsets[b] = offset
        offset += counts[b]

    off_expr = F.lit(0)
    for b, o in offsets.items():
        off_expr = F.when(F.col(_BUCKET) == F.lit(b), F.lit(o)).otherwise(off_expr)

    w = Window.partitionBy(_BUCKET).orderBy(*order_cols)
    ranked = (
        bucketed.withColumn(_LOCAL_RANK, F.row_number().over(w))
        .withColumn(out_col, (F.col(_LOCAL_RANK) + off_expr).cast("long"))
        .drop("__gr_key_d", _BUCKET, _LOCAL_RANK)
    )
    return ranked, offset


def with_global_rank(
    df: DataFrame,
    order_cols: list[str],
    out_col: str = "global_rank",
    nbuckets: int = 32,
    rel_err: float = 0.01,
) -> DataFrame:
    """Add an exact ``row_number() OVER (ORDER BY order_cols)`` column using
    the parallel two-phase plan above.

    ``order_cols`` must define a total order (unique tuples); the first
    column must cast to double (numeric / timestamp / decimal all do).
    """
    ranked, _ = _ranked_with_total(df, order_cols, out_col, nbuckets, rel_err)
    return ranked


def ntile_from_rank(rank: Column, n_rows: int, tiles: int) -> Column:
    """Exact NTILE(tiles) value from a 1-based global rank over n_rows."""
    q, r = divmod(n_rows, tiles)
    if q == 0:
        # Fewer rows than tiles: NTILE gives one row per tile in rank order.
        return rank.cast("int")
    big = r * (q + 1)  # rows covered by the first r tiles of size q+1
    return (
        F.when(rank <= F.lit(big), F.floor((rank - 1) / F.lit(q + 1)))
        .otherwise(F.lit(r) + F.floor((rank - F.lit(big) - 1) / F.lit(q)))
        .cast("int")
        + F.lit(1)
    )


def with_global_ntile(
    df: DataFrame,
    order_cols: list[str],
    tiles: int,
    out_col: str,
    nbuckets: int = 32,
    rel_err: float = 0.01,
) -> DataFrame:
    """Add an exact ``NTILE(tiles) OVER (ORDER BY order_cols)`` column with a
    parallel plan. Requires a total order; see :func:`with_global_rank`.
    """
    return with_global_ntiles(df, [(order_cols, tiles, out_col)], nbuckets, rel_err)


def with_global_ntiles(
    df: DataFrame,
    specs: list[tuple[list[str], int, str]],
    nbuckets: int = 32,
    rel_err: float = 0.01,
) -> DataFrame:
    """Exact NTILE columns for SEVERAL orderings in bulk: one multi-column
    approxQuantile pass and ONE combined bucket-count aggregation serve
    every metric, so k quartile columns cost 2 statistics jobs instead of
    2k (the difference between 7 and 3 jobs for RFM's three metrics).

    ``specs``: (order_cols, tiles, out_col) per metric; each ordering must
    be total (tie-broken), leading column castable to double.
    """
    key_cols = []
    keyed = df
    for i, (order_cols, _, _) in enumerate(specs):
        kc = f"__gr_k{i}"
        keyed = keyed.withColumn(kc, F.col(order_cols[0]).cast("double"))
        key_cols.append(kc)
    probs = [i / nbuckets for i in range(1, nbuckets)]
    cuts_per = keyed.stat.approxQuantile(key_cols, probs, rel_err)

    bucket_cols = []
    for i, cuts in enumerate(cuts_per):
        bc = f"__gr_b{i}"
        keyed = keyed.withColumn(bc, _bucket_expr(F.col(f"__gr_k{i}"), sorted(set(cuts))))
        bucket_cols.append(bc)

    # One pass over the frame counts every metric's buckets: explode k
    # (metric, bucket) pairs per row, aggregate — ≤ k x (nbuckets+1) rows
    # to the driver.
    pairs = F.explode(
        F.array(
            *[
                F.struct(F.lit(i).alias("i"), F.col(bc).alias("b"))
                for i, bc in enumerate(bucket_cols)
            ]
        )
    ).alias("ib")
    counts_rows = (
        keyed.select(pairs)
        .groupBy(F.col("ib.i").alias("i"), F.col("ib.b").alias("b"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    per_metric: dict[int, dict[int, int]] = {}
    for r in counts_rows:
        per_metric.setdefault(r["i"], {})[r["b"]] = r["n"]

    out = keyed
    for i, (order_cols, tiles, out_col) in enumerate(specs):
        counts = per_metric.get(i, {})
        n_rows = sum(counts.values())
        offset = 0
        off_expr = F.lit(0)
        for b in sorted(counts):
            off_expr = F.when(F.col(bucket_cols[i]) == F.lit(b), F.lit(offset)).otherwise(
                off_expr
            )
            offset += counts[b]
        w = Window.partitionBy(bucket_cols[i]).orderBy(*order_cols)
        rank = (F.row_number().over(w) + off_expr).cast("long")
        out = out.withColumn(out_col, ntile_from_rank(rank, n_rows, tiles))
    return out.drop(*key_cols, *bucket_cols)
