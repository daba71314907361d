"""Local replica of the driver's DuckDB-oracle comparison.

For a query name: run the Spark DataFrame and the oracle SQL on the same
parquet tables, then compare row count, sorted column names, and an
order-insensitive value comparison (columns sorted by name, rows sorted,
floats rounded). Catching mismatches here means the driver's
CORRECTNESS_r{N}.json stays green.
"""

from __future__ import annotations

import datetime
import decimal
import math
import os

import duckdb
import numpy as np
import pandas as pd

from wri_data_processing_spark.catalog import TABLES


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    # Bound the oracle side: DuckDB's default memory_limit is 80% of RAM,
    # which OOM-kills the host when a Spark driver JVM shares the box and a
    # stress-SF oracle builds a large hash/sort state (the r15 10x-synth
    # sweep died this way at ~95 GB RSS). A hard cap + a spill directory
    # turns that into disk spill; SPARK_GRAFT_DUCK_MEM overrides per run.
    mem = os.environ.get("SPARK_GRAFT_DUCK_MEM", "24GB")
    con.execute(f"SET memory_limit='{mem}'")
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _norm_cell(v):
    """Normalize a cell to a (type-class, value) pair.

    TYPE-SENSITIVE on purpose: the driver's value hash distinguishes
    ``2187`` from ``2187.0`` (int vs float), so the local comparison must
    too — Python's ``2187 == 2187.0`` let the r4 pipeline_clean_corpus
    HUGEINT-vs-BIGINT oracle drift pass locally and fail the driver.
    Classes: b(ool) < i(nt) < f(loat) < d(ecimal) — bool checked first
    since it subclasses int. Width within a class (int32 vs int64) is NOT
    distinguished, matching the driver's numpy-value hashing.
    """
    if v is None or v is pd.NaT:
        return None
    if isinstance(v, (bool, np.bool_)):
        return ("b", bool(v))
    if isinstance(v, (int, np.integer)):
        return ("i", int(v))
    if isinstance(v, (float, np.floating)):
        if math.isnan(v):
            return "NaN"
        return ("f", float(v))  # exact: engine queries are designed to be bit-identical
    if isinstance(v, decimal.Decimal):
        return ("d", v)
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, (pd.Timestamp, datetime.datetime, datetime.date)):
        return ("t", v.isoformat())
    return v


def _normalize(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [tuple(_norm_cell(v) for v in row) for row in df[cols].itertuples(index=False)]
    return sorted(rows, key=lambda r: tuple(str(x) for x in r))


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> list[str]:
    """Return a list of mismatch descriptions (empty = pass)."""
    problems: list[str] = []
    sp = spark_df.toPandas()
    du = con.execute(sql).df()
    if sorted(sp.columns) != sorted(du.columns):
        problems.append(f"columns differ: spark={sorted(sp.columns)} duck={sorted(du.columns)}")
        return problems
    if len(sp) != len(du):
        problems.append(f"row count: spark={len(sp)} duck={len(du)}")
    a, b = _normalize(sp), _normalize(du)
    if a != b:
        diff_sample = []
        for x, y in zip(a, b):
            if x != y:
                diff_sample.append(f"spark={x!r} duck={y!r}")
                if len(diff_sample) >= 3:
                    break
        if not diff_sample and len(a) != len(b):
            diff_sample.append(f"lengths {len(a)} vs {len(b)}")
        problems.append("values differ: " + "; ".join(diff_sample))
    return problems
