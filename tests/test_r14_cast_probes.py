"""Executable evidence for the r14 cast-audit's load-bearing claims.

SCALE.md "r14 >2^53 cast audit" rests on two engine facts that were probed
by hand during the audit; these tests pin them so a Spark/DuckDB upgrade
that changes either behavior turns the assumption red instead of silently
invalidating the micros bridge or the RRF NULL gate.
"""

from __future__ import annotations

import math
import struct

import duckdb
import pytest
from pyspark.sql import functions as F


def _bits(x: float) -> int:
    return struct.unpack("<q", struct.pack("<d", x))[0]


# Values straddling and far beyond 2^53 — including odd values (inexact in
# double) whose rounding direction is where implementations could differ.
_BIG_LONGS = [
    (1 << 53) - 1,
    (1 << 53) + 1,
    (1 << 53) + 3,
    9_007_199_254_740_993,
    (1 << 60) + 12_345_678_901,
    (1 << 62) + 987_654_321_987,
    (1 << 63) - 1,
    123_456_789_012_345_678,
]


class TestInt64ToDoubleCastIdentity:
    """Sharpening #1: int64->double is IEEE round-to-nearest on BOTH
    engines at ANY magnitude — the reason a 128-bit sum that narrows to
    BIGINT before the double cast is safe while a direct 128-bit cast is
    not. Bitwise comparison, no tolerance."""

    def test_spark_matches_duckdb_bitwise(self, spark):
        sdf = spark.createDataFrame([(v,) for v in _BIG_LONGS], "v long")
        got = {
            r["v"]: r["d"]
            for r in sdf.select("v", F.col("v").cast("double").alias("d")).collect()
        }
        con = duckdb.connect()
        for v in _BIG_LONGS:
            duck = con.execute(
                f"SELECT CAST(CAST({v} AS BIGINT) AS DOUBLE)"
            ).fetchone()[0]
            py = float(v)  # CPython: correctly rounded int->float
            assert _bits(got[v]) == _bits(duck) == _bits(py), v

    def test_micros_bridge_equals_decimal_cast_below_2_53(self, spark):
        """Below 2^53 scaled, the micros bridge emits the SAME double as
        the direct decimal cast (why the r14 emission changes were
        hash-invisible at every tested SF)."""
        vals = ["123.456789", "8999999999.999999", "0.000001", "1048576.5"]
        con = duckdb.connect()
        for s in vals:
            direct, bridged = con.execute(
                f"""SELECT CAST(CAST({s} AS DECIMAL(38,6)) AS DOUBLE),
                           CAST(CAST(CAST({s} AS DECIMAL(38,6)) * 1000000
                                     AS BIGINT) AS DOUBLE) / 1000000.0"""
            ).fetchone()
            assert _bits(direct) == _bits(bridged), s
        row = (
            spark.range(1)
            .select(
                *[
                    (
                        (F.lit(s).cast("decimal(38,6)") * 1000000)
                        .cast("long")
                        .cast("double")
                        / F.lit(1000000.0)
                    ).alias(f"b{i}")
                    for i, s in enumerate(vals)
                ],
                *[
                    F.lit(s).cast("decimal(38,6)").cast("double").alias(f"d{i}")
                    for i, s in enumerate(vals)
                ],
            )
            .collect()[0]
        )
        for i, s in enumerate(vals):
            assert _bits(row[f"b{i}"]) == _bits(row[f"d{i}"]), s


class TestElementAtNullIndex:
    """The retrieval_hybrid_rrf footgun: Spark's element_at(arr, NULL)
    resolves to the LAST element (not NULL, which is what DuckDB's
    ws[NULL] yields). The op gates NULL ranks with F.when(...isNull())
    explicitly; this pin means a Spark version that changes the behavior
    flags the assumption for re-review rather than silently shifting it."""

    def test_spark_element_at_null_is_last_element(self, spark):
        df = spark.createDataFrame([(None,)], "i int")
        arr = F.array(F.lit(10.0), F.lit(20.0), F.lit(30.0))
        got = df.select(F.element_at(arr, F.col("i")).alias("e")).collect()[0]["e"]
        assert got == 30.0  # last element — NOT NULL

    def test_duckdb_list_null_index_is_null(self):
        con = duckdb.connect()
        assert con.execute(
            "SELECT ([10.0, 20.0, 30.0])[CAST(NULL AS INT)]"
        ).fetchone()[0] is None

    def test_rrf_null_gate_matches_duckdb_semantics(self, spark):
        """The gated lookup both ops actually use: NULL rank -> 0.0 on
        both engines."""
        # Full-precision repr literals, the registered oracle's convention —
        # a shorter (<=15-digit) literal parses as DECIMAL in DuckDB and
        # changes the output type class.
        w = [1.0 / (60 + r) for r in (1, 2, 3)]
        df = spark.createDataFrame([(1,), (3,), (None,)], "r int")
        w_arr = F.array(*[F.lit(x) for x in w])
        gated = F.when(F.col("r").isNull(), F.lit(0.0)).otherwise(
            F.element_at(w_arr, F.col("r"))
        )
        rows = [
            (r["r"], r["g"]) for r in df.select("r", gated.alias("g")).collect()
        ]
        got = sorted(rows, key=lambda t: (t[0] is None, t[0] or 0))
        con = duckdb.connect()
        # NB: a SHORT homogeneous literal list parses as DECIMAL in DuckDB;
        # the registered op's 20-literal mixed-scale list unifies to DOUBLE
        # (verified on the real oracle's .df() dtypes). Cast explicitly here
        # so the 3-element probe matches the op's effective type.
        lits = ", ".join(f"CAST({x!r} AS DOUBLE)" for x in w)
        duck = con.execute(
            f"SELECT r, COALESCE(([{lits}])[r], 0.0) "
            "FROM (VALUES (1), (3), (CAST(NULL AS INT))) t(r) "
            "ORDER BY r IS NULL, r"
        ).fetchall()
        assert [tuple(x) for x in duck] == [tuple(x) for x in got]

    def test_no_nan_in_gate(self):
        assert not any(math.isnan(1.0 / (60 + r)) for r in range(1, 21))


@pytest.mark.parametrize("v", _BIG_LONGS)
def test_python_float_is_reference_rounding(v):
    """CPython int->float is correctly rounded (documented); both engines
    matching it (above) means all three agree on round-to-nearest-even."""
    f = float(v)
    assert isinstance(f, float)
    # round-trip bound: |f - v| <= ulp(f)/2
    assert abs(f - v) <= math.ulp(f) / 2
