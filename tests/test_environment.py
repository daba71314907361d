"""Environment invariants — fail FAST with a named cause on runtime drift.

The round-3 pyspark 4.1 bump silently changed how parquet TIMESTAMP(NANOS)
surfaces (long -> TIMESTAMP_NTZ), breaking five events operators with
cryptic analysis errors. These guards pin every environment assumption the
engine and its DuckDB oracles rely on, so the NEXT runtime bump fails here,
by name, instead of six tests deep.
"""

from __future__ import annotations

import duckdb
import pyspark
from pyspark.sql.types import TimestampType

from wri_data_processing_spark.catalog import table


def test_pyspark_version_floor():
    major, minor = (int(x) for x in pyspark.__version__.split(".")[:2])
    assert (major, minor) >= (3, 5), (
        f"pyspark {pyspark.__version__} < 3.5: engine relies on 3.5+ APIs "
        "(session_window, hll sketches, TimestampNTZ handling)"
    )


def test_events_ts_normalizes_to_timestamp(spark, sf_dir):
    """catalog.table() must hand every consumer a session-tz TimestampType
    regardless of how the runtime surfaces parquet TIMESTAMP(NANOS)."""
    ts_type = table(spark, sf_dir, "events").schema["ts"].dataType
    assert isinstance(ts_type, TimestampType), (
        f"events.ts resolved to {ts_type}: a runtime changed TIMESTAMP(NANOS) "
        "handling again — extend the normalization in catalog.table()"
    )


def test_session_timezone_pinned_utc(spark):
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"


def test_documents_text_non_null(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    assert d.filter(d.text.isNull()).count() == 0, (
        "documents.text has NULLs: dedup/text oracles assume non-null text"
    )


def test_duckdb_functions_oracles_rely_on():
    con = duckdb.connect()
    # list_cosine_similarity: sim_* oracles; sha256: dedup_exact oracle;
    # list_transform + unnest(generate_series): IVF bucket oracles.
    assert con.sql("SELECT list_cosine_similarity([1.0,0.0],[1.0,0.0])").fetchone()[0] == 1.0
    assert len(con.sql("SELECT sha256('x')").fetchone()[0]) == 64
    assert con.sql(
        "SELECT list_transform([1,2], x -> x * 2)"
    ).fetchone()[0] == [2, 4]
    assert con.sql(
        "SELECT SUM(u.i) FROM unnest(generate_series(1, 3)) u(i)"
    ).fetchone()[0] == 6


def test_arrow_pandas_udf_roundtrip(spark):
    """Arrow batch transfer works — every pandas-UDF boundary depends on it."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # No pd.Series annotations: under `from __future__ import annotations`
    # they become strings and 4.1's hint inference rejects them.
    @pandas_udf("long")
    def plus_one(s):
        return s + 1

    got = spark.range(3).select(plus_one("id").alias("v")).collect()
    assert [r["v"] for r in got] == [1, 2, 3]
