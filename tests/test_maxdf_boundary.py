"""_MAX_DF cap contract: Spark and the DuckDB oracle must agree AT the
document-frequency boundary, not just on benign data.

Round-2 verdict defect #1: the oracle previously generated pairs from ALL
shingles while Spark dropped posting lists above _MAX_DF — green only
because sf0.01/sf0.1 never produce a hot shingle. This fixture constructs
one (DF=6 > cap=3) and proves:

1. Spark with max_df=3 matches the capped oracle exactly.
2. The uncapped oracle DIFFERS on this fixture (the test genuinely
   exercises the boundary — a pair reachable only via the hot shingle is
   dropped by the cap).
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from tests.oracle_harness import compare
from wri_data_processing_spark.queries.llm_dedup import (
    _JACCARD_THRESHOLD,
    _jaccard_pairs,
    _pairs_ctes,
    _shingles_hashed,
)

# Docs 1-6 all contain the phrase "the quick fox" -> that shingle has DF=6,
# above the test cap of 3. Docs 5 and 6 are EXACTLY that phrase, so their
# only path to a pair (jaccard 1.0) runs through the hot shingle: the cap
# must drop it. Docs 7/8 pair through rare shingles (DF=2): 3 common of 5
# distinct -> jaccard 0.6, exactly at the threshold, and must survive.
_DOCS = [
    (1, "the quick fox alpha1 beta1"),
    (2, "the quick fox alpha2 beta2"),
    (3, "the quick fox alpha3 beta3"),
    (4, "the quick fox alpha4 beta4"),
    (5, "the quick fox"),
    (6, "the quick fox"),
    (7, "red green blue yellow purple pink"),
    (8, "red green blue yellow purple brown"),
]

_TEST_MAX_DF = 3

_JAC_TAIL = f"""
    jac AS (
      SELECT doc_a, doc_b,
             ROUND(n_common * 1.0 / (s1.n + s2.n - n_common), 4) AS jaccard
      FROM pairs
      JOIN sizes s1 ON doc_a = s1.doc_id
      JOIN sizes s2 ON doc_b = s2.doc_id
      WHERE n_common * 1.0 / (s1.n + s2.n - n_common) >= {_JACCARD_THRESHOLD}
    )
    SELECT doc_a, doc_b, jaccard FROM jac
"""


@pytest.fixture(scope="module")
def hot_con():
    con = duckdb.connect()
    pdf = pd.DataFrame(_DOCS, columns=["doc_id", "text"])
    con.register("documents", pdf)
    return con


def test_capped_spark_matches_capped_oracle(spark, hot_con):
    d = spark.createDataFrame(_DOCS, ["doc_id", "text"])
    result = _jaccard_pairs(_shingles_hashed(d, 3), max_df=_TEST_MAX_DF)
    sql = "WITH " + _pairs_ctes(_TEST_MAX_DF) + _JAC_TAIL
    problems = compare(result, hot_con, sql)
    assert not problems, problems


def test_fixture_exercises_the_boundary(hot_con):
    """The uncapped oracle keeps the hot-shingle pair (5,6); the capped one
    drops it — proving the cap is load-bearing on this fixture."""
    capped = hot_con.execute("WITH " + _pairs_ctes(_TEST_MAX_DF) + _JAC_TAIL).df()
    uncapped = hot_con.execute("WITH " + _pairs_ctes(10**9) + _JAC_TAIL).df()
    capped_pairs = set(zip(capped["doc_a"], capped["doc_b"]))
    uncapped_pairs = set(zip(uncapped["doc_a"], uncapped["doc_b"]))
    assert capped_pairs == {(7, 8)}
    assert (5, 6) in uncapped_pairs
    assert capped_pairs < uncapped_pairs


def test_spark_cap_drops_hot_shingle_pair(spark):
    d = spark.createDataFrame(_DOCS, ["doc_id", "text"])
    rows = (
        _jaccard_pairs(_shingles_hashed(d, 3), max_df=_TEST_MAX_DF)
        .orderBy("doc_a", "doc_b")
        .collect()
    )
    assert [(r.doc_a, r.doc_b) for r in rows] == [(7, 8)]
    assert abs(rows[0].jaccard - 0.6) < 1e-9
