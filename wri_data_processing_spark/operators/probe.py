"""Remote existence probe (S8, reference 02b_make_stac_all.R:86-103).

The reference HEAD-requests one URL per file, serially, 5 s timeout, any
error => not hosted. Engine shape: an Arrow-batched pandas UDF with a pooled
requests.Session per batch — partition-parallel, so 82 probes (or 82k) run
concurrently across executors instead of sequentially on one thread.

Effectful-source caveat (SURVEY.md §4 risk register): probe results MUST be
computed once per run — callers cache() the resulting DataFrame so plan
re-execution can't re-probe and flap mid-job.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BooleanType

ProbeFn = Callable[[str], bool]


def http_head_probe(base_url: str, timeout: float = 5.0) -> ProbeFn:
    """Real prober: TRUE iff HEAD returns 2xx within timeout (02b:95-101)."""
    import requests

    session = requests.Session()

    def probe(filename: str) -> bool:
        try:
            resp = session.head(base_url + filename, timeout=timeout)
            return 200 <= resp.status_code < 300
        except Exception:
            return False  # any error/timeout => not accessible (02b:99-102)

    return probe


def with_hosted_flag(
    meta: DataFrame, probe: ProbeFn, filename_col: str = "cog_filename"
) -> DataFrame:
    """Append is_hosted via a vectorized probe UDF, computed exactly once.

    The result is cached and materialized before returning: re-executing the
    plan (e.g. two downstream actions) must NOT re-issue HTTP requests.
    """

    @pandas_udf(BooleanType())
    def probe_udf(names: pd.Series) -> pd.Series:
        return names.map(lambda n: bool(probe(n)))

    out = meta.withColumn("is_hosted", probe_udf(F.col(filename_col))).cache()
    out.count()  # materialize now; effectful source must not flap
    return out


def hosted_counts(meta: DataFrame) -> DataFrame:
    """A2 conditional counts (02b:161-162)."""
    return meta.agg(
        F.count_if(F.col("is_hosted")).alias("n_hosted"),
        F.count_if(~F.col("is_hosted")).alias("n_local"),
    )
