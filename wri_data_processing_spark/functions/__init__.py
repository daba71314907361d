"""Scalar function library (SURVEY.md §2.8) — pure Column expression builders."""

from wri_data_processing_spark.functions.scalar import (  # noqa: F401
    DOMAIN_DIRS,
    basename,
    classify_data_type,
    classify_dimension,
    extract_domain,
    make_cog_filename,
    near,
    stem,
)
