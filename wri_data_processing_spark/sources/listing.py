"""Recursive file-listing scan (S1, reference 00b_extract_metadata_all.R:68).

``dir_ls(recurse=TRUE, glob=...)`` becomes Spark's binaryFile source in
metadata-only mode: we select path/length/modificationTime and DROP content,
so executors never read file bytes — the listing itself is distributed and
the 100 TB analog (S3/HDFS listing) parallelizes across the driver's
listing threads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def scan_file_listing(
    spark: SparkSession, root: str, glob: str = "*.tif", recursive: bool = True
) -> DataFrame:
    """(path, length, modificationTime) for every file matching glob under root."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", str(recursive).lower())
        .load(root)
        .select("path", "length", "modificationTime")
    )


def strip_scheme(path_col: F.Column) -> F.Column:
    """binaryFile yields file:/abs/path URIs; reference semantics use plain paths."""
    return F.regexp_replace(path_col, "^file:", "")
