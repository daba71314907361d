"""Reference scalar functions re-expressed as Spark Column builders.

Parity targets (reference file:line cited per function):
- near                : scripts/R/utils.R:35-37
- make_cog_filename   : scripts/R/utils.R:49-57
- classify_data_type  : scripts/R/utils.R:75-95
- extract_domain      : scripts/R/utils.R:108-131
- classify_dimension  : scripts/R/utils.R:145-162

All are pure JVM-side Column expressions (no Python UDFs): they stay inside
whole-stage codegen, cost ~nothing per row, and push through Catalyst.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Known domain directory names, priority-ordered (utils.R:116-120).
DOMAIN_DIRS = [
    "air_quality",
    "biodiversity",
    "carbon",
    "communities",
    "infrastructure",
    "livelihoods",
    "natural_habitats",
    "sense_of_place",
    "sensitivity_analysis",
    "species",
    "water",
]

EXCLUDE_DIR_RE = "/retro_|/archive/|/final_checks/"


def near(a: Column, b: Column, tol: float = 1e-6) -> Column:
    """Float equality within tolerance (utils.R:35-37).

    R's ``all.equal`` uses RELATIVE tolerance when the target is not tiny:
    |a-b| / |b| < tol.  A naive absolute |a-b| < 1e-6 diverges on
    extent-sized numbers (~5e6), so we scale by max(|b|, 1) — relative above
    1, absolute below (matching all.equal's scale floor).
    """
    return F.abs(a - b) <= F.lit(tol) * F.greatest(F.abs(b), F.lit(1.0))


def basename(path: Column) -> Column:
    """Final path component (R ``basename``)."""
    return F.element_at(F.split(path, "/"), -1)


def stem(path: Column) -> Column:
    """Basename without its final extension (R ``tools::file_path_sans_ext``)."""
    return F.regexp_replace(basename(path), r"\.[^./]*$", "")


def classify_data_type(path: Column) -> Column:
    """Order-sensitive CASE chain of utils.R:75-95.

    Note the reference quirk: ``/indicators_no_mask/`` does NOT match the
    literal substring ``/indicators/`` (underscore, not slash), so no_mask
    files fall through — we reproduce that exactly.
    """
    return (
        F.when(path.rlike(EXCLUDE_DIR_RE), F.lit("exclude"))
        .when(path.contains("/indicators/"), F.lit("indicator"))
        .when(path.rlike(r"WRI_score\.tif$"), F.lit("final_score"))
        .when(path.rlike(r"_(domain_score|resilience|resistance|status)\.tif$"), F.lit("aggregate"))
        .otherwise(F.lit("exclude"))
    )


def extract_domain(path: Column) -> Column:
    """Domain lookup, three fallbacks in order (utils.R:108-131).

    1. Parent of the FIRST exact ``indicators`` path component, if it has one
       (``which(parts == "indicators")[1] > 1``).
    2. First DOMAIN_DIRS entry (in list order) appearing as an exact path
       component.
    3. First DOMAIN_DIRS entry appearing as a substring of the basename.
    4. "unknown".
    """
    parts = F.split(path, "/")
    idx = F.array_position(parts, "indicators")  # 0 when absent, 1-based otherwise
    parent = F.when(idx > 1, F.element_at(parts, (idx - 1).cast("int")))

    dir_hit = None
    for d in DOMAIN_DIRS:
        cond = F.array_position(parts, d) > 0
        dir_hit = F.when(cond, F.lit(d)) if dir_hit is None else dir_hit.when(cond, F.lit(d))

    fname = basename(path)
    name_hit = None
    for d in DOMAIN_DIRS:
        cond = fname.contains(d)
        name_hit = F.when(cond, F.lit(d)) if name_hit is None else name_hit.when(cond, F.lit(d))

    return F.coalesce(parent, dir_hit, name_hit, F.lit("unknown"))


def classify_dimension(data_type: Column, filename: Column) -> Column:
    """Per-type regex chain (utils.R:145-162).

    The aggregate branch matches UNANCHORED substrings in priority order
    (``domain_score`` wins over ``resistance`` etc.); the indicator branch
    requires underscore-delimited tokens. NULL when not applicable.
    """
    indicator = (
        F.when(filename.contains("_resistance_"), F.lit("resistance"))
        .when(filename.contains("_recovery_"), F.lit("recovery"))
        .when(filename.contains("_status_"), F.lit("status"))
        .otherwise(F.lit(None).cast("string"))
    )
    aggregate = (
        F.when(filename.contains("domain_score"), F.lit("domain_score"))
        .when(filename.contains("resilience"), F.lit("resilience"))
        .when(filename.contains("resistance"), F.lit("resistance"))
        .when(filename.contains("status"), F.lit("status"))
        .otherwise(F.lit(None).cast("string"))
    )
    return (
        F.when(data_type == "indicator", indicator)
        .when(data_type == "aggregate", aggregate)
        .otherwise(F.lit(None).cast("string"))
    )


def make_cog_filename(path: Column) -> Column:
    """Unique COG output name (utils.R:49-57): stem + optional _no_mask suffix."""
    return F.when(
        path.contains("/indicators_no_mask/"), F.concat(stem(path), F.lit("_no_mask.tif"))
    ).otherwise(F.concat(stem(path), F.lit(".tif")))
