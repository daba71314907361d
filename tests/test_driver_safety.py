"""Driver-safety invariant over every registered query (VERDICT r4 item 7).

The driver's correctness harness canonicalizes results with pandas
``sort_values`` before hashing; a top-level ``ArrayType``/``MapType``/
``StructType`` column makes that crash (``TypeError: unhashable type:
'list'``) and burns the op's sample slot with an ERR row — this killed
geo_reproject_bbox in r3 and multimodal_features in r4. This test builds
every registered query's schema and asserts the output is flat scalars, so
the failure class is structurally impossible for all future ops.

The whitelist is intentionally EMPTY: array-returning operators stay
available as library functions (e.g. operators/multimodal.py
extract_features); only the *registered* query surface must flatten.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql.types import ArrayType, MapType, StructType

from wri_data_processing_spark import registry

registry.load_all()

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")

# Ops allowed to return complex top-level columns (must be rows-only AND
# documented why the driver canonicalizer tolerates them). Currently none.
COMPLEX_WHITELIST: frozenset[str] = frozenset()


@pytest.mark.parametrize("name", sorted(registry.REGISTRY))
def test_output_schema_is_driver_safe(spark, name):
    if name in COMPLEX_WHITELIST:
        pytest.skip("explicitly whitelisted complex output")
    df = registry.REGISTRY[name](spark, SF_DIR)
    complex_cols = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not complex_cols, (
        f"{name} emits complex top-level columns {complex_cols}; flatten to "
        "scalars (element_at/to_json/concat_ws) — the driver hasher crashes "
        "on list cells"
    )
