"""Repo-wide Python-boundary invariant: Arrow-vectorized edges only, and
only where declared.

The engine's posture is JVM-side expressions everywhere, with Python
appearing ONLY at declared Arrow-batched boundaries (pandas UDFs,
mapInPandas, applyInPandas) — never as row-at-a-time ``BatchEvalPython``,
which is 10-100x slower and the classic silent scale killer. This sweep
scans every registered query's physical plan:

- ``BatchEvalPython`` (pickled row-at-a-time UDF) is banned EVERYWHERE,
  including whitelisted queries;
- any Arrow node (``ArrowEvalPython``/``MapInPandas``/
  ``FlatMapGroupsInPandas``/``ArrowAggregatePython``...) is tolerated only
  for the ops below, each of which crosses the boundary for a documented
  reason (native-library edge, effectful source, or a deliberately
  registered pandas-interface demo).

A new query that quietly wraps a Python lambda in F.udf fails here with
the offending plan node in the message.
"""

from __future__ import annotations

import os
import re

import pytest

from wri_data_processing_spark import registry

registry.load_all()

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")

# name -> why this op legitimately crosses into Python (always Arrow form).
PYTHON_WHITELIST: dict[str, str] = {
    "scan_raster_header": "raster header read: GDAL/rasterio/pure-Python codec edge",
    "scan_raster_header_real": "same codec edge, executed pure-Python parser",
    "sink_cog": "COG conversion fan-out (gdal_translate / pure-Python writer)",
    "sink_cog_real": "same sink, executed pure-Python writer",
    "sink_cog_lzw_bigtiff": "same sink, LZW/BigTIFF dialect",
    "geo_layer_cog_pipeline": "cell-table -> per-layer COG assembly (applyInPandas)",
    "geo_reproject_bbox": "pyproj / vendored inverse-Albers reprojection",
    "geo_reproject_bbox_vals": "same reprojection, VALUES-oracle variant",
    "probe_url_exists": "effectful HTTP HEAD probe (connection-pooled pandas UDF)",
    "multimodal_features": "media decode boundary (stubbed decoder, real plumbing)",
    "multimodal_features_real": "media decode boundary, executed pure-Python "
    "BMP codec (sources/bmp_codec.py)",
    "multimodal_image_histogram": "media decode boundary, executed pure-Python "
    "BMP codec inside mapInPandas — the multimodal_features_real shape",
    "multimodal_dhash": "same executed decode boundary; integer dHash of "
    "decoded pixels",
    "multimodal_dhash_dedup": "banded pair join over multimodal_dhash "
    "fingerprints (same decode boundary upstream)",
    "multimodal_resize_real": "same executed decode boundary; integer NN "
    "resize of decoded pixels",
    "multimodal_audio_features_real": "audio decode boundary, executed "
    "pure-Python WAV codec (sources/wav_codec.py)",
    "multimodal_audio_vad": "same executed audio decode boundary; integer "
    "frame-energy voice-activity detection",
    "pandas_grouped_map": "registered applyInPandas interface demo",
    "text_compression_ratio": "zlib quality signal: compression has no JVM "
    "expression and no SQL twin — vectorized pandas UDF, scan-side only",
    "pandas_grouped_agg": "registered pandas GROUPED_AGG interface demo",
    "scan_parquet_footer_stats": "distributed parquet-footer read "
    "(pyarrow inside mapInPandas over the 4-row file list) — the "
    "manifest-builder pattern; footers have no JVM expression",
    "multimodal_patchify": "media decode boundary, executed pure-Python "
    "BMP codec inside mapInPandas — the multimodal_features_real shape; "
    "ViT patch-grid accumulation on decoded pixels",
    "multimodal_phash": "same executed decode boundary; integer DCT "
    "perceptual hash of decoded pixels (pinned cosine table)",
    "multimodal_phash_dedup": "banded pair join over multimodal_phash "
    "fingerprints (same decode boundary upstream)",
    "multimodal_image_entropy": "the multimodal_image_histogram decode "
    "boundary upstream; the entropy algebra itself is a JVM-side column "
    "expression over the 8-column histogram frame",
}

_PY_NODE = re.compile(r"\b(\w*(?:Python|Pandas)\w*)")


@pytest.mark.parametrize("name", sorted(registry.REGISTRY))
def test_python_only_at_declared_arrow_boundaries(spark, name):
    df = registry.REGISTRY[name](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    nodes = sorted(set(_PY_NODE.findall(plan)))
    assert "BatchEvalPython" not in nodes, (
        f"{name} plans a row-at-a-time Python UDF (BatchEvalPython) — use a "
        "pandas UDF / built-in functions"
    )
    if name in PYTHON_WHITELIST:
        return
    assert not nodes, (
        f"{name} crosses into Python ({nodes}) but is not a declared "
        "boundary; keep the expression JVM-side or whitelist with a reason"
    )
