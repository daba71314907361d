"""Multimodal column queries (L5) over the synthesized media table.

media_from_documents derives a deterministic binary table from documents
(text bytes as payload), so the binary plumbing is oracle-checkable where
the logic is length-arithmetic, and rows-only where it crosses the decoder
stub.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wri_data_processing_spark.catalog import table
from wri_data_processing_spark.operators.multimodal import (
    extract_features,
    frame_sample,
    media_from_documents,
)
from wri_data_processing_spark.registry import query

_TYPE_SQL = """
  CASE CAST(doc_id % 3 AS INTEGER)
    WHEN 0 THEN 'image/png' WHEN 1 THEN 'audio/wav' ELSE 'video/mp4'
  END
"""


@query(
    "multimodal_meta",
    oracle=f"""
    SELECT doc_id AS media_id, {_TYPE_SQL} AS media_type,
           CAST(length(text) AS BIGINT) AS n_bytes,
           CAST(doc_id % 640 + 1 AS INTEGER) AS width,
           CAST(doc_id % 480 + 1 AS INTEGER) AS height,
           n_chars / 100.0 AS duration_s
    FROM documents
    """,
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata beside the opaque payload (documents are ASCII, so
    byte length == char length and the oracle is pure SQL)."""
    m = media_from_documents(table(spark, sf_dir, "documents"))
    return m.select(
        "media_id",
        "media_type",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.col("meta.duration_s").alias("duration_s"),
    )


@query(
    "multimodal_frame_sample",
    oracle="""
    SELECT doc_id AS media_id,
           least((length(text) - 1) // 64 + 1, 16) AS n_frames,
           CAST(least(length(text), 64) AS BIGINT) AS first_frame_bytes
    FROM documents
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1->N frame explosion: frames per payload + size of frame 0."""
    m = media_from_documents(table(spark, sf_dir, "documents"))
    frames = frame_sample(m, every_n_bytes=64, max_frames=16)
    return frames.groupBy("media_id").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.max(F.when(F.col("frame_idx") == 0, F.length("frame"))).cast("long").alias(
            "first_frame_bytes"
        ),
    )


def _hex_byte_sql(i: int) -> str:
    """DuckDB: i-th byte of the sha256 hex digest as a double in [0,1]."""
    return (
        f"CAST(CAST('0x' || substr(sha256(text), {2 * i + 1}, 2) AS INTEGER) AS DOUBLE)"
        " / 255.0"
    )


@query(
    "multimodal_features",
    oracle=f"""
    SELECT doc_id AS media_id, {_TYPE_SQL} AS media_type,
           sha256(text) AS digest,
           CAST(8 AS INTEGER) AS feature_dim,
           {", ".join(f"{_hex_byte_sql(i)} AS feature_{i}" for i in range(8))}
    FROM documents
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction through the real mapInPandas decode boundary,
    flattened to driver-safe scalar columns (no top-level arrays — the
    driver's canonicalizer can't sort list cells).

    The stub decoder is sha256-derived (operators/multimodal.py:70-78), so
    the oracle is EXACT: DuckDB's sha256 matches hashlib byte-for-byte and
    feature_i == hexbyte_i / 255.0 is the same IEEE double division on both
    sides. The array-returning operator stays available internally via
    extract_features(); only the registered query flattens.
    """
    m = media_from_documents(table(spark, sf_dir, "documents"))
    feats = extract_features(m)
    return feats.select(
        "media_id",
        "media_type",
        "digest",
        F.size("feature").alias("feature_dim"),
        *[F.element_at("feature", i + 1).alias(f"feature_{i}") for i in range(8)],
    )


@query(
    "multimodal_dedup",
    oracle="""
    SELECT sha256(text) AS payload_digest,
           CAST(COUNT(*) AS BIGINT) AS n_copies,
           MIN(doc_id) AS keeper_media_id,
           CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes
    FROM documents GROUP BY text
    """,
)
def multimodal_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact binary-payload dedup over the media table — byte-identical
    images/audio/video collapse on sha256(payload) with keep-lowest-id, the
    L1 dedup semantics applied to the opaque binary column (the first pass
    every multimodal corpus runs before any perceptual hashing).

    The shuffle carries 32-byte digests plus counters, never payloads —
    identical plan shape to dedup_exact, proving the dedup machinery is
    payload-type-agnostic: the binary column needs no decode to dedup.
    Perceptual near-dup (pHash over the decode boundary) layers on top the
    same way dedup_ngram layers on dedup_exact for text.
    """
    m = media_from_documents(table(spark, sf_dir, "documents"))
    return m.groupBy(F.sha2("payload", 256).alias("payload_digest")).agg(
        F.count(F.lit(1)).cast("long").alias("n_copies"),
        F.min("media_id").alias("keeper_media_id"),
        F.sum(F.col("meta.n_bytes")).cast("long").alias("total_bytes"),
    )


@query(
    "multimodal_chunk_dedup",
    oracle=f"""
    WITH m AS (SELECT doc_id, {_TYPE_SQL} AS media_type, text
               FROM documents WHERE length(text) > 0),
    c AS (
      SELECT doc_id, media_type,
             sha256(substring(text, (u.i - 1) * 64 + 1, 64)) AS h
      FROM m, unnest(generate_series(1,
             CAST(ceil(length(text) / 64.0) AS BIGINT))) u(i))
    SELECT media_type, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_blobs,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(COUNT(DISTINCT h) AS BIGINT) AS n_unique_chunks,
           ROUND(CAST(COUNT(DISTINCT h) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
             AS unique_ratio
    FROM c GROUP BY 1 ORDER BY 1
    """,
)
def multimodal_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-level dedup statistics over opaque binary payloads — the
    content-addressable-store pattern (fixed 64-byte chunks stand in for
    content-defined chunking): how much of each modality's byte volume is
    redundant at sub-file granularity, which whole-payload digests
    (multimodal_dedup) cannot see. A media lakehouse uses exactly this to
    size a chunk store and to dedup re-encoded uploads sharing runs.

    The payload is never decoded and never shuffled: chunk slicing and
    sha256 run JVM-side inside the scan stage, and every exchange after
    that carries 64-hex digests + ids only. Distinct counts are the
    standard two-phase exact distinct aggregate. The documents-derived
    media table is ASCII, so DuckDB's character substring mirrors the
    engine's byte substring exactly (the multimodal_meta assumption).
    """
    m = media_from_documents(table(spark, sf_dir, "documents"))
    n = F.length("payload")
    k = F.ceil(n / F.lit(64.0)).cast("long")
    c = (
        m.filter(n > 0)
        .select(
            "media_id",
            "media_type",
            "payload",
            F.explode(F.sequence(F.lit(1).cast("long"), k)).alias("i"),
        )
        .select(
            "media_id",
            "media_type",
            F.sha2(
                F.col("payload").substr(
                    (F.col("i") - 1) * 64 + 1, F.lit(64)
                ),
                256,
            ).alias("h"),
        )
    )
    return (
        c.groupBy("media_type")
        .agg(
            F.count_distinct("media_id").cast("long").alias("n_blobs"),
            F.count(F.lit(1)).cast("long").alias("n_chunks"),
            F.count_distinct("h").cast("long").alias("n_unique_chunks"),
        )
        .select(
            "media_type",
            "n_blobs",
            "n_chunks",
            "n_unique_chunks",
            F.round(
                F.col("n_unique_chunks").cast("double") / F.col("n_chunks").cast("double"),
                6,
            ).alias("unique_ratio"),
        )
        .orderBy("media_type")
    )


# Deterministic BMP fixtures for the REAL decode path: index -> dimensions
# and a per-index pixel pattern. Widths sweep all four stride-padding
# residues (w*3 mod 4) and the pattern varies in both axes and per image,
# so a decoder that mishandles row padding, BGR order, or bottom-up row
# storage produces different statistics from the stated expectation.
_BMP_FIXTURES = [(i, f"img_{i:02d}.bmp", 5 + i, 4 + (i % 5)) for i in range(12)]


def _bmp_pixel(i: int):
    def px(x: int, y: int) -> tuple[int, int, int]:
        return ((x * 11 + y * 7 + i) % 256,
                (x * 3 + y * 5 + 2 * i) % 256,
                (x * 13 + y + 3 * i) % 256)

    return px


def _bmp_expected_values() -> str:
    """Expected rows from INDEPENDENT arithmetic: direct sums over the
    pattern + the spec's size formula — never through the codec, so the
    oracle catches encode AND decode bugs alike."""
    rows = []
    for i, name, w, h in _BMP_FIXTURES:
        px = _bmp_pixel(i)
        pxs = [px(x, y) for y in range(h) for x in range(w)]
        n = len(pxs)
        mean = tuple(float(sum(p[c] for p in pxs)) / n for c in range(3))
        stride = (w * 3 + 3) & ~3
        n_bytes = 54 + stride * h
        rows.append(
            f"(CAST({i} AS BIGINT), '{name}', CAST({n_bytes} AS BIGINT), "
            f"CAST({w} AS INTEGER), CAST({h} AS INTEGER), "
            f"CAST({mean[0]!r} AS DOUBLE), CAST({mean[1]!r} AS DOUBLE), "
            f"CAST({mean[2]!r} AS DOUBLE), CAST({px(0, 0)[0]} AS INTEGER), "
            f"CAST({px(w - 1, h - 1)[2]} AS INTEGER), TRUE)"
        )
    rows.append(
        "(CAST(12 AS BIGINT), 'corrupt.bmp', CAST(40 AS BIGINT), "
        "CAST(NULL AS INTEGER), CAST(NULL AS INTEGER), CAST(NULL AS DOUBLE), "
        "CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), CAST(NULL AS INTEGER), "
        "CAST(NULL AS INTEGER), FALSE)"
    )
    return ", ".join(rows)


@query(
    "multimodal_features_real",
    oracle=f"""
    SELECT media_id, filename, n_bytes, width, height,
           mean_r, mean_g, mean_b, first_px_r, last_px_b, success
    FROM (VALUES {_bmp_expected_values()})
      AS t(media_id, filename, n_bytes, width, height,
           mean_r, mean_g, mean_b, first_px_r, last_px_b, success)
    """,
)
def multimodal_features_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5 feature extraction with NO stub: real 24-bit BMP payloads encoded
    and DECODED by the pure-Python codec (sources/bmp_codec.py), pixels
    recovered inside the Arrow-batched mapInPandas boundary, statistics
    checked against a VALUES oracle stated from independent arithmetic —
    the multimodal twin of scan_raster_header_real's executed-TIFF path.
    The reference behavior is utils.R:175-214's read-real-raster-bytes
    ingest, re-expressed for the opaque-binary media column family.

    One payload (fixture 12) is a 40-byte truncation: the decoder raises,
    the op emits success=FALSE with NULL features — the tolerate-and-log
    contract (bad media must quarantine, not kill the 100 TB job).

    Plan shape at scale: payloads never shuffle — decode runs in the scan
    stage's mapInPandas and only fixed-width statistics leave it; the
    output is a separate features table so downstream analytics never
    rescan media bytes (the operators/multimodal.py scale note).
    """
    import pandas as pd

    from wri_data_processing_spark.sources.bmp_codec import decode_bmp, write_bmp

    rows = []
    for i, name, w, h in _BMP_FIXTURES:
        rows.append((i, name, bytearray(write_bmp(w, h, _bmp_pixel(i)))))
    full = write_bmp(16, 8, _bmp_pixel(0))
    rows.append((12, "corrupt.bmp", bytearray(full[:40])))
    media = spark.createDataFrame(rows, "media_id long, filename string, payload binary")

    out_schema = (
        "media_id long, filename string, n_bytes long, width int, height int, "
        "mean_r double, mean_g double, mean_b double, "
        "first_px_r int, last_px_b int, success boolean"
    )

    def run(batches):
        for pdf in batches:
            out = {k: [] for k in ("media_id", "filename", "n_bytes", "width",
                                   "height", "mean_r", "mean_g", "mean_b",
                                   "first_px_r", "last_px_b", "success")}
            for mid, name, payload in zip(pdf["media_id"], pdf["filename"],
                                          pdf["payload"]):
                raw = bytes(payload)
                out["media_id"].append(int(mid))
                out["filename"].append(name)
                out["n_bytes"].append(len(raw))
                try:
                    w, h, px = decode_bmp(raw)
                    n = w * h
                    flat = [p for row in px for p in row]
                    out["width"].append(w)
                    out["height"].append(h)
                    for c, k in enumerate(("mean_r", "mean_g", "mean_b")):
                        out[k].append(float(sum(p[c] for p in flat)) / n)
                    out["first_px_r"].append(px[0][0][0])
                    out["last_px_b"].append(px[h - 1][w - 1][2])
                    out["success"].append(True)
                except ValueError:
                    for k in ("width", "height", "mean_r", "mean_g", "mean_b",
                              "first_px_r", "last_px_b"):
                        out[k].append(None)
                    out["success"].append(False)
            yield pd.DataFrame(out)

    return media.mapInPandas(run, out_schema)
