"""Property-based verification of the segment-dedup and packing families
against an INDEPENDENT pure-Python reference (the raster-analytics stance:
the oracle proves cross-engine SQL equivalence; the Python reference proves
both engines implement the intended SEMANTICS, written from the definition,
not from either implementation).

Random corpora: small vocabularies force genuine cross-document segment
collisions; duplicated documents exercise the keep-first race; empty-ish
and single-token docs hit the trailing-segment edge.
"""

from __future__ import annotations

import hashlib

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SEG = 16  # mirrors llm_segments._SEG_TOKENS
PACK = 512  # mirrors llm_pipeline._PACK_SEQ_TOKENS

_SETTINGS = dict(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_doc = st.lists(
    st.sampled_from([f"w{i}" for i in range(12)]), min_size=1, max_size=70
).map(" ".join)
_corpus = st.lists(_doc, min_size=1, max_size=25)


def _ref_segments(text: str) -> list[str]:
    toks = text.strip().split()
    return [" ".join(toks[i : i + SEG]) for i in range(0, len(toks), SEG)]


def _ref_keepfirst(rows: list[tuple[int, str]]):
    """Python reference: global keep-first by (doc_id, seg_idx) per distinct
    segment (keyed by sha256 prefix, same as the engine)."""
    occurrences = []
    for doc_id, text in rows:
        for idx, seg in enumerate(_ref_segments(text)):
            key = hashlib.sha256(seg.encode()).hexdigest()[:16]
            occurrences.append((key, doc_id, idx, seg))
    winner = {}
    for key, doc_id, idx, _seg in occurrences:
        if key not in winner or (doc_id, idx) < winner[key]:
            winner[key] = (doc_id, idx)
    return occurrences, winner


@pytest.fixture(scope="module")
def sdf(spark):
    return spark


@settings(**_SETTINGS)
@given(texts=_corpus)
def test_dedup_segments_matches_python_reference(sdf, texts):
    from pyspark.sql import functions as F

    from wri_data_processing_spark.queries.llm_segments import _ranked_segments

    rows = list(enumerate(texts))
    occurrences, winner = _ref_keepfirst(rows)
    want: dict[int, list[int]] = {}
    for key, doc_id, idx, _seg in occurrences:
        n, k = want.setdefault(doc_id, [0, 0])
        want[doc_id][0] = n + 1
        want[doc_id][1] = k + (1 if winner[key] == (doc_id, idx) else 0)

    d = sdf.createDataFrame(rows, ["doc_id", "text"])
    kept = (F.col("rn") == 1).cast("int")
    got = {
        r.doc_id: [r.n, r.k]
        for r in _ranked_segments(d)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(kept).alias("k"))
        .collect()
    }
    assert got == want


@settings(**_SETTINGS)
@given(texts=_corpus)
def test_rewrite_matches_python_reference(sdf, texts):
    from pyspark.sql import functions as F

    from wri_data_processing_spark.queries import llm_segments as S

    rows = list(enumerate(texts))
    occurrences, winner = _ref_keepfirst(rows)
    want: dict[int, str] = {}
    for key, doc_id, idx, seg in occurrences:
        if winner[key] == (doc_id, idx):
            want[doc_id] = (want.get(doc_id, "") + " " + seg).strip()

    d = sdf.createDataFrame(rows, ["doc_id", "text"])
    ranked = S._ranked_segments(d).filter(F.col("rn") == 1)
    parts = F.array_sort(F.collect_list(F.struct("seg_idx", "seg")))
    got = {
        r.doc_id: r.t
        for r in ranked.groupBy("doc_id")
        .agg(F.array_join(F.transform(parts, lambda s: s["seg"]), " ").alias("t"))
        .collect()
    }
    assert got == want


@settings(**_SETTINGS)
@given(texts=_corpus, sources=st.lists(st.sampled_from(["a", "b"]), min_size=25, max_size=25))
def test_pack_spans_match_python_reference(sdf, texts, sources):
    from wri_data_processing_spark.queries.llm_pipeline import pack_sequences_spans

    rows = [(i, t, sources[i]) for i, t in enumerate(texts)]
    # reference: per source, docs in doc_id order; spans from running offsets
    want = {}
    offset: dict[str, int] = {}
    for doc_id, text, source in rows:
        n = len(text.strip().split())
        start = offset.get(source, 0)
        end = start + n
        want[doc_id] = (
            n,
            start // PACK,
            (end - 1) // PACK,
            (end - 1) // PACK - start // PACK + 1,
            start % PACK != 0,
        )
        offset[source] = end

    import wri_data_processing_spark.queries.llm_pipeline as P

    d = sdf.createDataFrame(rows, ["doc_id", "text", "source"])
    orig = P.table
    P.table = lambda spark, sf_dir, name: d
    try:
        got = {
            r.doc_id: (r.n_tok, r.first_seq, r.last_seq, r.n_seqs, r.starts_mid_seq)
            for r in pack_sequences_spans(None, "unused").collect()
        }
    finally:
        P.table = orig
    assert got == want
