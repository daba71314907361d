"""Planted-fixture semantics tests for the C4-style segment dedup family.

The registry oracle proves engine to DuckDB equivalence on the testdata;
these pin the SEMANTICS on constructed corpora where the right answer is
known by hand: global keep-first winner selection, in-place removal with
order-preserving reassembly, whole-document disappearance, and the trailing
short segment.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from wri_data_processing_spark.queries.llm_segments import (
    _SEG_TOKENS,
    _ranked_segments,
    _segments,
)


def _toks(tag: str, n: int) -> str:
    return " ".join(f"{tag}{i}" for i in range(n))


def _corpus(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_segmentation_chunks_and_trailing_short_segment(spark):
    d = _corpus(spark, [(1, _toks("w", _SEG_TOKENS * 2 + 3))])
    segs = _segments(d).orderBy("seg_idx").collect()
    assert [r.seg_idx for r in segs] == [0, 1, 2]
    assert segs[0].seg.split(" ") == [f"w{i}" for i in range(_SEG_TOKENS)]
    assert segs[2].seg.split(" ") == [f"w{i}" for i in range(_SEG_TOKENS * 2, _SEG_TOKENS * 2 + 3)]


def test_keep_first_winner_is_global_min_doc_then_idx(spark):
    shared = _toks("dup", _SEG_TOKENS)
    # doc 5 carries the shared segment at idx 1; doc 2 at idx 0 -> doc 2 wins
    d = _corpus(
        spark,
        [
            (5, _toks("a", _SEG_TOKENS) + " " + shared),
            (2, shared + " " + _toks("b", _SEG_TOKENS)),
        ],
    )
    ranked = {
        (r.doc_id, r.seg_idx): r.rn for r in _ranked_segments(d).collect()
    }
    assert ranked[(2, 0)] == 1  # winner: smallest (doc_id, seg_idx)
    assert ranked[(5, 1)] == 2
    assert ranked[(5, 0)] == 1 and ranked[(2, 1)] == 1  # unique segments keep


def test_rewrite_removes_in_place_and_preserves_order(spark, monkeypatch):
    from wri_data_processing_spark.queries import llm_segments as S

    shared = _toks("dup", _SEG_TOKENS)
    a, b, c = (_toks(t, _SEG_TOKENS) for t in ("a", "b", "c"))
    d = _corpus(
        spark,
        [
            (1, shared + " " + a),
            (2, b + " " + shared + " " + c),  # middle segment removed
            (3, shared),  # fully duplicated -> document disappears
        ],
    )
    monkeypatch.setattr(S, "table", lambda spark, sf_dir, name: d)
    out = {r.doc_id: r for r in S.dedup_segments_rewrite(None, "unused").collect()}
    assert set(out) == {1, 2}  # doc 3 removed entirely
    assert out[1].new_text == shared + " " + a
    assert out[2].new_text == b + " " + c  # order preserved around the cut
    assert out[2].n_kept == 2
    assert out[2].new_n_chars == len(out[2].new_text)

    counts = {r.doc_id: r for r in S.dedup_segments(None, "unused").collect()}
    assert (counts[3].n_segments, counts[3].n_kept, counts[3].n_removed) == (1, 0, 1)
    assert counts[2].n_removed == 1


def test_rank_exchange_hashes_key_not_text(spark):
    """The window partition expression must be the 16-hex sha256 prefix —
    hashpartitioning on the hashed key, not on the raw segment string."""
    d = _corpus(spark, [(1, _toks("x", _SEG_TOKENS * 4))])
    plan = _ranked_segments(d)._jdf.queryExecution().executedPlan().toString()
    assert "sha2" in plan and "hashpartitioning" in plan
