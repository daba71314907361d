"""Round-12 known-answer certification: text_ngram_novelty re-derived in
pure Python (hashlib + re) from the raw documents parquet.

The md5 split assignment, whitespace tokenization, 3-gram construction,
the sha256 60-bit shingle keys, the train/holdout distinct-set algebra
and the per-source novelty rates are all rebuilt with zero shared code.
Plus the metric's defining properties: the split respects exact-dup
safety (identical text never straddles train/holdout) and the rate is a
live decision (neither 0 nor 1 anywhere on the fixture).
"""

from __future__ import annotations

import hashlib
import re
from collections import defaultdict

import pandas as pd

from wri_data_processing_spark import registry

registry.load_all()


def _h60(s: str) -> int:
    return int(hashlib.sha256(s.encode()).hexdigest()[:15], 16)


def _replay(sf_dir):
    d = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text", "source"])
    train_set = set()
    hold_by_source = defaultdict(set)
    for text, source in zip(d["text"], d["source"]):
        split = "train" if hashlib.md5(text.encode()).hexdigest()[0] <= "b" else "holdout"
        toks = re.split(r"\s+", text.strip())
        if len(toks) < 3:
            continue
        grams = {
            _h60(" ".join(toks[i : i + 3])) for i in range(len(toks) - 2)
        }
        if split == "train":
            train_set |= grams
        else:
            hold_by_source[source] |= grams
    return train_set, hold_by_source


class TestNgramNoveltyKnownAnswer:
    def test_report_exact(self, spark, sf_dir):
        train_set, hold = _replay(sf_dir)
        rows = registry.REGISTRY["text_ngram_novelty"](spark, sf_dir).collect()
        got = {r["source"]: r for r in rows}
        assert set(got) == set(hold)
        for source, grams in hold.items():
            novel = len(grams - train_set)
            r = got[source]
            assert r["holdout_ngrams"] == len(grams)
            assert r["novel_ngrams"] == novel
            assert r["novelty_rate"] == round(novel / len(grams), 6)

    def test_rate_is_live(self, spark, sf_dir):
        rows = registry.REGISTRY["text_ngram_novelty"](spark, sf_dir).collect()
        assert rows
        for r in rows:
            assert 0.0 < r["novelty_rate"] < 1.0

    def test_exact_dups_never_straddle_split(self, sf_dir):
        # the split key is md5(text): byte-identical docs share a side, so
        # a duplicated holdout doc can never be "memorized" via its twin
        d = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
        sides = {}
        for text in d["text"]:
            key = hashlib.md5(text.encode()).hexdigest()
            side = key[0] <= "b"
            assert sides.setdefault(key, side) == side
