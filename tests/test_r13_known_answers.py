"""r13 known-answer tests: independent pure-Python replays of the new ops.

House rule (r11 verdict item 1, proven by the Wilcoxon catch): every new
formula op ships with a replay that does NOT share the engine's or the
oracle's expression tree — hashlib + plain Python here.
"""

from __future__ import annotations

import hashlib
from collections import Counter

from wri_data_processing_spark import registry
from wri_data_processing_spark.catalog import table
from wri_data_processing_spark.queries.llm_text import _LID_CLASSES, _LID_D, _LID_W

registry.load_all()


def _py_scores(text: str) -> dict[str, int]:
    s = dict.fromkeys(_LID_CLASSES, 0)
    for i in range(len(text) - 2):
        h = int(hashlib.sha256(text[i : i + 3].encode()).hexdigest()[:15], 16) % _LID_D
        for c in _LID_CLASSES:
            s[c] += _LID_W[c][h]
    return s


def _py_pred(s: dict[str, int]) -> str:
    # mirrored tie order: first class in _LID_CLASSES wins at equality
    best = max(s.values())
    return next(c for c in _LID_CLASSES if s[c] == best)


class TestLangIdMulti:
    def test_scores_and_argmax_replay(self, spark, sf_dir):
        docs = {
            r["doc_id"]: r["text"]
            for r in table(spark, sf_dir, "documents")
            .select("doc_id", "text")
            .collect()
        }
        got = {
            r["doc_id"]: r
            for r in registry.REGISTRY["text_lang_id_multi"](spark, sf_dir).collect()
        }
        assert set(got) == {d for d, t in docs.items() if len(t) >= 3}
        for doc_id, r in got.items():
            want = _py_scores(docs[doc_id])
            for c in _LID_CLASSES:
                assert r[f"s_{c}"] == want[c], (doc_id, c)
            assert r["pred_lang"] == _py_pred(want), doc_id

    def test_multiclass_surface_is_live(self, spark, sf_dir):
        """The fixture's whole point (VERDICT r12 item 7): predictions must
        spread over >= 3 classes, not collapse to a binary surface."""
        preds = Counter(
            r["pred_lang"]
            for r in registry.REGISTRY["text_lang_id_multi"](spark, sf_dir).collect()
        )
        assert len(preds) >= 3, dict(preds)

    def test_weights_are_pinned_config(self):
        # the weight scheme is a module literal; a drive-by edit to the
        # constants silently invalidates every committed known answer
        assert _LID_D == 64 and _LID_CLASSES == ("de", "en", "es", "fr", "zh")
        assert _LID_W["de"][0] == -2048 + (0 * 2654435761) % 4097
        assert _LID_W["zh"][3] == (((3 * 5 + 4) * 2654435761) % 4097) - 2048


class TestLangIdReport:
    def test_report_replays_from_scorer_output(self, spark, sf_dir):
        per_doc = registry.REGISTRY["text_lang_id_multi"](spark, sf_dir).collect()
        support = Counter(r["labeled_lang"] for r in per_doc)
        predicted = Counter(r["pred_lang"] for r in per_doc)
        tp = Counter(
            r["labeled_lang"] for r in per_doc if r["labeled_lang"] == r["pred_lang"]
        )
        got = {
            r["cls"]: r
            for r in registry.REGISTRY["eval_lang_id_report"](spark, sf_dir).collect()
        }
        assert set(got) == set(support) | set(predicted)
        for cls, r in got.items():
            s, p, t = support[cls], predicted[cls], tp[cls]
            assert (r["support"], r["predicted"], r["tp"]) == (s, p, t), cls
            prec = t / p if p else 0.0
            rec = t / s if s else 0.0
            f1 = 2 * t / (2 * t + (p - t) + (s - t)) if (s + p) else 0.0
            assert abs(r["precision"] - prec) < 5e-7, cls
            assert abs(r["recall"] - rec) < 5e-7, cls
            assert abs(r["f1"] - f1) < 5e-7, cls
