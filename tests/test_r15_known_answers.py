"""r15 known-answer tests: pure-Python replays of the round's new ops —
independent arithmetic, not the engine's or the oracle's expression trees
(the Wilcoxon-catch house rule).
"""

from __future__ import annotations

import pandas as pd

from wri_data_processing_spark import registry

registry.load_all()


class TestDqVolumePositiveControl:
    def _replay(self, sf_dir):
        """Independent replay in pandas: daily counts -> per-type total ->
        alternating (3T, T) injection -> lag ratio -> >0.5 gate."""
        ev = pd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "ts"])
        ev["d"] = pd.to_datetime(ev["ts"]).dt.date
        daily = ev.groupby(["event_type", "d"]).size().rename("n").reset_index()
        out = []
        for etype, grp in daily.groupby("event_type"):
            grp = grp.sort_values("d").reset_index(drop=True)
            t = int(grp["n"].sum())
            # day-rank is 1-based: odd ranks get 3T, even ranks T
            inj = [t * (1 + 2 * ((i + 1) % 2)) for i in range(len(grp))]
            for i in range(1, len(grp)):
                pct = (inj[i] - inj[i - 1]) / inj[i - 1]
                out.append(
                    (etype, str(grp["d"][i]), inj[i], inj[i - 1], pct, abs(pct) > 0.5)
                )
        return pd.DataFrame(
            out, columns=["event_type", "day", "n", "prev_n", "pct_change", "anomaly"]
        )

    def test_control_replay(self, spark, sf_dir):
        exp = self._replay(sf_dir).sort_values(["event_type", "day"]).reset_index(drop=True)
        got = (
            registry.REGISTRY["dq_volume_positive_control"](spark, sf_dir)
            .toPandas()
            .sort_values(["event_type", "day"])
            .reset_index(drop=True)
        )
        assert len(got) == len(exp) > 0
        pd.testing.assert_frame_equal(
            got[exp.columns.tolist()], exp, check_dtype=False
        )

    def test_alert_fires_everywhere(self, spark, sf_dir):
        """The control's CONTRACT: anomaly must be True on EVERY transition —
        a regression that silences the pager (sign flip, wrong threshold,
        broken lag) turns this red. The pct values must be exactly the
        injected swings: +2.0 (3x surge) and -2/3 (collapse to a third)."""
        got = registry.REGISTRY["dq_volume_positive_control"](spark, sf_dir).toPandas()
        assert len(got) > 0
        assert bool(got["anomaly"].all())
        vals = sorted(set(round(v, 9) for v in got["pct_change"]))
        assert vals == [round(-2.0 / 3.0, 9), 2.0]

    def test_halving_would_not_fire(self):
        """Documents WHY the injection is 3x, not the verdict's literal
        'halving': a pure 2x drop lands exactly ON the strict >0.5 boundary
        and must NOT alarm under the production rule."""
        pct = (1 - 2) / 2  # count halves: prev=2T -> n=T
        assert abs(pct) == 0.5 and not (abs(pct) > 0.5)
