"""Round-12 known-answer certification: Bradley-Terry MM iteration
replayed BIT-EXACTLY in Python bigints from the raw events parquet.

The duel fixture (per-user event-type count comparisons), the win/game
matrices, and all three Q6 fixed-point MM rounds — including the
truncating integer divisions — are re-derived with zero shared code.
Every strength_q must be equal, not close. Plus the structural
properties: mean-1 normalization (the engine's own invariant, up to
truncation slack), win-total ordering consistency on the complete
comparison graph, and rank/tiebreak determinism.
"""

from __future__ import annotations

from collections import Counter, defaultdict

import pandas as pd

from wri_data_processing_spark import registry

registry.load_all()

_S = 1_000_000
_S2 = _S * _S
_ROUNDS = 3


def _replay(sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "event_type"])
    uc = Counter(zip(ev["user_id"], ev["event_type"]))
    by_user = defaultdict(dict)
    for (u, t), c in uc.items():
        by_user[u][t] = c
    wins = Counter()
    for counts in by_user.values():
        types = sorted(counts)
        for i in types:
            for j in types:
                if i != j and counts[i] > counts[j]:
                    wins[(i, j)] += 1
    games = Counter()
    for (i, j), w in wins.items():
        games[(i, j)] += w
        games[(j, i)] += w
    items = sorted({i for i, _ in games})
    w_tot = {i: sum(w for (a, _), w in wins.items() if a == i) for i in items}
    p = {i: _S for i in items}
    for _ in range(_ROUNDS):
        den = {
            i: sum(
                games[(i, j)] * _S2 // (p[i] + p[j])
                for j in items
                if (i, j) in games
            )
            for i in items
        }
        praw = {i: (w_tot[i] * _S2 // den[i] if den[i] > 0 else 0) for i in items}
        tot = sum(praw.values())
        k = len(items)
        p = {i: praw[i] * k * _S // tot for i in items}
    return p, w_tot


class TestBradleyTerryKnownAnswer:
    def test_strengths_bit_exact(self, spark, sf_dir):
        want, _ = _replay(sf_dir)
        rows = registry.REGISTRY["eval_bradley_terry"](spark, sf_dir).collect()
        got = {r["event_type"]: r["strength_q"] for r in rows}
        assert got == want
        # ranks: strictly by strength desc, event_type tiebreak
        order = sorted(got, key=lambda t: (-got[t], t))
        assert {r["event_type"]: r["bt_rank"] for r in rows} == {
            t: k + 1 for k, t in enumerate(order)
        }
        # float projection is the exact integer divided once
        for r in rows:
            assert r["strength"] == r["strength_q"] / _S

    def test_mean_one_normalization(self, spark, sf_dir):
        rows = registry.REGISTRY["eval_bradley_terry"](spark, sf_dir).collect()
        k = len(rows)
        total = sum(r["strength_q"] for r in rows)
        # each item truncates at most 1 unit below the exact normalized
        # value, so the mean sits within k units of S
        assert k * _S - k <= total <= k * _S

    def test_strength_tracks_wins_on_complete_graph(self, spark, sf_dir):
        # The duel graph over event types is complete and near-balanced in
        # games, so BT strength order must agree with total-win order.
        want, w_tot = _replay(sf_dir)
        assert sorted(want, key=lambda t: (-want[t], t)) == sorted(
            w_tot, key=lambda t: (-w_tot[t], t)
        )
