"""Round-12 known-answer certification, wave 17: relational semantics
with live misinterpretation risk — the null-marker algebra of
ROLLUP/GROUPING SETS, bag-vs-set semantics of the set operators, NTILE's
uneven-bucket rule, percent_rank/cume_dist tie handling, frame-edge
window functions, and total-order top-k.

These families are natively implemented on both engines, so the
engine↔oracle comparison is already two independent implementations —
this wave pins the SEMANTICS themselves against first-principles pandas
re-derivations (e.g. NTILE's first-(n mod k)-buckets-get-the-extra-row
rule is restated and recomputed, not trusted)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd

from wri_data_processing_spark import registry

registry.load_all()


def _dec6(x) -> Decimal:
    return Decimal(x).quantize(Decimal("0.000001"), ROUND_HALF_UP)


class TestSuperAggregates:
    def test_rollup(self, spark, sf_dir):
        li = pd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_returnflag", "l_linestatus", "l_quantity"],
        )
        want = {}
        # level 0: (rf, ls); level 1: (rf, NULL); level 2: (NULL, NULL)
        cells = defaultdict(lambda: [0, Decimal(0)])
        for rf, ls, q in zip(li["l_returnflag"], li["l_linestatus"], li["l_quantity"]):
            d = _dec6(float(q))
            for key in ((rf, ls), (rf, None), (None, None)):
                cells[key][0] += 1
                cells[key][1] += d
        for key, (n, s) in cells.items():
            want[key] = (n, float(s))
        got = {
            (r["l_returnflag"], r["l_linestatus"]): (r["n"], r["sum_qty"])
            for r in registry.REGISTRY["agg_cube_rollup"](spark, sf_dir).collect()
        }
        assert got == want

    def test_grouping_sets(self, spark, sf_dir):
        li = pd.read_parquet(
            f"{sf_dir}/lineitem.parquet", columns=["l_returnflag", "l_linestatus"]
        )
        want = {}
        for rf, n in Counter(li["l_returnflag"]).items():
            want[(rf, None, 0, 1)] = n
        for ls, n in Counter(li["l_linestatus"]).items():
            want[(None, ls, 1, 0)] = n
        want[(None, None, 1, 1)] = len(li)
        got = {
            (r["l_returnflag"], r["l_linestatus"], r["g_rf"], r["g_ls"]): r["n"]
            for r in registry.REGISTRY["agg_grouping_sets"](spark, sf_dir).collect()
        }
        assert got == want


class TestSetOperators:
    def test_semantics(self, spark, sf_dir):
        c = pd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_nationkey", "c_custkey"])
        s = pd.read_parquet(f"{sf_dir}/supplier.parquet", columns=["s_nationkey"])
        cset = set(int(x) for x in c["c_nationkey"])
        sset = set(int(x) for x in s["s_nationkey"])
        ev = pd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
        # EXCEPT / INTERSECT are SET (distinct) operators; set_except's
        # operands are custkeys-minus-event-users (r12 liveness fix — the
        # nations pairing was empty at sf0.01)
        got_ex = [
            r["custkey"]
            for r in registry.REGISTRY["set_except"](spark, sf_dir).collect()
        ]
        want_ex = set(int(x) for x in c["c_custkey"]) - set(int(x) for x in ev["user_id"])
        assert sorted(got_ex) == sorted(want_ex)
        assert len(got_ex) == len(set(got_ex))  # no duplicates survive
        assert got_ex  # live at every driver SF
        got_in = [
            r["nationkey"]
            for r in registry.REGISTRY["set_intersect"](spark, sf_dir).collect()
        ]
        assert sorted(got_in) == sorted(cset & sset)
        assert len(got_in) == len(set(got_in))
        # UNION ALL is a BAG operator: exact multiset concatenation
        got_u = Counter(
            (r["nationkey"], r["kind"])
            for r in registry.REGISTRY["set_union_all"](spark, sf_dir).collect()
        )
        want_u = Counter(
            [(int(x), "customer") for x in c["c_nationkey"]]
            + [(int(x), "supplier") for x in s["s_nationkey"]]
        )
        assert got_u == want_u


class TestDistributionWindows:
    def test_ntile_percent_rank_cume(self, spark, sf_dir):
        c = pd.read_parquet(
            f"{sf_dir}/customer.parquet",
            columns=["c_mktsegment", "c_custkey", "c_acctbal"],
        )
        got = {
            r["c_custkey"]: r
            for r in registry.REGISTRY["window_ntile"](spark, sf_dir).collect()
        }
        for seg, grp in c.groupby("c_mktsegment"):
            rows = sorted(zip(grp["c_acctbal"], grp["c_custkey"]))
            n = len(rows)
            base, extra = divmod(n, 4)
            for pos, (bal, ck) in enumerate(rows):
                # NTILE: first `extra` buckets get base+1 rows
                if pos < extra * (base + 1):
                    q = pos // (base + 1) + 1
                else:
                    q = extra + (pos - extra * (base + 1)) // base + 1
                r = got[int(ck)]
                assert r["quartile"] == q, (seg, ck)
                # order key (acctbal, custkey) is unique: rank == pos+1
                assert r["pct_rank"] == (pos / (n - 1) if n > 1 else 0.0)
                assert r["cume"] == (pos + 1) / n

    def test_percent_rank_with_ties(self, spark, sf_dir):
        o = pd.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderpriority", "o_orderkey", "o_totalprice"],
        )
        got = {
            r["o_orderkey"]: r
            for r in registry.REGISTRY["window_percent_rank"](spark, sf_dir).collect()
        }
        for pri, grp in o.groupby("o_orderpriority"):
            prices = sorted(grp["o_totalprice"])
            n = len(prices)
            import bisect

            for ok, price in zip(grp["o_orderkey"], grp["o_totalprice"]):
                rank = bisect.bisect_left(prices, price) + 1  # min rank of peers
                peers_le = bisect.bisect_right(prices, price)
                r = got[int(ok)]
                assert r["pct_rank"] == ((rank - 1) / (n - 1) if n > 1 else 0.0)
                assert r["cume"] == peers_le / n

    def test_first_last_nth(self, spark, sf_dir):
        e = pd.read_parquet(
            f"{sf_dir}/events.parquet", columns=["user_id", "event_id", "ts", "value"]
        )
        got = {
            r["event_id"]: (r["first_val"], r["last_val"], r["second_val"])
            for r in registry.REGISTRY["window_first_last"](spark, sf_dir).collect()
        }
        for uid, grp in e.groupby("user_id"):
            seq = sorted(zip(grp["ts"], grp["event_id"], grp["value"]))
            first = seq[0][2]
            last = seq[-1][2]
            second = seq[1][2] if len(seq) > 1 else None
            for _, eid, _ in seq:
                assert got[int(eid)] == (first, last, second), (uid, eid)


class TestOrderingTail:
    def test_top_k_total_order(self, spark, sf_dir):
        li = pd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_linenumber", "l_extendedprice"],
        )
        want = sorted(
            zip(-li["l_extendedprice"], li["l_orderkey"], li["l_linenumber"])
        )[:20]
        want = [(int(ok), int(ln), -p) for p, ok, ln in want]
        got = [
            (r["l_orderkey"], r["l_linenumber"], r["l_extendedprice"])
            for r in registry.REGISTRY["top_k"](spark, sf_dir).collect()
        ]
        assert got == want

    def test_first_value(self, spark, sf_dir):
        o = pd.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderdate"]
        )
        got = {
            r["o_custkey"]: (r["first_orderdate"], r["last_orderdate"])
            for r in registry.REGISTRY["agg_first_value"](spark, sf_dir).collect()
        }
        fmt = lambda d: pd.Timestamp(d).strftime("%Y-%m-%d %H:%M:%S")
        for ck, grp in o.groupby("o_custkey"):
            assert got[int(ck)] == (
                fmt(grp["o_orderdate"].min()),
                fmt(grp["o_orderdate"].max()),
            )
