"""Round-12 known-answer certification, wave 19: join semantics — the
family where NULL handling and existence quantification are the classic
shared-misreading territory.

Pure pandas/Python replays: anti (NOT IN with no NULLs in play),
semi-with-predicate, mark (EXISTS as a column — negatives KEPT, no
duplication on multiple matches), null-safe equality (NULL keys match
each other, counted exactly), full-outer null sides, the broadcast-left
fact-preserving enrichment, correlated-subquery decorrelation, lateral
top-2-per-customer with the tie rule, and wide-to-long unpivot."""

from __future__ import annotations

from collections import Counter, defaultdict
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd

from wri_data_processing_spark import registry

registry.load_all()


def _dec6(x) -> Decimal:
    return Decimal(x).quantize(Decimal("0.000001"), ROUND_HALF_UP)


def _orders(sf_dir, cols):
    return pd.read_parquet(f"{sf_dir}/orders.parquet", columns=cols)


class TestExistenceJoins:
    def test_anti_semi_mark(self, spark, sf_dir):
        c = pd.read_parquet(
            f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
        )
        o = _orders(sf_dir, ["o_custkey", "o_totalprice"])
        big_buyers = set(
            int(k) for k, p in zip(o["o_custkey"], o["o_totalprice"]) if p > 100000
        )
        op = pd.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderpriority"]
        )
        urgent_buyers = set(
            int(k)
            for k, pr in zip(op["o_custkey"], op["o_orderpriority"])
            if pr == "1-URGENT"
        )
        custs = [int(k) for k in c["c_custkey"]]

        got_anti = sorted(
            r["c_custkey"]
            for r in registry.REGISTRY["join_left_anti"](spark, sf_dir).collect()
        )
        # r12 liveness fix: anti against URGENT orders (the unpredicated
        # form was structurally empty — every customer has orders)
        assert got_anti == sorted(k for k in custs if k not in urgent_buyers)
        assert got_anti  # live at every driver SF

        seg = dict(zip((int(k) for k in c["c_custkey"]), c["c_mktsegment"]))
        got_semi = sorted(
            (r["c_custkey"], r["c_mktsegment"])
            for r in registry.REGISTRY["join_left_semi"](spark, sf_dir).collect()
        )
        assert got_semi == sorted((k, seg[k]) for k in custs if k in big_buyers)

        got_mark = {
            r["c_custkey"]: r["has_big_order"]
            for r in registry.REGISTRY["join_left_mark"](spark, sf_dir).collect()
        }
        # EVERY customer keeps exactly one row; the flag is the feature
        assert set(got_mark) == set(custs)
        for k in custs:
            assert got_mark[k] == (k in big_buyers)
        # liveness: the flag is true somewhere (at sf0.001 every customer
        # happens to have a big order, so all-True is legitimate there)
        assert any(got_mark.values())

    def test_null_safe(self, spark, sf_dir):
        e = pd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "user_id"])
        c = pd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey"])
        dkeys = {
            None if int(k) % 7 == 0 else int(k) for k in c["c_custkey"]
        }
        want = Counter()
        for eid, uid in zip(e["event_id"], e["user_id"]):
            key = None if int(eid) % 7 == 0 else int(uid)
            if key in dkeys:  # NULL matches NULL under <=>
                want[key] += 1
        got = {
            r["uid"]: r["n"]
            for r in registry.REGISTRY["join_null_safe"](spark, sf_dir).collect()
        }
        assert got == dict(want)
        # the NULL bucket is live: NULL keys matched instead of vanishing
        assert None in got and got[None] > 0

    def test_full_outer(self, spark, sf_dir):
        c = pd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_nationkey"])
        s = pd.read_parquet(f"{sf_dir}/supplier.parquet", columns=["s_nationkey"])
        nc = Counter(int(k) for k in c["c_nationkey"])
        ns = Counter(int(k) for k in s["s_nationkey"])
        want = {}
        for k in set(nc) | set(ns):
            want[
                (k if k in nc else None, k if k in ns else None)
            ] = (nc.get(k, 0), ns.get(k, 0))
        got = {
            (r["c_nation"], r["s_nation"]): (r["n_cust"], r["n_supp"])
            for r in registry.REGISTRY["join_full_outer"](spark, sf_dir).collect()
        }
        assert got == want


class TestEnrichmentAndCorrelation:
    def test_broadcast_left_preserves_fact(self, spark, sf_dir):
        li = pd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_quantity"])
        p = pd.read_parquet(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"])
        brand = dict(zip((int(k) for k in p["p_partkey"]), p["p_brand"]))
        agg = defaultdict(lambda: [0, Decimal(0)])
        for pk, q in zip(li["l_partkey"], li["l_quantity"]):
            cell = agg[brand.get(int(pk))]  # None group keeps orphan facts
            cell[0] += 1
            cell[1] += _dec6(float(q))
        got = {
            r["p_brand"]: (r["n_items"], r["sum_qty"])
            for r in registry.REGISTRY["join_broadcast_left"](spark, sf_dir).collect()
        }
        assert got == {b: (n, float(s)) for b, (n, s) in agg.items()}
        # fact rows are conserved across the left join + group
        assert sum(n for n, _ in got.values()) == len(li)

    def test_correlated_subquery(self, spark, sf_dir):
        o = _orders(sf_dir, ["o_orderkey", "o_custkey", "o_totalprice"])
        sums = defaultdict(lambda: [Decimal(0), 0])
        for ck, tp in zip(o["o_custkey"], o["o_totalprice"]):
            cell = sums[int(ck)]
            cell[0] += _dec6(float(tp))
            cell[1] += 1
        avg = {k: float(s) / n for k, (s, n) in sums.items()}
        want = {
            int(ok): (int(ck), tp, avg[int(ck)])
            for ok, ck, tp in zip(o["o_orderkey"], o["o_custkey"], o["o_totalprice"])
            if tp > avg[int(ck)]
        }
        got = {
            r["o_orderkey"]: (r["o_custkey"], r["o_totalprice"], r["cust_avg"])
            for r in registry.REGISTRY["subquery_correlated"](spark, sf_dir).collect()
        }
        assert got == want and want

    def test_lateral_top2(self, spark, sf_dir):
        o = _orders(sf_dir, ["o_orderkey", "o_custkey", "o_totalprice"])
        per = defaultdict(list)
        for ok, ck, tp in zip(o["o_orderkey"], o["o_custkey"], o["o_totalprice"]):
            per[int(ck)].append((-tp, int(ok)))
        want = set()
        for ck, lst in per.items():
            for negp, ok in sorted(lst)[:2]:
                want.add((ck, ok, -negp))
        got = {
            (r["c_custkey"], r["o_orderkey"], r["o_totalprice"])
            for r in registry.REGISTRY["join_lateral"](spark, sf_dir).collect()
        }
        assert got == want and want


class TestReshape:
    def test_unpivot(self, spark, sf_dir):
        li = pd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_returnflag", "l_quantity", "l_extendedprice", "l_discount"],
        )
        agg = defaultdict(lambda: [Decimal(0), Decimal(0), Decimal(0)])
        for rf, q, ep, d in zip(
            li["l_returnflag"], li["l_quantity"], li["l_extendedprice"], li["l_discount"]
        ):
            cell = agg[rf]
            cell[0] += _dec6(float(q))
            cell[1] += _dec6(float(ep))
            cell[2] += _dec6(float(d))
        want = {}
        for rf, (q, ep, d) in agg.items():
            want[(rf, "sum_qty")] = float(q)
            want[(rf, "sum_base_price")] = float(ep)
            want[(rf, "sum_discount")] = float(d)
        got = {
            (r["l_returnflag"], r["metric"]): r["value"]
            for r in registry.REGISTRY["unpivot_melt"](spark, sf_dir).collect()
        }
        assert got == want
