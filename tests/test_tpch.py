"""Relational analytics queries: plan shape at scale (pricing_summary,
shipping_priority). Values are oracle-checked by the driver gate; these
tests pin the physical plan properties that matter at 100 TB."""

from __future__ import annotations

import pytest

from dedupe_spark.plans import pushed_filters
from dedupe_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def test_pricing_summary_filter_reaches_scan(spark):
    q = QUERIES["pricing_summary"](spark, SF)
    assert "l_shipdate" in " ".join(pushed_filters(q))
    plan = q._jdf.queryExecution().executedPlan().toString()
    # map-side partial agg + one exchange on the grouping key, no more
    assert plan.count("Exchange hashpartitioning") == 1


def test_shipping_priority_broadcasts_dims(spark):
    q = QUERIES["shipping_priority"](spark, SF)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan  # the fact table never shuffles to join
    assert "TakeOrderedAndProject" in plan  # top-k, not a global sort
    pf = " ".join(pushed_filters(q))
    assert "l_shipdate" in pf and "o_orderdate" in pf and "c_mktsegment" in pf


def test_shipping_priority_values_sane(spark):
    rows = QUERIES["shipping_priority"](spark, SF).collect()
    assert len(rows) == 10
    revs = [r["revenue"] for r in rows]
    assert revs == sorted(revs, reverse=True)
    assert all(r["revenue"] > 0 for r in rows)


def test_local_supplier_volume_plan_and_values(spark):
    """Q5 shape: all five dim joins execute broadcast-side — the lineitem
    fact never shuffles to join — and the region/date filters reach the
    parquet scans."""
    q = QUERIES["local_supplier_volume"](spark, SF)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 4
    assert "SortMergeJoin" not in plan
    pf = " ".join(pushed_filters(q))
    assert "o_orderdate" in pf and "r_name" in pf
    rows = q.collect()
    assert len(rows) >= 1
    assert all(r["revenue"] > 0 and r["n_lineitems"] > 0 for r in rows)


def test_large_order_customers_agg_before_join(spark):
    """Q18 shape: the qualifying-set aggregation is map-side combined
    (partial_sum before its exchange) and the HAVING filter runs on the
    aggregated relation BEFORE the joins — the plan property that keeps
    the join inputs small when nothing is broadcastable by size."""
    q = QUERIES["large_order_customers"](spark, SF)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "partial_sum" in plan
    assert "sum_qty" in plan
    rows = q.collect()
    assert len(rows) == 99
    assert all(r["sum_qty"] > 200 for r in rows)


def test_small_quantity_revenue_exact_predicate_and_plan(spark):
    """Q17 shape: the brand slice and the per-part aggregate both join
    broadcast-side (the fact never shuffles), the brand filter reaches
    the part scan, and the 0.2*avg predicate is exact integer math —
    verified against a float-division reference computation."""
    q = QUERIES["small_quantity_revenue"](spark, SF)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan
    assert "p_brand" in " ".join(pushed_filters(q))
    rows = {r["p_brand"]: r for r in q.collect()}
    assert set(rows) == {"Brand#5", "Brand#14", "Brand#23"}
    # float-division reference for one brand: identical row count
    import pandas as pd

    li = pd.read_parquet(SF + "/lineitem.parquet")
    part = pd.read_parquet(SF + "/part.parquet")
    b = li.merge(part[part.p_brand == "Brand#23"], left_on="l_partkey", right_on="p_partkey")
    avg = b.groupby("l_partkey").l_quantity.transform("mean")
    assert rows["Brand#23"]["n_small"] == int((b.l_quantity < 0.2 * avg).sum())


def test_late_ship_priority_semi_join(spark):
    """Q4 shape: left-semi join (each order emitted at most once, no
    distinct operator in the plan), date filter pushed to the orders
    scan, and every priority count bounded by the window's order count."""
    q = QUERIES["late_ship_priority"](spark, SF)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan
    assert "HashAggregate" in plan
    pf = " ".join(pushed_filters(q))
    assert "o_orderdate" in pf
    rows = q.collect()
    assert len(rows) == 5 and all(r["n_orders"] > 0 for r in rows)


def test_supplier_diversity_anti_join_and_distinct_agg(spark):
    """Q16 shape: the NOT-IN exclusion runs as a broadcast LEFT ANTI
    (no null-aware subquery machinery needed on non-nullable keys), the
    size filter reaches the part scan, and count(DISTINCT) plans as the
    two-level aggregate — a partial dedup on (group, suppkey) before the
    exchange, so the shuffle carries distinct pairs, not lineitem rows."""
    q = QUERIES["supplier_diversity"](spark, SF)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan
    assert plan.count("BroadcastHashJoin") >= 1
    assert "p_size" in " ".join(pushed_filters(q))
    # two-level distinct: an aggregate keyed by (brand, type, suppkey)
    # BEFORE the final count — visible as two HashAggregate layers with
    # l_suppkey in the upper one's keys
    assert plan.count("HashAggregate") >= 3
    assert "l_suppkey" in plan.split("HashAggregate")[1]
    rows = q.collect()
    assert len(rows) >= 10
    assert all(r["supplier_cnt"] > 0 for r in rows)


def test_waiting_suppliers_semi_anti_self_join(spark):
    """Q21 shape: the EXISTS runs as a LeftSemi and the NOT EXISTS as a
    LeftAnti over the same orderkey-partitioned flagged relation, the
    status filter reaches the orders scan, and every supplier's waiting
    count is positive."""
    q = QUERIES["waiting_suppliers"](spark, SF)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
    assert "o_orderstatus" in " ".join(pushed_filters(q))
    rows = q.collect()
    assert len(rows) > 0 and all(r["numwait"] > 0 for r in rows)


def test_waiting_suppliers_values_vs_pandas(spark):
    """Brute-force pandas re-derivation of the exists/not-exists
    semantics at sf0.001."""
    import pandas as pd

    li = pd.read_parquet(SF + "/lineitem.parquet")
    orders = pd.read_parquet(SF + "/orders.parquet")
    f = li.merge(
        orders[orders.o_orderstatus == "F"][["o_orderkey", "o_orderdate"]],
        left_on="l_orderkey",
        right_on="o_orderkey",
    )
    f["late"] = f.l_shipdate > f.o_orderdate + pd.Timedelta(days=60)
    nsupp = f.groupby("l_orderkey").l_suppkey.nunique()
    nlate = f[f.late].groupby("l_orderkey").l_suppkey.nunique()
    expect: dict[int, int] = {}
    for _, r in f[f.late].iterrows():
        ok = r.l_orderkey
        if nsupp.get(ok, 0) > 1 and nlate.get(ok, 0) == 1:
            expect[r.l_suppkey] = expect.get(r.l_suppkey, 0) + 1
    sup = pd.read_parquet(SF + "/supplier.parquet")
    name = dict(zip(sup.s_suppkey, sup.s_name))
    got = {
        r["s_name"]: r["numwait"]
        for r in QUERIES["waiting_suppliers"](spark, SF).collect()
    }
    assert got == {name[k]: v for k, v in expect.items()}


def test_idle_rich_customers_anti_join(spark):
    """Q22 shape: recency filter pushed to the orders scan before the
    LeftAnti; the above-average predicate stays in exact int64
    (no float division in the plan's filter)."""
    q = QUERIES["idle_rich_customers"](spark, SF)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan
    assert "o_orderdate" in " ".join(pushed_filters(q))
    rows = q.collect()
    assert sum(r["numcust"] for r in rows) == 5  # sf0.001 dormant-rich count
    assert all(r["total_bal_cents"] > 0 for r in rows)


def test_nation_trade_volume_plan_and_values(spark):
    """Q7 shape: both dims broadcast with their nation filters pushed,
    the ship window pushed to the lineitem scan, no SortMergeJoin for
    the dim joins, and values match a pandas re-derivation."""
    import pandas as pd

    q = QUERIES["nation_trade_volume"](spark, SF)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 3
    pf = " ".join(pushed_filters(q))
    assert "l_shipdate" in pf and "s_nationkey" in pf and "c_nationkey" in pf
    rows = {
        (r["supp_nation"], r["cust_nation"], r["ship_year"]): r["revenue"]
        for r in q.collect()
    }
    li = pd.read_parquet(SF + "/lineitem.parquet")
    orders = pd.read_parquet(SF + "/orders.parquet")
    sup = pd.read_parquet(SF + "/supplier.parquet")
    cust = pd.read_parquet(SF + "/customer.parquet")
    j = (
        li[(li.l_shipdate >= "1996-01-01") & (li.l_shipdate < "1998-01-01")]
        .merge(sup[sup.s_nationkey.isin([3, 8])], left_on="l_suppkey", right_on="s_suppkey")
        .merge(orders, left_on="l_orderkey", right_on="o_orderkey")
        .merge(cust[cust.c_nationkey.isin([3, 8])], left_on="o_custkey", right_on="c_custkey")
    )
    j = j[j.s_nationkey != j.c_nationkey]
    j["rev_bp"] = (j.l_extendedprice * 100.0).round().astype("int64") * (
        100 - (j.l_discount * 100.0).round().astype("int64")
    )
    ref = j.groupby(
        ["s_nationkey", "c_nationkey", j.l_shipdate.dt.year]
    ).rev_bp.sum()
    assert len(rows) == len(ref)
    for (sn, cn, yr), bp in ref.items():
        key = (f"NATION_{sn}", f"NATION_{cn}", yr)
        assert abs(rows[key] - bp / 10000.0) < 1e-6


def test_revenue_forecast_pushdown(spark):
    """Q6 shape: all three predicates reach the scan; value vs pandas."""
    import pandas as pd

    q = QUERIES["revenue_forecast"](spark, SF)
    pf = " ".join(pushed_filters(q))
    assert "l_shipdate" in pf and "l_discount" in pf and "l_quantity" in pf
    li = pd.read_parquet(SF + "/lineitem.parquet")
    m = li[
        (li.l_shipdate >= "1996-01-01")
        & (li.l_shipdate < "1997-01-01")
        & (li.l_discount >= 0.05)
        & (li.l_discount <= 0.07)
        & (li.l_quantity < 24)
    ]
    bp = (
        (m.l_extendedprice * 100.0).round().astype("int64")
        * (m.l_discount * 100.0).round().astype("int64")
    ).sum()
    assert abs(q.collect()[0]["revenue"] - bp / 10000.0) < 1e-6


def test_order_count_histogram_zero_bucket(spark):
    """Q13 shape: the LEFT join keeps zero-order customers — the zero
    bucket must exist iff some customer has only urgent orders (or
    none), and bucket totals must sum to the customer count."""
    q = QUERIES["order_count_histogram"](spark, SF)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "LeftOuter" in plan
    rows = {r["c_count"]: r["custdist"] for r in q.collect()}
    assert sum(rows.values()) == 150  # sf0.001 customers
    import pandas as pd

    orders = pd.read_parquet(SF + "/orders.parquet")
    cust = pd.read_parquet(SF + "/customer.parquet")
    per = (
        orders[orders.o_orderpriority != "1-URGENT"]
        .groupby("o_custkey")
        .size()
        .reindex(cust.c_custkey, fill_value=0)
    )
    expect = per.value_counts().to_dict()
    assert rows == {int(k): int(v) for k, v in expect.items()}


def test_top_supplier_is_argmax(spark):
    import pandas as pd

    rows = QUERIES["top_supplier"](spark, SF).collect()
    li = pd.read_parquet(SF + "/lineitem.parquet")
    m = li[(li.l_shipdate >= "1996-01-01") & (li.l_shipdate < "1996-04-01")]
    bp = (
        (m.l_extendedprice * 100.0).round().astype("int64")
        * (100 - (m.l_discount * 100.0).round().astype("int64"))
    ).groupby(m.l_suppkey).sum()
    assert {r["s_suppkey"] for r in rows} == set(
        bp[bp == bp.max()].index
    )
    assert all(abs(r["total_revenue"] - bp.max() / 1e4) < 1e-6 for r in rows)


def test_bracket_revenue_vs_pandas(spark):
    import pandas as pd

    r = QUERIES["bracket_revenue"](spark, SF).collect()[0]
    li = pd.read_parquet(SF + "/lineitem.parquet")
    part = pd.read_parquet(SF + "/part.parquet")
    j = li.merge(part, left_on="l_partkey", right_on="p_partkey")
    m = (
        ((j.p_brand == "Brand#13") & (j.p_size <= 5)
         & j.l_quantity.between(1, 11))
        | ((j.p_brand == "Brand#20") & (j.p_size <= 10)
           & j.l_quantity.between(10, 20))
        | ((j.p_brand == "Brand#23") & (j.p_size <= 15)
           & j.l_quantity.between(20, 30))
    )
    sel = j[m]
    assert r["n_lines"] == len(sel)
    bp = (
        (sel.l_extendedprice * 100.0).round().astype("int64")
        * (100 - (sel.l_discount * 100.0).round().astype("int64"))
    ).sum()
    assert abs(r["revenue"] - bp / 1e4) < 1e-6


def test_market_share_bounds(spark):
    rows = QUERIES["market_share"](spark, SF).collect()
    assert {r["o_year"] for r in rows} == {1996, 1997}
    assert all(0 <= r["mkt_share"] <= 1 for r in rows)


# --- TPC-H shape family completion (Q2 / Q9 / Q11 / Q12 / Q20 shapes) ---


def test_min_cost_supplier_plan_and_ties(spark):
    """Q2 shape: the fact never joins anything un-aggregated — every join
    in the plan is broadcast-side or semi, and the top-100 is a
    TakeOrderedAndProject, not a global sort."""
    q = QUERIES["min_cost_supplier"](spark, SF)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "TakeOrderedAndProject" in plan
    pf = " ".join(pushed_filters(q))
    assert "p_type" in pf and "r_name" in pf
    rows = q.collect()
    # every returned row IS a per-part minimum: check against pandas
    import pandas as pd

    li = pd.read_parquet(SF + "/lineitem.parquet")
    li["cents"] = (li.l_extendedprice * 100.0).round().astype("int64")
    mins = li.groupby("l_partkey").cents.min()
    for r in rows:
        assert r["cost_cents"] >= mins.loc[r["p_partkey"]]


def test_nation_profit_pushdown_and_total(spark):
    """Q9 shape: the part-name filter reaches the part scan, and the
    per-(nation, year) profits sum to the unpartitioned total."""
    q = QUERIES["nation_profit"](spark, SF)
    assert any("p_name" in f for f in pushed_filters(q))
    import pandas as pd

    rows = q.collect()
    li = pd.read_parquet(SF + "/lineitem.parquet")
    part = pd.read_parquet(SF + "/part.parquet")
    red = li[li.l_partkey.isin(part[part.p_name.str.contains("red")].p_partkey)]
    assert sum(r["n_lineitems"] for r in rows) == len(red)
    years = {r["o_year"] for r in rows}
    assert years and all(1995 <= y <= 2001 for y in years)


def test_important_parts_scalar_allowance_and_share(spark):
    """Q11 shape: the 1-row global total may appear as the scalar
    broadcast pair (nested-loop join + single-partition exchange) and
    nothing else; every kept part really holds >3x the mean part
    value (the scale-stable frontier — a fixed share empties at 100x)."""
    from dedupe_spark.plans.explain import lint_plan

    q = QUERIES["important_parts"](spark, SF)
    codes = {f["code"] for f in lint_plan(q)}
    assert codes <= {"nested_loop_join", "single_partition_exchange"}, codes
    rows = q.collect()
    assert rows
    vals = [r["part_value_u"] for r in rows]
    assert vals == sorted(vals, reverse=True)
    import pandas as pd

    li = pd.read_parquet(SF + "/lineitem.parquet")
    supp = pd.read_parquet(SF + "/supplier.parquet")
    nat = li[li.l_suppkey.isin(supp[supp.s_nationkey == 3].s_suppkey)].copy()
    nat["value_u"] = (nat.l_extendedprice * 100.0).round().astype(
        "int64"
    ) * nat.l_quantity.astype("int64")
    total = nat.value_u.sum()
    per_part = nat.groupby("l_partkey").value_u.sum()
    expected = per_part[per_part * len(per_part) > 3 * total]
    assert len(rows) == len(expected)


def test_returnflag_priority_pushdown_and_counts(spark):
    """Q12 shape: BOTH lineitem predicates (date window + flag
    whitelist) reach the scan; high+low counts equal the joined row
    count per flag."""
    q = QUERIES["returnflag_priority"](spark, SF)
    pf = " ".join(pushed_filters(q))
    assert "l_shipdate" in pf and "l_returnflag" in pf
    rows = {r["l_returnflag"]: r for r in q.collect()}
    assert set(rows) == {"R", "A"}
    import pandas as pd

    li = pd.read_parquet(SF + "/lineitem.parquet")
    sel = li[
        (li.l_shipdate >= "1997-01-01")
        & (li.l_shipdate < "1998-01-01")
        & li.l_returnflag.isin(["R", "A"])
    ]
    for flag, r in rows.items():
        assert r["high_line_count"] + r["low_line_count"] == (
            sel.l_returnflag == flag
        ).sum()


def test_dominant_suppliers_semi_join_and_majority(spark):
    """Q20 shape: the supplier dim is reduced by a LEFT-SEMI against the
    nested-aggregation frontier, and every returned supplier really
    shipped a strict majority of some small-part's windowed total."""
    q = QUERIES["dominant_suppliers"](spark, SF)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan
    import pandas as pd

    li = pd.read_parquet(SF + "/lineitem.parquet")
    part = pd.read_parquet(SF + "/part.parquet")
    w = li[
        (li.l_shipdate >= "1997-01-01")
        & (li.l_shipdate < "1998-01-01")
        & li.l_partkey.isin(part[part.p_name.str.startswith("small")].p_partkey)
    ]
    sq = w.groupby(["l_partkey", "l_suppkey"]).l_quantity.sum()
    pt = w.groupby("l_partkey").l_quantity.sum()
    dom = {
        sk
        for (pk, sk), v in sq.items()
        if 2 * v > pt.loc[pk]
    }
    for r in q.collect():
        assert r["s_suppkey"] in dom
