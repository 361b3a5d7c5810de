"""operators/graph.pagerank: exact parity with an independent pure-Python
reference, dangling/isolated semantics, partitioning invariance, mass
conservation."""

from __future__ import annotations

from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from dedupe_spark.operators.graph import k_core, pagerank, triangle_counts

SCALE = 10**12


def ref_pagerank(nodes, edges, iters=8, d=85, scale=SCALE):
    """Driver-side re-derivation in plain dict/loop Python — shares no
    code with the operator; `//` is the contract's int64 div."""
    out = defaultdict(list)
    for s, t in edges:
        out[s].append(t)
    n = len(nodes)
    rank = {v: scale // n for v in nodes}
    base = (100 - d) * scale // (100 * n)
    for _ in range(iters):
        s = {v: 0 for v in nodes}
        dang = 0
        for u in nodes:
            if out[u]:
                c = rank[u] // len(out[u])
                for v in out[u]:
                    s[v] += c
            else:
                dang += rank[u]
        rank = {v: base + (d * (s[v] + dang // n)) // 100 for v in nodes}
    return rank


def _run(spark, nodes, edges, **kw):
    e = spark.createDataFrame(
        edges or [(0, 0)], "src long, dst long"
    )
    if not edges:
        e = e.where(F.lit(False))
    nd = spark.createDataFrame([(v,) for v in nodes], "node long")
    got = pagerank(e, nd, **kw).collect()
    return {r["node"]: r["rank_micro"] for r in got}


# a diamond with a dangling sink (3), an isolated vertex (4) and a
# self-reinforcing hub (0 <- 1,2)
GRAPH = [(0, 1), (0, 2), (1, 2), (1, 0), (2, 0), (2, 3)]
NODES = [0, 1, 2, 3, 4]


def test_matches_reference_exactly(spark):
    got = _run(spark, NODES, GRAPH)
    want = ref_pagerank(NODES, GRAPH)
    assert got == want


def test_undirected_star_center_dominates(spark):
    # undirected 1-center star: the hub out-ranks every leaf
    pairs = [(0, i) for i in range(1, 8)]
    edges = pairs + [(b, a) for a, b in pairs]
    nodes = list(range(8))
    got = _run(spark, nodes, edges)
    want = ref_pagerank(nodes, edges)
    assert got == want
    assert got[0] == max(got.values())
    leaf = {got[i] for i in range(1, 8)}
    assert len(leaf) == 1 and got[0] > leaf.pop()


def test_dangling_mass_redistributed(spark):
    # 0 -> 1, 1 dangling: without redistribution vertex 0 would decay to
    # the teleport floor only; with it, 1's mass returns uniformly
    nodes = [0, 1]
    got = _run(spark, nodes, [(0, 1)])
    want = ref_pagerank(nodes, [(0, 1)])
    assert got == want
    total = sum(got.values())
    # mass conserved up to floor losses: a handful of divisions per
    # vertex per iteration, each losing < 1 micro-unit
    assert SCALE * 0.999 <= total <= SCALE


def test_no_edges_all_teleport(spark):
    nodes = [1, 2, 3]
    got = _run(spark, nodes, [])
    want = ref_pagerank(nodes, [])
    assert got == want
    assert len(set(got.values())) == 1


def test_partitioning_invariance(spark):
    e = spark.createDataFrame(GRAPH, "src long, dst long")
    nd = spark.createDataFrame([(v,) for v in NODES], "node long")
    a = {
        r["node"]: r["rank_micro"]
        for r in pagerank(e.repartition(7), nd.repartition(3)).collect()
    }
    b = {
        r["node"]: r["rank_micro"]
        for r in pagerank(e.coalesce(1), nd.coalesce(1), checkpoint=False).collect()
    }
    assert a == b == ref_pagerank(NODES, GRAPH)


def test_damping_validation(spark):
    e = spark.createDataFrame(GRAPH, "src long, dst long")
    nd = spark.createDataFrame([(v,) for v in NODES], "node long")
    with pytest.raises(ValueError):
        pagerank(e, nd, damping_pct=0)
    with pytest.raises(ValueError):
        pagerank(e, nd, damping_pct=100)


# ---------------------------------------------------------------------------
# k_core
# ---------------------------------------------------------------------------


def ref_k_core(edges, k):
    """Driver-side peel-to-convergence reference (independent loop)."""
    adj = defaultdict(set)
    for a, b in edges:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    changed = True
    while changed:
        changed = False
        for v in list(adj):
            if len(adj[v]) < k:
                for u in adj[v]:
                    adj[u].discard(v)
                del adj[v]
                changed = True
    return {v: len(ns) for v, ns in adj.items() if ns}


def _run_kcore(spark, edges, k, **kw):
    e = spark.createDataFrame(edges, "id1 long, id2 long")
    got = k_core(e, k, **kw).collect()
    return {r["node"]: r["degree"] for r in got}


# 5-clique + a chain hanging off it + an isolated triangle
CLIQUE = [(a, b) for a in range(5) for b in range(a + 1, 5)]
CHAIN = [(4, 10), (10, 11), (11, 12)]
TRI = [(20, 21), (21, 22), (20, 22)]
KGRAPH = CLIQUE + CHAIN + TRI


def test_k_core_converged_matches_reference(spark):
    for k in (2, 3, 4, 5):
        assert _run_kcore(spark, KGRAPH, k) == ref_k_core(KGRAPH, k)


def test_k_core_semantics(spark):
    got3 = _run_kcore(spark, KGRAPH, 3)
    # chain peels, 5-clique survives with internal degree 4, triangle dies
    assert set(got3) == set(range(5))
    assert all(d == 4 for d in got3.values())
    got2 = _run_kcore(spark, KGRAPH, 2)
    assert set(got2) == set(range(5)) | {20, 21, 22}


def test_k_core_bounded_rounds_superset(spark):
    # a long chain needs many peel rounds at k=2; few rounds give a
    # superset, enough rounds equal convergence
    chain = [(i, i + 1) for i in range(12)]
    conv = ref_k_core(chain, 2)
    assert conv == {}
    partial = _run_kcore(spark, chain, 2, rounds=2)
    assert set(partial).issuperset(conv) and len(partial) > 0
    full = _run_kcore(spark, chain, 2, rounds=6)
    assert full == conv


def test_k_core_validation(spark):
    e = spark.createDataFrame(KGRAPH, "id1 long, id2 long")
    with pytest.raises(ValueError):
        k_core(e, 0)


# ---------------------------------------------------------------------------
# triangle_counts
# ---------------------------------------------------------------------------


def ref_triangles(edges):
    """Independent reference: brute-force triple enumeration."""
    adj = defaultdict(set)
    for a, b in edges:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    nodes = sorted(adj)
    tri = {v: 0 for v in nodes}
    for i, a in enumerate(nodes):
        for b in [x for x in nodes[i + 1:] if x in adj[a]]:
            for c in [x for x in nodes if x > b and x in adj[a] and x in adj[b]]:
                tri[a] += 1
                tri[b] += 1
                tri[c] += 1
    return {
        v: (len(adj[v]), tri[v], round(2 * tri[v] / (len(adj[v]) * (len(adj[v]) - 1)), 6))
        for v in nodes
        if len(adj[v]) >= 2
    }


def test_triangles_match_reference(spark):
    e = spark.createDataFrame(KGRAPH, "id1 long, id2 long")
    got = {
        r["node"]: (r["degree"], r["triangles"], r["lcc"])
        for r in triangle_counts(e).collect()
    }
    assert got == ref_triangles(KGRAPH)


def test_triangles_bridge_has_low_lcc(spark):
    # two 4-cliques joined through a bridge vertex 100: clique-internal
    # members keep lcc 1.0, the bridge sees no cross-clique triangles
    c1 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    c2 = [(a, b) for a in range(10, 14) for b in range(a + 1, 14)]
    bridge = [(0, 100), (1, 100), (10, 100), (11, 100)]
    e = spark.createDataFrame(c1 + c2 + bridge, "id1 long, id2 long")
    got = {r["node"]: r for r in triangle_counts(e).collect()}
    assert got == {
        k: got[k] for k in got
    } and got[100]["lcc"] < 0.4  # bridge: 2 triangles of C(4,2)=6 wedges
    assert got[2]["lcc"] == 1.0 and got[12]["lcc"] == 1.0
    ref = ref_triangles(c1 + c2 + bridge)
    assert {k: (v["degree"], v["triangles"], v["lcc"]) for k, v in got.items()} == ref


def test_triangles_unordered_and_duplicate_edges(spark):
    # reversed/duplicated edge rows must not inflate counts
    e = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 1), (1, 3)], "id1 long, id2 long"
    )
    got = {r["node"]: r["triangles"] for r in triangle_counts(e).collect()}
    assert got == {1: 1, 2: 1, 3: 1}


# ---------------------------------------------------------------------------
# label_propagation
# ---------------------------------------------------------------------------


def ref_lpa(edges, rounds):
    """Independent reference: synchronous voting, min-label tie-break."""
    from collections import Counter

    adj = defaultdict(set)
    for a, b in edges:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    lab = {v: v for v in adj}
    for _ in range(rounds):
        new = {}
        for v in adj:
            cnt = Counter(lab[u] for u in adj[v])
            m = max(cnt.values())
            new[v] = min(l for l, c in cnt.items() if c == m)
        lab = new
    return lab


def lpa_spark(spark, edges, rounds):
    from dedupe_spark.operators.graph import label_propagation

    e = spark.createDataFrame(edges, "id1 long, id2 long")
    return {
        r["node"]: r["community"]
        for r in label_propagation(e, rounds=rounds).collect()
    }


def test_lpa_matches_reference(spark):
    for rounds in (1, 3, 4):
        assert lpa_spark(spark, KGRAPH, rounds) == ref_lpa(KGRAPH, rounds)


def test_lpa_splits_bridged_cliques(spark):
    # two 5-cliques glued by ONE bridge edge: connected components sees a
    # single cluster; LPA partitions the members into the two real sides
    from dedupe_spark.operators.clustering import connected_components

    c1 = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    c2 = [(a, b) for a in range(10, 15) for b in range(a + 1, 15)]
    edges = c1 + c2 + [(4, 14)]
    e = spark.createDataFrame(edges, "id1 string, id2 string")
    assert (
        connected_components(e).select("cluster_id").distinct().count() == 1
    )
    got = lpa_spark(spark, edges, 4)
    g1 = {got[v] for v in range(5)}
    g2 = {got[v] for v in range(10, 15)}
    assert g1 == {0} and g2 == {10}
    assert got == ref_lpa(edges, 4)


def test_lpa_oscillation_is_deterministic(spark):
    # 4-cliques + bridge: internal support ties let the min label bleed
    # across the bridge and oscillate — the documented contract is that
    # the pinned-round result still matches the reference exactly
    c1 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    c2 = [(a, b) for a in range(10, 14) for b in range(a + 1, 14)]
    edges = c1 + c2 + [(3, 13)]
    for rounds in (2, 4, 5):
        assert lpa_spark(spark, edges, rounds) == ref_lpa(edges, rounds)


def test_lpa_unordered_duplicate_edges_and_validation(spark):
    got = lpa_spark(spark, [(1, 2), (2, 1), (2, 3), (3, 1), (1, 3)], 3)
    assert got == ref_lpa([(1, 2), (2, 3), (1, 3)], 3)
    from dedupe_spark.operators.graph import label_propagation

    e = spark.createDataFrame([(1, 2)], "id1 long, id2 long")
    with pytest.raises(ValueError):
        label_propagation(e, rounds=0)


def test_triangles_degree_orientation_equals_id(spark):
    # the triangle set is orientation-invariant: both plans must emit
    # identical (degree, triangles, lcc) per node — including on the
    # mega-star where the orientations differ most (hub wedge fan-out
    # C(d,2) under id order, 0 under degree order)
    star = [(0, i) for i in range(1, 60)] + [(1, 2), (3, 4), (2, 3)]
    for graph in (KGRAPH, star):
        e = spark.createDataFrame(graph, "id1 long, id2 long")
        by_id = {
            r["node"]: (r["degree"], r["triangles"], r["lcc"])
            for r in triangle_counts(e, orient="id").collect()
        }
        by_deg = {
            r["node"]: (r["degree"], r["triangles"], r["lcc"])
            for r in triangle_counts(e, orient="degree").collect()
        }
        assert by_id == by_deg == ref_triangles(graph)
    with pytest.raises(ValueError):
        triangle_counts(
            spark.createDataFrame(star, "id1 long, id2 long"), orient="x"
        )


# ---------------------------------------------------------------- k-truss


def _run_ktruss(spark, edges, k, rounds=None):
    from dedupe_spark.operators.graph import k_truss

    df = spark.createDataFrame(edges, "id1 long, id2 long")
    return {
        (r["id1"], r["id2"]): r["support"]
        for r in k_truss(df, k, rounds=rounds).collect()
    }


def ref_k_truss(edges, k):
    """Brute-force peel on frozensets."""
    es = {frozenset(e) for e in edges if e[0] != e[1]}
    while True:
        # support = common neighbors of the two endpoints
        adj = {}
        for e in es:
            a, b = tuple(e)
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        sup = {e: len(adj[tuple(e)[0]] & adj[tuple(e)[1]]) for e in es}
        nxt = {e for e in es if sup[e] >= k - 2}
        if nxt == es:
            return {
                (min(e), max(e)): sup[e] for e in es
            }
        es = nxt


def test_k_truss_converged_matches_reference(spark):
    got = _run_ktruss(spark, KGRAPH, 3)
    assert got == ref_k_truss(KGRAPH, 3)
    got4 = _run_ktruss(spark, KGRAPH, 4)
    assert got4 == ref_k_truss(KGRAPH, 4)


def test_k_truss_bridge_peels_cliques_survive(spark):
    """Two 4-cliques glued by one bridge: the bridge is in zero
    triangles and peels round one; every clique edge survives with
    support 2 (K4: each edge sits in exactly 2 triangles)."""
    c1 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    c2 = [(a, b) for a in range(10, 14) for b in range(a + 1, 14)]
    bridge = [(3, 10)]
    got = _run_ktruss(spark, c1 + c2 + bridge, 3)
    assert (3, 10) not in got
    assert set(got) == {tuple(sorted(e)) for e in c1 + c2}
    assert all(s == 2 for s in got.values())


def test_k_truss_bounded_rounds_superset(spark):
    """A triangle ladder needs multiple peel rounds at k=4: one bounded
    round keeps a superset of the converged truss."""
    ladder = []
    for i in range(6):
        ladder += [(i, i + 1), (i, i + 100), (i + 1, i + 100)]
    conv = ref_k_truss(ladder, 4)
    one = _run_ktruss(spark, ladder, 4, rounds=1)
    full = _run_ktruss(spark, ladder, 4, rounds=8)
    assert set(one) >= set(conv)
    assert {e: s for e, s in full.items()} == conv


def test_k_truss_unordered_duplicate_edges_and_validation(spark):
    import pytest as _pytest

    messy = [(1, 0), (0, 1), (2, 0), (1, 2), (2, 2)]
    got = _run_ktruss(spark, messy, 3)
    assert got == {(0, 1): 1, (0, 2): 1, (1, 2): 1}
    e = spark.createDataFrame(messy, "id1 long, id2 long")
    from dedupe_spark.operators.graph import k_truss

    with _pytest.raises(ValueError):
        k_truss(e, 2)
