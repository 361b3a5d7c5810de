"""Vectorized average-linkage kernel: property tests vs a straight-line
reference implementation, a scale bound, and the cross-component edge
guard in refine_components (VERDICT r01 items #2 wrong / ADVICE medium)."""

from __future__ import annotations

import time

import numpy as np

from dedupe_spark.functions.linkage import agglomerate


def _reference_agglomerate(n, edges, cut):
    """The pre-vectorization nested-loop implementation (round-1
    clustering.refine_components inner loop), kept here as the semantic
    reference for the property tests."""
    D = np.ones((n, n))
    np.fill_diagonal(D, 0.0)
    for i, j, d in edges:
        D[i, j] = D[j, i] = d
    clusters = [[i] for i in range(n)]
    dist = D.copy()
    active = list(range(n))
    while len(active) > 1:
        best, bi, bj = None, -1, -1
        for ii in range(len(active)):
            for jj in range(ii + 1, len(active)):
                d = dist[active[ii], active[jj]]
                if best is None or d < best - 1e-12:
                    best, bi, bj = d, ii, jj
        if best is None or best > cut:
            break
        a, b = active[bi], active[bj]
        na, nb = len(clusters[a]), len(clusters[b])
        new = (dist[a, :] * na + dist[b, :] * nb) / (na + nb)
        dist[a, :] = new
        dist[:, a] = new
        dist[a, a] = 0.0
        clusters[a] = clusters[a] + clusters[b]
        active.pop(bj)
    labels = [0] * n
    for a in active:
        lab = min(clusters[a])
        for i in clusters[a]:
            labels[i] = lab
    return labels


def test_agglomerate_matches_reference_on_random_graphs():
    for seed in range(20):
        rng = np.random.RandomState(seed)
        n = int(rng.randint(4, 40))
        edges = [
            (i, j, float(rng.uniform(0.01, 0.99)))
            for i in range(n)
            for j in range(i + 1, n)
            if rng.uniform() < 0.35
        ]
        cut = float(rng.uniform(0.3, 0.7))
        assert agglomerate(n, edges, cut) == _reference_agglomerate(
            n, edges, cut
        ), f"divergence at seed={seed}"


def test_agglomerate_trivial_sizes():
    assert agglomerate(0, [], 0.5) == []
    assert agglomerate(1, [], 0.5) == [0]
    assert agglomerate(2, [(0, 1, 0.1)], 0.5) == [0, 0]
    assert agglomerate(2, [(0, 1, 0.9)], 0.5) == [0, 1]


def test_agglomerate_full_merge_and_no_merge():
    # unscored pairs default to distance 1.0: cut above it merges all,
    # cut below it merges none
    assert agglomerate(5, [], 1.01) == [0] * 5
    assert agglomerate(5, [], 0.99) == list(range(5))


def test_agglomerate_2000_nodes_in_seconds():
    """The round-1 implementation was O(n^3) interpreted Python — a
    2,000-node component took hours. The vectorized kernel must finish the
    worst case (full merge cascade, 1,999 merges) in seconds."""
    t0 = time.time()
    labels = agglomerate(2000, [], 1.01)
    dt = time.time() - t0
    assert labels == [0] * 2000
    assert dt < 10.0, f"2000-node agglomeration took {dt:.1f}s"


def test_refine_ignores_cross_component_edges(spark):
    """A sub-threshold edge whose endpoints lie in different components
    must not inject a foreign id into a component's group (ADVICE r01,
    clustering.py refine_components join on id1 only)."""
    from dedupe_spark.operators.clustering import refine_components

    assign = spark.createDataFrame(
        [("a", "a"), ("b", "a"), ("c", "a"), ("x", "x"), ("y", "x"), ("z", "x")],
        "record_id string, cluster_id string",
    )
    edges = spark.createDataFrame(
        [
            ("a", "b", 0.9),
            ("b", "c", 0.9),
            ("a", "c", 0.9),
            ("x", "y", 0.9),
            ("y", "z", 0.9),
            ("x", "z", 0.9),
            ("c", "x", 0.1),  # cross-component, sub-threshold
        ],
        "id1 string, id2 string, score double",
    )
    rows = refine_components(assign, edges, threshold=0.5).collect()
    assert len(rows) == 6  # nothing duplicated, nothing injected
    comp = {r["record_id"]: r["cluster_id"] for r in rows}
    assert comp == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x", "z": "x"}


def test_mutual_best_links_one_to_one(spark):
    """Mutual argmax: (a, b) survives iff each is the other's top match;
    ties break on partner id ascending."""
    from dedupe_spark.operators.record_link import mutual_best_links

    rows = [
        # a1's best is b1 (0.9) and b1's best is a1 -> kept
        ("a1", "b1", 0.9), ("a1", "b2", 0.5),
        # a2's best is b1 (0.8) but b1 prefers a1 -> a2 unmatched entirely:
        # strict mutual argmax does no cascading reassignment (a2-b2 would
        # need a second round — that's greedy matching, which iterates)
        ("a2", "b1", 0.8), ("a2", "b2", 0.7),
        # tie on a3: 0.6 for b3 and b4 -> b3 (lower id) wins; b3 agrees
        ("a3", "b3", 0.6), ("a3", "b4", 0.6),
    ]
    df = spark.createDataFrame(rows, "id_a string, id_b string, score double")
    got = {(r.id_a, r.id_b) for r in mutual_best_links(df).collect()}
    assert got == {("a1", "b1"), ("a3", "b3")}


def test_cross_candidate_pairs_caps_either_side(spark):
    from dedupe_spark.operators.record_link import cross_candidate_pairs

    ba = spark.createDataFrame(
        [("a1", "k"), ("a2", "k"), ("a3", "big"), ("a4", "big"), ("a5", "big")],
        "record_id string, bk string",
    )
    bb = spark.createDataFrame(
        [("b1", "k"), ("b2", "big")], "record_id string, bk string"
    )
    got = {(r.id_a, r.id_b) for r in cross_candidate_pairs(ba, bb, max_block=2).collect()}
    # 'big' has 3 A-side members > cap -> dropped even though B side is small
    assert got == {("a1", "b1"), ("a2", "b1")}


def test_mutual_best_links_duplicate_pair_rows(spark):
    """Duplicate (a, b) rows collapse to their best score before ranking —
    complete ties must not get independent row_number draws that lose the
    mutually-best pair."""
    from dedupe_spark.operators.record_link import mutual_best_links

    rows = [("a1", "b1", 0.9)] * 3 + [("a1", "b2", 0.5), ("a2", "b1", 0.4)]
    df = spark.createDataFrame(rows, "id_a string, id_b string, score double")
    got = {(r.id_a, r.id_b) for r in mutual_best_links(df).collect()}
    assert got == {("a1", "b1")}


# ------------------------------------------------------ greedy_one_to_one


def ref_greedy_matching(edges):
    """Sequential greedy: repeatedly take the best remaining edge
    (score desc, then id_a, id_b asc), remove its endpoints."""
    rest = sorted(edges, key=lambda e: (-e[2], e[0], e[1]))
    used_a, used_b, out = set(), set(), {}
    for a, b, s in rest:
        if a not in used_a and b not in used_b:
            used_a.add(a)
            used_b.add(b)
            out[(a, b)] = s
    return out


def _run_greedy(spark, edges, rounds=None):
    from dedupe_spark.operators.record_link import greedy_one_to_one

    df = spark.createDataFrame(edges, "id_a string, id_b string, score double")
    return {
        (r.id_a, r.id_b): (r.score, r.match_round)
        for r in greedy_one_to_one(df, rounds=rounds).collect()
    }


CONFLICT_EDGES = [
    # a1's and a2's best is b1 — one round leaves a2 unmatched even
    # though b2 (its second-best) is free
    ("a1", "b1", 0.9),
    ("a2", "b1", 0.8),
    ("a2", "b2", 0.7),
    ("a3", "b2", 0.6),
    ("a3", "b3", 0.5),
    ("a4", "b9", 0.4),
]


def test_greedy_matches_sequential_reference(spark):
    got = _run_greedy(spark, CONFLICT_EDGES)
    ref = ref_greedy_matching(CONFLICT_EDGES)
    assert {k: v[0] for k, v in got.items()} == ref
    # the chain resolves over three waves
    assert got[("a1", "b1")][1] == 1
    assert got[("a2", "b2")][1] == 2
    assert got[("a3", "b3")][1] == 3


def test_greedy_beats_one_round_mutual(spark):
    from dedupe_spark.operators.record_link import mutual_best_links

    df = spark.createDataFrame(
        CONFLICT_EDGES, "id_a string, id_b string, score double"
    )
    one = {(r.id_a, r.id_b) for r in mutual_best_links(df).collect()}
    full = set(_run_greedy(spark, CONFLICT_EDGES))
    assert one < full  # strictly more links, and every wave-1 link kept
    assert {k for k, v in _run_greedy(spark, CONFLICT_EDGES).items() if v[1] == 1} == one


def test_greedy_one_to_one_property_and_ties(spark):
    import random

    rng = random.Random(7)
    edges = [
        (f"a{rng.randrange(20)}", f"b{rng.randrange(20)}",
         round(rng.random(), 3))
        for _ in range(120)
    ]
    # dedup (a,b) keeping max score, as a candidate generator would
    best = {}
    for a, b, s in edges:
        best[(a, b)] = max(best.get((a, b), 0.0), s)
    edges = [(a, b, s) for (a, b), s in best.items()]
    got = _run_greedy(spark, edges)
    ref = ref_greedy_matching(edges)
    assert {k: v[0] for k, v in got.items()} == ref
    a_used = [a for a, _ in got]
    b_used = [b for _, b in got]
    assert len(a_used) == len(set(a_used)) and len(b_used) == len(set(b_used))


def test_greedy_bounded_rounds_prefix_and_empty(spark):
    one = _run_greedy(spark, CONFLICT_EDGES, rounds=1)
    conv = _run_greedy(spark, CONFLICT_EDGES)
    assert set(one) <= set(conv)
    assert all(v[1] == 1 for v in one.values())
    from dedupe_spark.operators.record_link import greedy_one_to_one

    empty = spark.createDataFrame(
        [], "id_a string, id_b string, score double"
    )
    out = greedy_one_to_one(empty, rounds=2)
    assert out.count() == 0
    assert out.columns == ["id_a", "id_b", "score", "match_round"]
