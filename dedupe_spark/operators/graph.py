"""Iterative link analysis on DataFrames: PageRank in exact integer
arithmetic (engine-portable, partition-order independent).

The reference repo has no graph operator, but the north-star corpus is
Common-Crawl-style web pages — at that scale PageRank over a link or
similarity graph is the canonical crawl-prioritization / hub-triage
computation (Page et al. 1999 "The PageRank citation ranking"; the
Pregel-on-DataFrames idiom of GraphX/GraphFrames re-expressed as plain
joins + aggregations, the same shape as operators/clustering.py's
large-star/small-star loop).

Determinism contract (operators/lm.py's micro-unit trick applied to rank
mass): ranks live in **integer micro-units** (``scale`` = total mass 1.0)
and every per-iteration operation is int64 multiply/divide — no float
ever enters the loop. Integer sums are associative/commutative, so the
result is bit-identical regardless of partitioning, task order, or
engine: a DuckDB twin re-derives every iteration exactly (unrolled CTEs,
``queries.SQL_PAGERANK``).

Scale shape per iteration (V = vertices, E = directed edges):
- ``ranks ⋈ out_edges`` on the vertex key and the contribution
  ``groupBy(dst)`` — the two E-sized shuffles any Pregel step pays; the
  groupBy is map-side combinable (SUM of int64).
- the dangling-mass aggregate is ONE row, broadcast back (never a
  shuffle of ranks).
- ``localCheckpoint`` per iteration truncates lineage exactly like the
  connected-components loop; on a real cluster, bucketing edges and
  ranks by the vertex key at write time makes the per-iteration join
  exchange-free (the write_bucketed_blocks pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 10**12


def pagerank(
    edges: DataFrame,
    nodes: DataFrame,
    iterations: int = 8,
    damping_pct: int = 85,
    scale: int = SCALE,
    checkpoint: bool = True,
) -> DataFrame:
    """``edges(src, dst)`` directed (long ids), ``nodes(node)`` the full
    vertex set (must cover every edge endpoint; isolated vertices allowed)
    → ``(node, rank_micro)`` after exactly ``iterations`` synchronous
    iterations.

    Update rule, all int64 (operands nonnegative, so div = floor and the
    Python ``//`` reference in tests/test_graph.py is exact):

    - ``contrib(u→v) = rank(u) div outdeg(u)``
    - ``dang = Σ rank(u)`` over dangling ``u`` (outdeg 0), redistributed
      uniformly: every vertex receives ``dang div N``
    - ``rank'(v) = (100−d)·scale div (100·N)
      + d·(Σ contrib(·→v) + dang div N) div 100``

    Total mass is conserved up to floor losses (< 1 micro-unit per
    division), so ranks are comparable across corpora of equal N.
    ``iterations`` is fixed rather than convergence-tested: bit-exact
    reproducibility (and the SQL twin) need a pinned iteration count; 8
    iterations of d=0.85 bound the unconverged tail by 0.85^8 ≈ 0.27 of
    the initial spread, plenty for rank ORDERING, which is what the
    consumers (crawl priority, hub triage) use.
    """
    if not 0 < damping_pct < 100:
        raise ValueError(f"damping_pct must be in (0,100), got {damping_pct}")
    n_df = nodes.select(F.col("node").cast("long").alias("node")).distinct()
    ecols = edges.select(
        F.col("src").cast("long").alias("src"), F.col("dst").cast("long").alias("dst")
    )
    deg = ecols.groupBy("src").agg(F.count("*").alias("outdeg"))
    # out-edges with degree attached once, materialized: every iteration
    # re-reads this instead of recomputing the upstream edge pipeline
    out_edges = ecols.join(deg, "src")
    if checkpoint:
        out_edges = out_edges.localCheckpoint(eager=True)
        n_df = n_df.localCheckpoint(eager=True)
    n = n_df.count()
    if n == 0:
        return n_df.select("node", F.lit(0).cast("long").alias("rank_micro"))
    base = (100 - damping_pct) * scale // (100 * n)
    ranks = n_df.select("node", F.lit(scale // n).cast("long").alias("rank"))
    # derived from the CHECKPOINTED out_edges, not deg: deg hangs off the
    # raw edges lineage, and the per-iteration dangling anti-join would
    # re-execute the whole upstream edge pipeline every round
    dangling_src = out_edges.select("src").distinct()
    for _ in range(iterations):
        contribs = (
            ranks.join(out_edges, ranks["node"] == out_edges["src"])
            .select(
                F.col("dst").alias("node"),
                F.expr("rank div outdeg").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
        )
        dang = ranks.join(
            dangling_src, ranks["node"] == dangling_src["src"], "left_anti"
        ).agg(F.coalesce(F.sum("rank"), F.lit(0)).cast("long").alias("dang"))
        ranks = (
            n_df.join(contribs, "node", "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "node",
                (
                    F.lit(base).cast("long")
                    + F.expr(
                        f"({damping_pct} * (coalesce(s, 0L) + dang div {n}L)) div 100"
                    )
                ).alias("rank"),
            )
        )
        if checkpoint:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select("node", F.col("rank").alias("rank_micro"))


def k_core(
    edges: DataFrame,
    k: int,
    rounds: int | None = None,
    max_iter: int = 100,
    checkpoint: bool = True,
) -> DataFrame:
    """k-core peeling over an undirected graph ``edges(id1, id2)`` →
    ``(node, degree)`` for the surviving vertices (degree measured in the
    surviving subgraph).

    A genuine duplicate set blocks into a near-clique (every member
    degree ≥ size−1); a transitive-closure over-merge is a chain whose
    links peel away at k ≥ 2 — the dense CORE that k-core keeps is the
    trustworthy part of a suspect cluster, the complement of
    queries.q_cluster_density's flag (Seidman 1983 "Network structure
    and minimum degree").

    ``rounds=None`` peels to convergence (a round that removes nothing;
    checksum-free — emptiness of the removal set is the test, same
    lineage discipline as connected_components). ``rounds=R`` runs
    exactly R synchronous peel rounds — the engine-portable variant the
    SQL oracle unrolls; its result is a SUPERSET of the true k-core
    (peeling only ever removes vertices) and equals it whenever
    convergence needs ≤ R rounds. Per round: one degree groupBy and one
    semi-join per side — all map-side-combinable / key-local shuffles.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    und = edges.select(
        F.col("id1").cast("long").alias("src"), F.col("id2").cast("long").alias("dst")
    ).where(F.col("src") != F.col("dst"))
    sym = und.unionAll(und.select(F.col("dst").alias("src"), F.col("src").alias("dst"))).distinct()
    if checkpoint:
        sym = sym.localCheckpoint(eager=True)
    n_rounds = rounds if rounds is not None else max_iter
    prev_edges = sym.count() if rounds is None else None
    for _ in range(n_rounds):
        deg = sym.groupBy("src").agg(F.count("*").alias("c"))
        keep = deg.where(F.col("c") >= k).select("src")
        nxt = sym.join(keep, "src").join(
            keep.select(F.col("src").alias("dst")), "dst"
        ).select("src", "dst")
        if checkpoint:
            nxt = nxt.localCheckpoint(eager=True)
        if rounds is None:
            # converged when no edge was removed this round (the prior
            # round's count is carried, not recomputed)
            cur = nxt.count()
            if cur == prev_edges:
                sym = nxt
                break
            prev_edges = cur
        sym = nxt
    else:
        if rounds is None:
            raise RuntimeError(f"k_core did not converge in {max_iter} rounds")
    return sym.groupBy("src").agg(F.count("*").alias("degree")).select(
        F.col("src").alias("node"), "degree"
    )


def k_truss(
    edges: DataFrame,
    k: int,
    rounds: int | None = None,
    max_iter: int = 50,
    checkpoint: bool = True,
) -> DataFrame:
    """k-truss peeling over an undirected graph ``edges(id1, id2)`` →
    the surviving canonical edges ``(id1, id2, support)`` where support
    is the edge's triangle count in the surviving subgraph (Cohen 2008,
    "Trusses: cohesive subgraphs for social network analysis"): every
    kept edge participates in ≥ k−2 triangles among kept edges.

    The EDGE-level companion of :func:`k_core`'s node triage: k-core
    keeps a node that merely touches the dense part, k-truss names the
    specific edges the density actually runs through — the
    transitive-closure bridge between two genuine duplicate cliques has
    support 0 and peels in round one even when both endpoints are
    high-degree, which is exactly the over-merge link cluster_density
    can only flag cluster-wide and triangle_counts flags node-wide.

    Peel round = one triangle enumeration over the id-oriented canonical
    edge set (the apex wedge join of :func:`triangle_counts` — each
    triangle found once as a<b<c), a map-side-combinable per-edge
    support count (each triangle votes for its 3 edges), and an inner
    join keeping edges with support ≥ k−2 — an edge in no triangle has
    no support row and drops with the same join (k ≥ 3 makes that the
    correct semantics, enforced below). All joins/aggregations key on
    vertex or edge ids; lineage is truncated per round like the CC loop.

    ``rounds=None`` peels to convergence (a round that removes no edge);
    ``rounds=R`` runs exactly R synchronous rounds — the engine-portable
    variant the SQL oracle unrolls; its result is a SUPERSET of the true
    k-truss (peeling only removes) and equals it whenever convergence
    needs ≤ R rounds.
    """
    if k < 3:
        raise ValueError(f"k must be >= 3 for a truss, got {k}")
    e = (
        edges.select(
            F.least(
                F.col("id1").cast("long"), F.col("id2").cast("long")
            ).alias("a"),
            F.greatest(
                F.col("id1").cast("long"), F.col("id2").cast("long")
            ).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    if checkpoint:
        e = e.localCheckpoint(eager=True)
    n_rounds = rounds if rounds is not None else max_iter
    prev_n = e.count() if rounds is None else None
    sup = None
    for _ in range(n_rounds):
        ab = e.select(F.col("a").alias("t_a"), F.col("b").alias("t_b"))
        bc = e.select(F.col("a").alias("t_b2"), F.col("b").alias("t_c"))
        ac = e.select(F.col("a").alias("t_a3"), F.col("b").alias("t_c3"))
        tri = (
            ab.join(bc, ab.t_b == bc.t_b2)
            .join(
                ac,
                (F.col("t_a3") == F.col("t_a"))
                & (F.col("t_c3") == F.col("t_c")),
            )
            .select("t_a", "t_b", "t_c")
        )
        votes = (
            tri.select(F.col("t_a").alias("a"), F.col("t_b").alias("b"))
            .unionAll(
                tri.select(F.col("t_b").alias("a"), F.col("t_c").alias("b"))
            )
            .unionAll(
                tri.select(F.col("t_a").alias("a"), F.col("t_c").alias("b"))
            )
        )
        sup = votes.groupBy("a", "b").agg(F.count("*").alias("support"))
        nxt = (
            e.join(sup, ["a", "b"])
            .where(F.col("support") >= k - 2)
            .select("a", "b")
        )
        if checkpoint:
            nxt = nxt.localCheckpoint(eager=True)
        if rounds is None:
            cur = nxt.count()
            if cur == prev_n:
                e = nxt
                break
            prev_n = cur
        e = nxt
    else:
        if rounds is None:
            raise RuntimeError(f"k_truss did not converge in {max_iter} rounds")
    # final support measured in the SURVIVING subgraph (one more
    # enumeration over the fixed point — the reported number is the
    # edge's actual cohesion, not a stale pre-peel count)
    ab = e.select(F.col("a").alias("t_a"), F.col("b").alias("t_b"))
    bc = e.select(F.col("a").alias("t_b2"), F.col("b").alias("t_c"))
    ac = e.select(F.col("a").alias("t_a3"), F.col("b").alias("t_c3"))
    tri = (
        ab.join(bc, ab.t_b == bc.t_b2)
        .join(
            ac,
            (F.col("t_a3") == F.col("t_a")) & (F.col("t_c3") == F.col("t_c")),
        )
        .select("t_a", "t_b", "t_c")
    )
    votes = (
        tri.select(F.col("t_a").alias("a"), F.col("t_b").alias("b"))
        .unionAll(tri.select(F.col("t_b").alias("a"), F.col("t_c").alias("b")))
        .unionAll(tri.select(F.col("t_a").alias("a"), F.col("t_c").alias("b")))
    )
    fin = votes.groupBy("a", "b").agg(F.count("*").alias("support"))
    return e.join(fin, ["a", "b"]).select(
        F.col("a").alias("id1"), F.col("b").alias("id2"), "support"
    )


def label_propagation(
    edges: DataFrame, rounds: int = 4, checkpoint: bool = True
) -> DataFrame:
    """Synchronous label-propagation communities over an undirected graph
    ``edges(id1, id2)`` → ``(node, community)`` after exactly ``rounds``
    voting rounds (Raghavan et al. 2007, "Near linear time algorithm to
    detect community structures in large-scale networks").

    The triage this adds over connected components: CC answers "which
    records are transitively linked", LPA answers "where does the linked
    mass actually cohere" — an over-merged CC cluster made of two dense
    duplicate sets glued by a bridge pair splits into two communities,
    naming the records on each side (cluster_density flags the cluster,
    triangle_counts flags the bridge, LPA partitions the members).

    Determinism contract: labels start as the node id; each round every
    node simultaneously takes the most frequent label among its
    NEIGHBORS, ties broken by the smallest label — a total order, so the
    result is partitioning- and engine-independent and the SQL twin
    (queries.SQL_LABEL_PROPAGATION) re-derives every round exactly.
    ``rounds`` is pinned rather than convergence-tested for the same
    reason as pagerank's iteration count. Two documented consequences of
    the deterministic rule: round 1 is always a min-neighbor step (all
    initial labels are unique, so every vote ties), and communities whose
    internal support never exceeds 1 vote can oscillate instead of
    converging — both sides compute the same labels either way.

    Scale shape per round (E = undirected edges, V = vertices): one
    labels ⋈ edges join on the vertex key and one map-side-combinable
    (node, label) count, then an argmax groupBy on the vertex key — the
    same two E-sized key-local shuffles as a pagerank iteration; lineage
    truncated per round like the CC loop.
    """
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    und = edges.select(
        F.col("id1").cast("long").alias("src"),
        F.col("id2").cast("long").alias("dst"),
    ).where(F.col("src") != F.col("dst"))
    sym = und.unionAll(
        und.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    if checkpoint:
        sym = sym.localCheckpoint(eager=True)
    labels = sym.select(F.col("src").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    for _ in range(rounds):
        votes = (
            sym.join(labels, sym["dst"] == labels["node"])
            .select(F.col("src").alias("node"), "label")
            .groupBy("node", "label")
            .agg(F.count("*").alias("c"))
        )
        # lexicographic max of (count, -label) = highest count, then
        # smallest label — the total-order tie-break, no window needed
        labels = (
            votes.groupBy("node")
            .agg(
                F.max(
                    F.struct(F.col("c"), (-F.col("label")).alias("neg"))
                ).alias("w")
            )
            .select("node", (-F.col("w.neg")).alias("label"))
        )
        if checkpoint:
            labels = labels.localCheckpoint(eager=True)
    return labels.select("node", F.col("label").alias("community"))


def triangle_counts(edges: DataFrame, orient: str = "id") -> DataFrame:
    """Exact per-node triangle counts + local clustering coefficient over
    an undirected graph ``edges(id1, id2)`` → ``(node, degree,
    triangles, lcc)`` for nodes of degree ≥ 2, ``lcc = 2T/(d(d−1))``
    rounded to 6 decimals.

    The sharper over-merge signal than raw cluster density: a genuine
    duplicate set is near-clique (lcc → 1 for every member), while the
    BRIDGE record that chains two real entities has low lcc even when
    both sides are dense — per-node, not per-cluster, triage.

    Plan: node-iterator join over an acyclically ORIENTED edge set —
    every triangle has exactly one apex whose two edges both point out,
    so wedges = fwd ⋈ fwd on the middle vertex closed by a third
    equi-join finds each triangle once; all three joins key on vertex
    ids. ``orient`` picks the acyclic orientation (any total order gives
    the same triangles, so the output — and the SQL twin — is identical
    under both):

    - ``"id"``: low id → high id. Zero extra joins, but a low-id hub of
      degree d fans out C(d,2) wedges — fine on bounded-degree block
      graphs, quadratic on a skewed one.
    - ``"degree"``: low (degree, id) → high (degree, id), the
      Chiba–Nishizeki / Schank–Wagner ordering. Two degree joins up
      front buy the O(√E) out-degree bound: a hub's edges all point
      INTO it, so a mega-star contributes zero wedges instead of C(d,2)
      — the orientation to run at web scale (test_graph pins equality
      of both; scripts/graph_stress.py measures the star-graph gap).
    """
    if orient not in ("id", "degree"):
        raise ValueError(f"orient must be 'id' or 'degree', got {orient!r}")
    e = (
        edges.select(
            F.least(F.col("id1").cast("long"), F.col("id2").cast("long")).alias("a"),
            F.greatest(F.col("id1").cast("long"), F.col("id2").cast("long")).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("degree"))
    )
    if orient == "degree":
        da = deg.select(F.col("node").alias("a"), F.col("degree").alias("da"))
        db = deg.select(F.col("node").alias("b"), F.col("degree").alias("db"))
        lower = (F.col("da") < F.col("db")) | (
            (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
        )
        fwd = (
            e.join(da, "a")
            .join(db, "b")
            .select(
                F.when(lower, F.col("a")).otherwise(F.col("b")).alias("a"),
                F.when(lower, F.col("b")).otherwise(F.col("a")).alias("b"),
            )
        )
    else:
        fwd = e
    ab = fwd.select(F.col("a"), F.col("b"))
    bc = fwd.select(F.col("a").alias("b2"), F.col("b").alias("c"))
    ac = fwd.select(F.col("a").alias("a3"), F.col("b").alias("c3"))
    tri = (
        ab.join(bc, F.col("b") == F.col("b2"))
        .join(ac, (F.col("a") == F.col("a3")) & (F.col("c") == F.col("c3")))
        .select("a", "b", "c")
    )
    per_node = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("triangles"))
    )
    return (
        deg.where(F.col("degree") >= 2)
        .join(per_node, "node", "left")
        .select(
            "node",
            "degree",
            F.coalesce("triangles", F.lit(0)).cast("long").alias("triangles"),
            F.round(
                2.0
                * F.coalesce("triangles", F.lit(0))
                / (F.col("degree") * (F.col("degree") - 1)),
                6,
            ).alias("lcc"),
        )
    )
