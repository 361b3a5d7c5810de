"""Graph-family stress run: PageRank, k-core, label propagation and
degree-oriented triangle counting on the 54k-page synthetic corpus's
similarity graph (the same corpus as the session-6 ssjoin/SNM stress —
fixtures.make_pages n_base=35000, 109× the correctness gate's document
volume), plus an isolated mega-star measurement of the triangle
orientation gap (id vs degree). Edges come from sorted-neighborhood
pairing (fast, skew-independent 4n−10 volume) so the run stresses the
ITERATIVE loops, not candidate generation.

Usage: python scripts/graph_stress.py
Prints one JSON line: node/edge counts, per-op wall seconds, rank/core
summary stats.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_BASE = int(os.environ.get("GRAPH_STRESS_N_BASE", "35000"))


def main() -> None:
    from pyspark.sql import functions as F

    from dedupe_spark.fixtures import make_pages
    from dedupe_spark.normalize import preprocess_expr
    from dedupe_spark.operators.graph import (
        k_core,
        label_propagation,
        pagerank,
        triangle_counts,
    )
    from dedupe_spark.operators.snm import sorted_neighborhood_pairs
    from dedupe_spark.pipeline import pages_df
    from dedupe_spark.session import get_spark

    t0 = time.time()
    pages_pd, _ = make_pages(n_base=N_BASE, seed=42)
    spark = get_spark(
        "graph_stress", master="local[32]", shuffle_partitions=64
    )
    docs = (
        pages_df(spark, pages_pd)
        .select(
            F.xxhash64("url").alias("doc_id"),
            preprocess_expr("text").alias("text_norm"),
        )
        .cache()
    )
    n_docs = docs.count()
    t_gen = round(time.time() - t0, 1)

    t0 = time.time()
    pairs = sorted_neighborhood_pairs(
        docs.select(
            "doc_id",
            F.substring("text_norm", 1, 40).alias("snm_key"),
        ),
        "doc_id",
        F.col("snm_key"),
        window=5,
    ).localCheckpoint(eager=True)
    n_pairs = pairs.count()
    t_pairs = round(time.time() - t0, 1)

    edges = pairs.select(
        F.col("id1").alias("src"), F.col("id2").alias("dst")
    ).unionAll(
        pairs.select(F.col("id2").alias("src"), F.col("id1").alias("dst"))
    )
    nodes = docs.select(F.col("doc_id").alias("node"))

    t0 = time.time()
    ranks = pagerank(edges, nodes, iterations=8)
    stats = ranks.agg(
        F.count("*").alias("n"),
        F.sum("rank_micro").alias("mass"),
        F.max("rank_micro").alias("max_rank"),
    ).head()
    t_pr = round(time.time() - t0, 1)

    t0 = time.time()
    cores = k_core(
        pairs.select("id1", "id2"), k=3, rounds=None
    )
    core_stats = cores.agg(
        F.count("*").alias("n_core"), F.max("degree").alias("max_deg")
    ).head()
    t_kc = round(time.time() - t0, 1)

    t0 = time.time()
    comms = label_propagation(pairs.select("id1", "id2"), rounds=4)
    n_comms = comms.select("community").distinct().count()
    t_lpa = round(time.time() - t0, 1)

    t0 = time.time()
    tri = triangle_counts(pairs.select("id1", "id2"), orient="degree")
    tri_stats = tri.agg(
        F.count("*").alias("n"),
        (F.sum("triangles") / 3).cast("long").alias("n_triangles"),
    ).head()
    t_tri = round(time.time() - t0, 1)

    # the orientation gap, isolated: a mega-star whose hub id sits in the
    # MIDDLE of the id range (so id orientation gives it indeg ≈ outdeg
    # ≈ d/2 and the wedge join materializes ~d²/4 two-paths through it),
    # plus one triangle among low-id leaves (the hub closes three more
    # with its spokes: 4 triangles total); degree orientation points
    # every spoke INTO the hub — zero paths through it — and must still
    # count the same 4 triangles
    leaves = int(os.environ.get("GRAPH_STRESS_STAR_LEAVES", "40000"))
    hub = leaves // 2
    star = spark.range(1, leaves + 2).select(
        F.lit(hub).cast("long").alias("id1"),
        F.when(F.col("id") <= hub, F.col("id") - 1)
        .otherwise(F.col("id"))
        .alias("id2"),
    ).unionAll(
        spark.createDataFrame(
            [(1, 2), (2, 3), (1, 3)], "id1 long, id2 long"
        )
    ).localCheckpoint(eager=True)
    star_walls = {}
    for orient in ("degree", "id"):
        t0 = time.time()
        s = triangle_counts(star, orient=orient)
        total = s.agg((F.sum("triangles") / 3).cast("long").alias("t")).head()["t"]
        star_walls[orient] = round(time.time() - t0, 1)
        assert total == 4, (orient, total)

    print(
        json.dumps(
            {
                "metric": "graph_stress",
                "n_docs": n_docs,
                "n_pairs": n_pairs,
                "gen_sec": t_gen,
                "snm_pairs_sec": t_pairs,
                "pagerank8_sec": t_pr,
                "pagerank_nodes": stats["n"],
                "pagerank_mass": int(stats["mass"]),
                "pagerank_max": int(stats["max_rank"]),
                "kcore3_converged_sec": t_kc,
                "kcore3_members": core_stats["n_core"],
                "kcore3_max_degree": core_stats["max_deg"],
                "lpa4_sec": t_lpa,
                "lpa4_communities": n_comms,
                "triangles_deg_sec": t_tri,
                "triangle_nodes": tri_stats["n"],
                "n_triangles": int(tri_stats["n_triangles"]),
                "star_leaves": leaves,
                "star_triangles_sec": star_walls,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
