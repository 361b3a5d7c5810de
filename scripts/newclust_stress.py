"""10x stress of the session's clustering additions: pivot_clusters
(KwikCluster) and canopy_blocks over a ~39k-page corpus (the sf1_dryrun
corpus shape, deterministic fixtures, no external data), with
connected_components on the SAME edge relation as the yardstick.

Usage: python scripts/newclust_stress.py [n_base]
Prints one JSON line with edge/node counts, per-op wall-clocks, cluster
counts, and MIS round count.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_BASE = int(sys.argv[1]) if len(sys.argv) > 1 else 25000


def main() -> None:
    from pyspark.sql import functions as F

    from dedupe_spark.fixtures import make_pages
    from dedupe_spark.normalize import preprocess_expr
    from dedupe_spark.operators.blocking import (
        candidate_pairs,
        generate_blocks,
    )
    from dedupe_spark.operators.clustering import (
        canopy_blocks,
        connected_components,
        pivot_clusters,
    )
    from dedupe_spark.pipeline import pages_df
    from dedupe_spark.session import get_spark

    cpus = int(os.environ.get("NEWCLUST_CPUS", "32"))
    out: dict = {"n_base": N_BASE, "cpus": cpus}
    pages_pd, _ = make_pages(n_base=N_BASE, seed=42)
    spark = get_spark(
        "newclust_stress",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus * 2, 8),
    )
    pages = pages_df(spark, pages_pd).cache()
    out["n_pages"] = pages.count()

    # the pipeline's own blocking predicates -> candidate edges
    recs = pages.select(
        F.col("url").alias("record_id"),
        preprocess_expr(F.col("text")).alias("_t"),
        "lang",
    )
    preds = {
        "langtok": F.concat_ws(
            "|", F.col("lang"), F.split(F.col("_t"), " ")[0]
        ),
        "prefix12": F.substring(F.col("_t"), 1, 12),
    }
    blocks = generate_blocks(recs, "record_id", preds)
    t0 = time.time()
    pairs = candidate_pairs(blocks).localCheckpoint(eager=True)
    out["n_edges"] = pairs.count()
    out["t_candidates"] = round(time.time() - t0, 2)

    t0 = time.time()
    cc = connected_components(pairs, driver_threshold=0)
    out["cc_clusters"] = cc.select("cluster_id").distinct().count()
    out["t_cc"] = round(time.time() - t0, 2)

    t0 = time.time()
    pc = pivot_clusters(pairs)
    out["pivot_clusters"] = pc.select("cluster_id").distinct().count()
    out["pivot_nodes"] = pc.count()
    out["t_pivot"] = round(time.time() - t0, 2)

    # canopy over gram-Jaccard thresholds on the candidate pairs,
    # gram arrays via the engine's own ngram kernel
    t0 = time.time()
    from dedupe_spark.operators import blocking as B

    grams = pages.select(
        F.col("url").alias("doc_id"), B.ngram_array("text", n=5).alias("g")
    )
    l = grams.select(F.col("doc_id").alias("id1"), F.col("g").alias("g1"))
    r = grams.select(F.col("doc_id").alias("id2"), F.col("g").alias("g2"))
    inter = F.size(F.array_intersect("g1", "g2"))
    uni = F.size("g1") + F.size("g2") - inter
    base = (
        pairs.join(l, "id1")
        .join(r, "id2")
        .select("id1", "id2", inter.alias("i"), uni.alias("u"))
        .localCheckpoint(eager=True)
    )
    tight = base.where(F.col("i") * 2 >= F.col("u")).select("id1", "id2")
    loose = base.where(F.col("i") * 5 >= F.col("u")).select("id1", "id2")
    nodes = pages.select(F.col("url").alias("id"))
    can = canopy_blocks(tight, loose, nodes)
    out["canopy_memberships"] = can.count()
    out["canopy_centers"] = can.select("canopy_id").distinct().count()
    out["t_canopy"] = round(time.time() - t0, 2)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
