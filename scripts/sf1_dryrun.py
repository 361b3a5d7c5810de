"""10x-scale dry run (VERDICT r2 item 9): the full checkpointed pipeline
plus the sketch-dedup family on a ~50k-page corpus — 10x the sf0.1 bench
input — to surface any hidden driver-side bottleneck before the scale
claim is tested harder. The corpus is synthesized deterministically
(fixtures.make_pages, the BASELINE.json input_hint shape); no external
data.

Usage: python scripts/sf1_dryrun.py [workdir]   (default /tmp/sf1_dryrun)
Prints one JSON line: stage wall-clocks, pair counts, pairwise F1.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_BASE = int(os.environ.get("SF1_N_BASE", "35000"))


def main() -> None:
    wd = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1_dryrun"
    shutil.rmtree(wd, ignore_errors=True)
    os.makedirs(wd)

    from pyspark.sql import functions as F

    from dedupe_spark.fixtures import make_labeled_pairs, make_pages
    from dedupe_spark.operators import dedup as D
    from dedupe_spark.pipeline import (
        Pipeline,
        PipelineConfig,
        pages_df,
        pairwise_f1,
    )
    from dedupe_spark.session import get_spark

    t0 = time.time()
    pages_pd, truth = make_pages(n_base=N_BASE, seed=42)
    pairs_pd = make_labeled_pairs(truth, n_pos=2000, n_neg=4000)
    t_gen = time.time() - t0

    spark = get_spark("sf1_dryrun", master="local[32]", shuffle_partitions=64)
    pages = pages_df(spark, pages_pd).cache()
    n_pages = pages.count()
    lab = spark.createDataFrame(pairs_pd)

    # -- full checkpointed ER pipeline ------------------------------------
    t0 = time.time()
    pl = Pipeline(spark, PipelineConfig(workdir=os.path.join(wd, "ck")))
    out = pl.run(pages, lab)
    n_clusters = out["clusters"].count()
    t_pipeline = time.time() - t0
    f1 = pairwise_f1(out["assignments"], lab)

    stage_walls = {
        k: {"seconds": v["seconds"], "rows": v["rows"]}
        for k, v in pl.metrics.items()
        if isinstance(v, dict) and "seconds" in v
    }

    # -- sketch dedup family on the same corpus ---------------------------
    docs = pages.select(
        F.col("url").alias("doc_id"), "text"
    ).repartition(96).cache()
    docs.count()

    sketch = {}
    t0 = time.time()
    n_exact = D.exact_duplicate_groups(docs, "doc_id").count()
    sketch["exact_dup_groups"] = round(time.time() - t0, 2)

    t0 = time.time()
    lk = D.text_lookup(docs, "doc_id", "text")
    n_mh = D.minhash_lsh_pairs(
        docs, "doc_id", jaccard_threshold=0.7, verify_lookup=lk
    ).count()
    sketch["minhash_pairs"] = round(time.time() - t0, 2)

    t0 = time.time()
    n_sh = D.simhash_pairs(
        docs, "doc_id", max_hamming=6, bands=8, min_shared=2
    ).count()
    sketch["simhash_pairs"] = round(time.time() - t0, 2)

    print(
        json.dumps(
            {
                "metric": "sf1_dryrun",
                "n_pages": n_pages,
                "t_generate": round(t_gen, 2),
                "t_pipeline": round(t_pipeline, 2),
                "pipeline_stages": stage_walls,
                "n_clusters": n_clusters,
                "pairwise_f1": round(f1["f1"], 4),
                "sketch_walls": sketch,
                "n_exact_groups": n_exact,
                "n_minhash_pairs": n_mh,
                "n_simhash_pairs": n_sh,
            }
        )
    )


if __name__ == "__main__":
    main()
