"""10x-scale stress of the round-4 final-session operators (same staging
discipline as newops10x_stress.py): the sf0.1 documents are replicated
10x with per-shard near-dup perturbation (cross-shard similarity ~0.99 —
the template-mill flood), embeddings copied through, and each query runs
via its REAL QUERIES[] entry over the staged directory.

Covers the document-side additions — the verification-free LSH bucket
CC (bucket caps + star contraction under a 50k near-dup flood is exactly
its adversarial case) and the composed curation verdict (quality +
decontamination + keep-best over 50k docs) — plus the ANN family at the
corpus the tables provide (the ANN 10x case is scripts/pq_stress.py's
2M-vector corpus).

Usage: python scripts/r4final_stress.py [workdir]
Prints one JSON line {op: {secs, rows}} and a total.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC = "/root/testdata/sf0.1"
SHARDS = 10

OPS = [
    "lsh_bucket_clusters",
    "curation_decisions",
    "pq_adc_topk",
    "ivfpq_topk",
    "ivfpq_residual_topk",
    "ann_scorecard",
]


def main() -> None:
    wd = sys.argv[1] if len(sys.argv) > 1 else "/tmp/r4final10x"
    data = os.path.join(wd, "data")
    shutil.rmtree(wd, ignore_errors=True)
    os.makedirs(data)

    from pyspark.sql import functions as F

    from dedupe_spark.lifecycle import release_session_storage
    from dedupe_spark.queries import QUERIES
    from dedupe_spark.session import get_spark

    spark = get_spark("r4final", master="local[32]", shuffle_partitions=64)

    docs = spark.read.parquet(os.path.join(SRC, "documents.parquet"))
    reps = []
    for k in range(SHARDS):
        reps.append(
            docs.select(
                (F.col("doc_id") + k * 1_000_000).alias("doc_id"),
                F.concat(F.col("text"), F.lit(f" s{k}")).alias("text"),
                "lang",
                "source",
                (F.col("n_chars") + 3).alias("n_chars"),
            )
        )
    big = reps[0]
    for r in reps[1:]:
        big = big.unionByName(r)
    big.write.mode("overwrite").parquet(os.path.join(data, "documents.parquet"))
    spark.read.parquet(os.path.join(SRC, "embeddings.parquet")).write.mode(
        "overwrite"
    ).parquet(os.path.join(data, "embeddings.parquet"))

    n_docs = spark.read.parquet(os.path.join(data, "documents.parquet")).count()
    out: dict = {"n_docs": n_docs, "ops": {}}
    total = 0.0
    for op in OPS:
        release_session_storage(spark)
        t0 = time.time()
        n = QUERIES[op](spark, data).count()
        dt = round(time.time() - t0, 2)
        total += dt
        out["ops"][op] = {"secs": dt, "rows": n}
        print(f"{op:24s} {dt:8.2f}s  rows={n}", file=sys.stderr, flush=True)
    out["total_secs"] = round(total, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
