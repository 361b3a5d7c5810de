"""10x-scale stress of this session's new operators (the sf1_dryrun
discipline applied to the round's additions): the sf0.1 tables are
deterministically replicated 10x — doc_id/event_id shifted per shard,
text perturbed by a per-shard suffix token so the replicas are NEAR
duplicates, not exact ones (the adversarial case for the near-dup and
prioritization operators: cross-shard bag similarity ~0.99 floods the
candidate space exactly the way template mills do at web scale) — and
each new query runs through its REAL QUERIES[] entry over the staged
parquet directory.

Usage: python scripts/newops10x_stress.py [workdir]
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
    "weighted_minhash_pairs",
    "progressive_pairs",
    "minhash_index_maintain",
    "truth_discovery",
    "iblt_reconcile",
    "drift_psi",
    "streaming_hll_users",
    "match_calibration",
    "l_diversity",
    "t_closeness",
    "hybrid_search_rrf",
    "mmr_diversify",
]


def main() -> None:
    wd = sys.argv[1] if len(sys.argv) > 1 else "/tmp/newops10x"
    data = os.path.join(wd, "data")
    shutil.rmtree(wd, ignore_errors=True)
    os.makedirs(data)

    from pyspark.sql import functions as F

    from dedupe_spark.lifecycle import release_session_storage
    from dedupe_spark.queries import QUERIES
    from dedupe_spark.session import get_spark

    spark = get_spark("newops10x", master="local[32]", shuffle_partitions=64)

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

    ev = spark.read.parquet(os.path.join(SRC, "events.parquet"))
    ereps = []
    for k in range(SHARDS):
        ereps.append(
            ev.select(
                (F.col("event_id") + k * 10_000_000).alias("event_id"),
                (F.col("ts") + F.expr(f"INTERVAL {k} MINUTES")).alias("ts"),
                # even shards keep user ids (cross-shard repeat visitors),
                # odd shards shift them (new users) — both HLL cases
                F.when(
                    F.lit(k % 2 == 0), F.col("user_id")
                ).otherwise(F.col("user_id") + k * 1_000_000).alias("user_id"),
                "event_type",
                "value",
                "props",
            )
        )
    bige = ereps[0]
    for r in ereps[1:]:
        bige = bige.unionByName(r)
    bige.write.mode("overwrite").parquet(os.path.join(data, "events.parquet"))

    for t in ("customer", "embeddings"):
        spark.read.parquet(os.path.join(SRC, f"{t}.parquet")).write.mode(
            "overwrite"
        ).parquet(os.path.join(data, f"{t}.parquet"))

    n_docs = spark.read.parquet(os.path.join(data, "documents.parquet")).count()
    n_ev = spark.read.parquet(os.path.join(data, "events.parquet")).count()

    out: dict = {"n_docs": n_docs, "n_events": n_ev, "ops": {}}
    total = 0.0
    for op in OPS:
        release_session_storage(spark)
        t0 = time.time()
        n = QUERIES[op](spark, data).count()
        dt = round(time.time() - t0, 2)
        total += dt
        out["ops"][op] = {"secs": dt, "rows": n}
        print(f"{op:28s} {dt:8.2f}s  rows={n}", file=sys.stderr, flush=True)
    out["total_secs"] = round(total, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
