"""PQ / IVF-PQ scale stress: encode + ADC-scan throughput on a synthetic
200k x 64-dim corpus (100x the sf0.1 embeddings table's 2,000 rows), optionally at two
parallelism widths for a scaling datapoint on the new ANN family.

Usage: python scripts/pq_stress.py [n_vectors] [widths-csv]
       (defaults: 200000 vectors, widths 32; e.g. `... 200000 8,32`)

Prints one JSON line per width:
  {"metric": "pq_stress", "cpus": W, "n": N, "encode_sec": ...,
   "adc_scan_sec": ..., "ivfpq_scan_sec": ..., "adc_rows_per_sec": ...}

The corpus is generated DISTRIBUTED and deterministically (md5-seeded
per 1k-row block via mapInPandas — identical bytes at any parallelism),
never materialized on the driver.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

D = 64
BLOCK = 1000


def gen_corpus(spark, n: int):
    """Deterministic synthetic embeddings: block b's rows are drawn from
    RandomState(md5(b)) — independent of partitioning, so every width
    sees identical data."""

    def make(batches):
        for pdf in batches:
            for b in pdf["id"].tolist():
                seed = int.from_bytes(
                    hashlib.md5(f"blk:{b}".encode()).digest()[:4], "big"
                )
                rng = np.random.RandomState(seed)
                lo = b * BLOCK
                hi = min(lo + BLOCK, n)
                X = rng.normal(size=(hi - lo, D))
                yield pd.DataFrame(
                    {
                        "vec_id": np.arange(lo, hi, dtype=np.int64),
                        "embedding": list(X),
                    }
                )

    n_blocks = (n + BLOCK - 1) // BLOCK
    return spark.range(n_blocks).mapInPandas(
        make, "vec_id long, embedding array<double>"
    )


def run(width: int, n: int) -> dict:
    from dedupe_spark.operators import ann as A
    from dedupe_spark.session import get_spark

    spark = get_spark(
        f"pq_stress_{width}", master=f"local[{width}]",
        shuffle_partitions=width,
    )
    corpus = gen_corpus(spark, n).cache()
    corpus.count()

    books = A.fixed_pq_codebooks(corpus, m=8, ks=16)
    cents = A.fixed_centroids(corpus, n_cells=64)

    t0 = time.time()
    codes = A.pq_encode(corpus, books).cache()
    n_codes = codes.count()
    t_encode = time.time() - t0
    assert n_codes == n

    queries = corpus.where("vec_id < 32")
    t0 = time.time()
    n_adc = A.pq_adc_topk(codes, queries, books, k=10).count()
    t_adc = time.time() - t0

    cc = (
        A.assign_cells(corpus, cents)
        .join(codes.withColumnRenamed("id", "vec_id"), "vec_id")
        .selectExpr("vec_id as id", "cell", "codes")
        .cache()
    )
    cc.count()
    t0 = time.time()
    n_ivfpq = A.ivfpq_topk(cc, queries, cents, books, k=10, nprobe=8).count()
    t_ivfpq = time.time() - t0

    out = {
        "metric": "pq_stress",
        "cpus": width,
        "n": n,
        "d": D,
        "encode_sec": round(t_encode, 2),
        "encode_rows_per_sec": round(n / t_encode),
        "adc_scan_sec": round(t_adc, 2),
        # 32 queries x n rows scanned by the ADC fold
        "adc_rows_per_sec": round(32 * n / t_adc),
        "adc_topk_rows": n_adc,
        "ivfpq_scan_sec": round(t_ivfpq, 2),
        "ivfpq_topk_rows": n_ivfpq,
    }
    spark.stop()
    return out


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    widths = (
        [int(w) for w in sys.argv[2].split(",")]
        if len(sys.argv) > 2
        else [32]
    )
    for w in widths:
        print(json.dumps(run(w, n)), flush=True)
