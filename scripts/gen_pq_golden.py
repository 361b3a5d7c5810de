"""Regenerate the golden output for the TRAINED-codebook PQ path.

The trained per-subspace k-means (`ann.train_pq_codebooks`) is the PQ
family's production quantizer and — like the k-means `ivf_topk` — depends
on numpy's sampler, so no external engine can re-derive it (the
registered `pq_adc_topk` query uses the md5-fixed codebooks for its SQL
oracle instead). This pins the trained chain to a committed golden
parquet, generated under the SAME session shape as tests/conftest.py
(local[4], 4 shuffle partitions — the seeded df.sample + F.rand
selection is deterministic only for a fixed input partitioning),
asserted by tests/test_ann.py::test_pq_trained_golden_sf001.

Run this ONLY after an intentional algorithm change, eyeball the diff,
and commit the new parquet alongside the change that explains it.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from dedupe_spark.operators import ann as A  # noqa: E402
from dedupe_spark.session import get_spark  # noqa: E402

OUT = os.path.join(REPO, "tests", "golden", "pq_trained_sf001.parquet")


def trained_pq_topk(spark):
    e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    # Pin partition contents AND within-partition order by key before the
    # seeded sample: df.sample / F.rand are deterministic only per
    # (partitioning, row order), so without this the golden would depend
    # on the fixture's physical file splitting and the session's core
    # count. Range-partition + sort makes the chain a pure function of
    # the table's LOGICAL content.
    e = e.repartitionByRange(4, "vec_id").sortWithinPartitions("vec_id")
    books = A.train_pq_codebooks(e, m=8, ks=16, sample=500)
    codes = A.pq_encode(e, books)
    queries = e.where(F.col("vec_id") < 5)
    return A.pq_adc_topk(codes, queries, books, k=5).select(
        "query_id", "id", F.round(F.col("adc_d2"), 6).alias("adc_d2"), "rank"
    )


def main() -> None:
    spark = get_spark(
        "pq_golden_gen",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.driver.memory": "4g"},
    )
    pdf = (
        trained_pq_topk(spark)
        .orderBy("query_id", "rank", "id")
        .toPandas()
    )
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    pdf.to_parquet(OUT, index=False)
    print(f"wrote {len(pdf)} rows to {OUT}")
    print(pdf.head(10).to_string())


if __name__ == "__main__":
    main()
