"""Regenerate the golden output for the trained-quantizer `ivf_topk`
(VERDICT r3 item 3).

`q_ivf_topk` is the ONE registered query with no DuckDB value oracle: its
k-means quantizer depends on numpy's sampler (ann.train_centroids
docstring), so no external engine can re-derive it. The value check is a
committed golden parquet instead — generated here under the SAME session
shape as tests/conftest.py (local[4], 4 shuffle partitions: the seeded
df.sample + F.rand selection is deterministic only for a fixed input
partitioning), asserted by tests/test_ann.py::test_ivf_topk_golden_sf001.

Run this ONLY after an intentional algorithm change, eyeball the diff,
and commit the new parquet alongside the change that explains it.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from dedupe_spark.queries import q_ivf_topk  # noqa: E402
from dedupe_spark.session import get_spark  # noqa: E402

OUT = os.path.join(REPO, "tests", "golden", "ivf_topk_sf001.parquet")


def main() -> None:
    spark = get_spark(
        "ivf_golden_gen",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.driver.memory": "4g"},
    )
    pdf = (
        q_ivf_topk(spark, "/root/testdata/sf0.01")
        .orderBy("query_id", "rank", "id")
        .toPandas()
    )
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    pdf.to_parquet(OUT, index=False)
    print(f"wrote {len(pdf)} rows -> {OUT}")
    print(pdf.to_string(index=False))


if __name__ == "__main__":
    main()
