"""Regenerate the golden output for the flagship `er_clusters` at sf0.1.

The flagship HAS a full DuckDB value oracle (SQL_ER_CLUSTERS) and the
driver hash-checks it at sf0.01 — but the twin's 96-perm md5-minhash
band CTE spills >60 GB of DuckDB temp at sf0.1 (BENCH.md "Extra-scale
oracle sweep"), so the 10×-gate scale had no value check at all: the
one scale band where a drift could hide. This pins it the same way
VERDICT r3 item 3 pinned `ivf_topk`: a committed golden parquet,
hash-compared by tests/test_clustering.py::test_er_clusters_golden_sf01.

Unlike ivf_topk, every stage of er_clusters is a pure md5-derived
function of the input rows (that is WHY the sf0.01 SQL twin can
re-derive it bit-for-bit), so the output is partitioning-invariant —
the golden is not pinned to a session shape, but we generate under the
tests' session anyway for uniformity.

Run this ONLY after an intentional algorithm change, eyeball the diff,
and commit the new parquet alongside the change that explains it.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from dedupe_spark.queries import q_er_clusters  # noqa: E402
from dedupe_spark.session import get_spark  # noqa: E402

OUT = os.path.join(REPO, "tests", "golden", "er_clusters_sf01.parquet")


def main() -> None:
    spark = get_spark(
        "er_golden_gen",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.driver.memory": "4g"},
    )
    pdf = (
        q_er_clusters(spark, "/root/testdata/sf0.1")
        .orderBy("cluster_id")
        .toPandas()
    )
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    pdf.to_parquet(OUT, index=False)
    print(f"wrote {len(pdf)} rows -> {OUT}")
    print(pdf.head(20).to_string(index=False))


if __name__ == "__main__":
    main()
