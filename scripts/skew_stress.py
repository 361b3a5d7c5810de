"""Skew stress (VERDICT r3 item 5): one deliberately mega-hot block key.

Web corpora always have a degenerate key — a shared language, a boilerplate
footer, an empty field — that naively blocks n^2/2 pairs. This fixture
builds a corpus where EVERY document shares one block key (the mega-key),
plus a hot-but-keepable key right at the cap (exercising triangle
salting), plus injected near-dup twins reachable only through their own
distinctive keys. It then asserts, with exact arithmetic, that

- the mega-key is dropped AND accounted (dropped_block_stats — the
  'no silent caps' contract),
- candidate volume is the salted-block grid plus the twin pairs, nothing
  more (bounded: ~1e5 pairs where the uncapped plan implies ~2e10),
- recall of the injected twins is 1.0 — the cap costs none of the pairs
  the distinctive predicates can see.

Usage: python scripts/skew_stress.py          # one JSON line, N=200k
       SKEW_N=20000 python scripts/skew_stress.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

MAX_BLOCK = 500
SALT_TARGET = 100
HOT_KEPT = 500  # exactly at the cap: kept, salted into ceil(500/100)=5 buckets


def build_skew_corpus(spark, n: int, n_dups: int):
    """Deterministic skewed corpus, built distributed (spark.range).

    Columns: doc_id, lang (constant -> the mega-key), title (distinctive
    prefix key). Rows [0, HOT_KEPT) share one hot-but-keepable title
    prefix. Rows [HOT_KEPT, HOT_KEPT + n_dups) each get a twin row whose
    title shares its 8-char prefix — the injected near-dups.
    """
    from pyspark.sql import functions as F

    assert n > HOT_KEPT + n_dups, "need room for hot block + twins"
    base = spark.range(n).select(
        F.format_string("d%08d", F.col("id")).alias("doc_id"),
        F.lit("en").alias("lang"),
        F.when(
            F.col("id") < HOT_KEPT, F.lit("HOTKEY00 shared boilerplate")
        ).otherwise(F.format_string("t%07dx unique body", F.col("id"))).alias(
            "title"
        ),
        F.col("id"),
    )
    twins = (
        spark.range(HOT_KEPT, HOT_KEPT + n_dups)
        .select(
            F.format_string("d%08d-twin", F.col("id")).alias("doc_id"),
            F.lit("en").alias("lang"),
            # same 8-char prefix as the base row's title -> same block key
            F.format_string("t%07dy twin body", F.col("id")).alias("title"),
            F.col("id"),
        )
    )
    truth = twins.select(
        F.format_string("d%08d", F.col("id")).alias("id1"),
        F.col("doc_id").alias("id2"),
    )
    return base.unionByName(twins).drop("id"), truth


def run(spark, n: int = 200_000, n_dups: int = 2_000) -> dict:
    from pyspark.sql import functions as F

    from dedupe_spark.operators import blocking as B

    corpus, truth = build_skew_corpus(spark, n, n_dups)
    corpus = corpus.repartition(32).cache()
    n_rows = corpus.count()

    t0 = time.time()
    blocks = B.generate_blocks(
        corpus,
        "doc_id",
        {
            "lang": B.whole_field("lang"),       # the mega-key: every row
            "title8": B.prefix("title", 8),       # distinctive + hot-kept
        },
    ).cache()
    dropped = B.dropped_block_stats(blocks, MAX_BLOCK)
    pairs = B.candidate_pairs(
        blocks, max_block=MAX_BLOCK, salt_target=SALT_TARGET
    ).cache()
    n_pairs = pairs.count()
    wall = round(time.time() - t0, 2)

    found = truth.join(pairs, ["id1", "id2"], "left_semi").count()
    n_truth = truth.count()

    expected_pairs = HOT_KEPT * (HOT_KEPT - 1) // 2 + n_dups
    uncapped_pairs = n_rows * (n_rows - 1) // 2  # what the mega-key implies
    blocks.unpersist()
    pairs.unpersist()
    corpus.unpersist()
    return {
        "metric": "skew_stress",
        "n_docs": n_rows,
        "mega_key_rows": n_rows,  # every row shares lang:en
        "dropped": dropped,
        "candidate_pairs": n_pairs,
        "expected_pairs": expected_pairs,
        "uncapped_pairs_implied": uncapped_pairs,
        "containment_ratio": round(n_pairs / uncapped_pairs, 8),
        "injected_dups": n_truth,
        "recall_injected": round(found / n_truth, 4),
        "wall_sec": wall,
    }


def main() -> None:
    from dedupe_spark.session import get_spark

    n = int(os.environ.get("SKEW_N", "200000"))
    n_dups = int(os.environ.get("SKEW_DUPS", "2000"))
    spark = get_spark(
        "skew_stress", master="local[32]", shuffle_partitions=64
    )
    rep = run(spark, n, n_dups)
    print(json.dumps(rep))
    ok = (
        rep["dropped"]["dropped_keys"] == 1
        and rep["dropped"]["dropped_rows"] == rep["n_docs"]
        and rep["candidate_pairs"] == rep["expected_pairs"]
        and rep["recall_injected"] == 1.0
    )
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
