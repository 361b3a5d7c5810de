"""10x-scale stress for the round-4 training-data additions (dsir_select,
bpe_merges) plus the TPC-H-shaped relational quartet: the documents
corpus is replicated 10x with shifted doc_ids (deterministic — no
external data), giving ~50k pages, and each operator runs end-to-end on
local[32]. Prints one JSON line of wall-clocks.

The scale claims under test:
- dsir: the 4096-bucket model stays a broadcast; corpus cost is one
  explode + one doc-keyed shuffle — 10x input should be ~linear.
- bpe: the corpus pass is the word-frequency groupBy; REPLICATION adds
  no new vocabulary, so the merge rounds' cost must stay FLAT (the
  vocab-bounded claim made in operators/bpe.py).

Usage: python scripts/newops_stress.py [replicas=10]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    from pyspark.sql import functions as F

    from dedupe_spark.operators.bpe import train_bpe
    from dedupe_spark.operators.dsir import dsir_scores
    from dedupe_spark.session import get_spark

    spark = get_spark(master="local[32]", shuffle_partitions=32)
    base = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    n_base = base.count()
    big = None
    for r in range(replicas):
        part = base.select(
            (F.col("doc_id") + F.lit(r * 10_000_000)).alias("doc_id"), "text"
        )
        big = part if big is None else big.unionByName(part)
    big = big.repartition(32).localCheckpoint()
    n = big.count()

    out: dict = {"n_docs": n, "n_base": n_base, "replicas": replicas}

    t = time.time()
    d = dsir_scores(big)
    out["dsir_rows"] = d.count()
    out["dsir_selected"] = d.where("selected").count()
    out["dsir_s"] = round(time.time() - t, 2)

    t = time.time()
    b = train_bpe(big).collect()
    out["bpe_merges"] = [(r["merged"], r["pair_count"]) for r in b]
    out["bpe_s"] = round(time.time() - t, 2)

    # bpe ENCODE (apply side): vocab-bounded folds — same flat-cost claim
    from dedupe_spark.operators.bpe import encode_tokens
    from dedupe_spark.queries import _BPE_ENCODE_MERGES

    t = time.time()
    enc = encode_tokens(big, _BPE_ENCODE_MERGES)
    out["bpe_encode_tokens"] = enc.count()
    out["bpe_encode_s"] = round(time.time() - t, 2)

    # bloom: build over the 10x corpus (shuffle ≤ m_words rows/partition
    # regardless of input) + probe every doc against the broadcast filter
    from dedupe_spark.operators.bloom import bloom_build, bloom_contains

    t = time.time()
    filt = bloom_build(big, "text", m_words=4096, k=5)
    out["bloom_state_rows"] = filt.cache().count()
    out["bloom_build_s"] = round(time.time() - t, 2)
    t = time.time()
    probed = bloom_contains(big, "doc_id", "text", filt, m_words=4096, k=5)
    out["bloom_probe_rows"] = probed.count()
    out["bloom_probe_s"] = round(time.time() - t, 2)
    filt.unpersist()

    # edit-distance join (Ed-Join): replicas carry a 2-char replica
    # suffix so cross-replica distance is 2 > tau=1 — true pairs grow
    # LINEARLY with replication (a bare copy would inflate them
    # quadratically and test nothing but the duplicate explosion)
    from dedupe_spark.operators.ssjoin import edit_distance_join

    ed_rel = big.select(
        "doc_id",
        F.concat(
            F.regexp_replace(F.substring("text", 1, 24), "[^a-z ]", ""),
            F.lpad(((F.col("doc_id") / 10_000_000) % 100).cast("int").cast("string"), 2, "0"),
            F.lpad(((F.col("doc_id") / 10_000_000) % 100).cast("int").cast("string"), 2, "0"),
        ).alias("s"),
    )
    t = time.time()
    out["edit_join_pairs"] = edit_distance_join(
        ed_rel, tau=1, id_col="doc_id", str_col="s", q=4
    ).count()
    out["edit_join_s"] = round(time.time() - t, 2)

    # single-replica reference timings for the linearity check
    small = base.select("doc_id", "text").localCheckpoint()
    t = time.time()
    dsir_scores(small).count()
    out["dsir_1x_s"] = round(time.time() - t, 2)
    t = time.time()
    train_bpe(small).collect()
    out["bpe_1x_s"] = round(time.time() - t, 2)
    t = time.time()
    encode_tokens(small, _BPE_ENCODE_MERGES).count()
    out["bpe_encode_1x_s"] = round(time.time() - t, 2)
    t = time.time()
    f1x = bloom_build(small, "text", m_words=4096, k=5)
    bloom_contains(small, "doc_id", "text", f1x, m_words=4096, k=5).count()
    out["bloom_1x_s"] = round(time.time() - t, 2)
    t = time.time()
    ed_1x = small.select(
        "doc_id",
        F.concat(
            F.regexp_replace(F.substring("text", 1, 24), "[^a-z ]", ""),
            F.lit("0000"),
        ).alias("s"),
    )
    out["edit_join_1x_pairs"] = edit_distance_join(
        ed_1x, tau=1, id_col="doc_id", str_col="s", q=4
    ).count()
    out["edit_join_1x_s"] = round(time.time() - t, 2)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
