"""Sequence packing (distributed prefix sum), pairwise cluster metrics,
survivorship fusion and SemDeDup candidate semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dedupe_spark.operators.assemble import canonicalize_clusters
from dedupe_spark.operators.dedup import semantic_dup_candidates
from dedupe_spark.operators.evalmetrics import pairwise_cluster_metrics
from dedupe_spark.operators.packing import pack_sequences, prefix_sum


def test_prefix_sum_matches_sequential(spark):
    # non-dense, unordered ids across several buckets
    rows = [(i * 7 + 3, (i * 13) % 9 + 1) for i in range(100)]
    df = spark.createDataFrame(rows, "id long, v long")
    got = {
        r["id"]: r["p"]
        for r in prefix_sum(df, "id", "v", out_col="p", n_buckets=5).collect()
    }
    acc = 0
    for i, v in sorted(rows):
        assert got[i] == acc
        acc += v


def test_prefix_sum_single_bucket_and_empty(spark):
    df = spark.createDataFrame([(1, 10), (2, 20)], "id long, v long")
    got = dict(
        prefix_sum(df, "id", "v", out_col="p", n_buckets=1)
        .select("id", "p")
        .collect()
    )
    assert got == {1: 0, 2: 10}
    empty = spark.createDataFrame([], "id long, v long")
    assert prefix_sum(empty, "id", "v").count() == 0


def test_prefix_sum_plan_partitions_local_window(spark):
    """The local cumsum window must be partitioned by the range bucket —
    never a global single-partition sort over the data."""
    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 5 + 1).alias("v")
    )
    plan = prefix_sum(df, "id", "v", n_buckets=8)._jdf.queryExecution().toString()
    assert "windowspecdefinition(_bkt" in plan


def test_pack_sequences_straddle_and_zero(spark):
    df = spark.createDataFrame(
        [(1, 300), (2, 300), (3, 0), (4, 500), (5, 1200)],
        "doc_id long, n_tokens long",
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in pack_sequences(df, budget=512).collect()
    }
    # doc 1: [0, 300) -> seq 0 only
    assert (out[1]["seq_id"], out[1]["seq_offset"], out[1]["n_seqs"]) == (0, 0, 1)
    # doc 2: [300, 600) straddles the 512 boundary
    assert (out[2]["seq_id"], out[2]["seq_end"]) == (0, 1)
    # doc 3: zero tokens occupies nothing, pinned at its start sequence
    assert out[3]["seq_end"] == out[3]["seq_id"] and out[3]["n_seqs"] == 1
    # doc 4: [600, 1100) -> seqs 1..2
    assert (out[4]["seq_id"], out[4]["seq_offset"], out[4]["seq_end"]) == (1, 88, 2)
    # doc 5: [1100, 2300) spans seqs 2..4
    assert (out[5]["seq_id"], out[5]["seq_end"], out[5]["n_seqs"]) == (2, 4, 3)


def test_pairwise_cluster_metrics_hand_computed(spark):
    # pred: {a,b,c}, {d,e}; gold: {a,b}, {c,d,e}
    df = spark.createDataFrame(
        [("a", 1, 10), ("b", 1, 10), ("c", 1, 20), ("d", 2, 20), ("e", 2, 20)],
        "id string, pred int, gold int",
    )
    row = pairwise_cluster_metrics(df, "pred", "gold").first()
    # joint groups: (1,10)->2, (1,20)->1, (2,20)->2 => tp = 1 + 0 + 1 = 2
    assert row["tp"] == 2
    assert row["pred_pairs"] == 3 + 1  # C(3,2)+C(2,2)
    assert row["true_pairs"] == 1 + 3
    assert row["pairwise_precision"] == pytest.approx(2 / 4)
    assert row["pairwise_recall"] == pytest.approx(2 / 4)
    assert row["pairwise_f1"] == pytest.approx(0.5)


def test_pairwise_cluster_metrics_perfect_and_zero(spark):
    perfect = spark.createDataFrame(
        [("a", 1, 7), ("b", 1, 7), ("c", 2, 8)], "id string, pred int, gold int"
    )
    row = pairwise_cluster_metrics(perfect, "pred", "gold").first()
    assert (row["pairwise_precision"], row["pairwise_recall"], row["pairwise_f1"]) == (
        1.0,
        1.0,
        1.0,
    )
    # singletons everywhere: tp = 0 -> f1 defined as 0
    single = spark.createDataFrame(
        [("a", 1, 7), ("b", 2, 8)], "id string, pred int, gold int"
    )
    assert pairwise_cluster_metrics(single, "pred", "gold").first()["pairwise_f1"] == 0.0


def test_canonicalize_clusters_majority_and_rep(spark):
    members = spark.createDataFrame(
        [
            ("c1", "1", "en", "web", 50),
            ("c1", "2", "en", "mail", 90),
            ("c1", "3", "de", "mail", 90),
            ("c2", "9", "fr", "web", 10),
        ],
        "cluster_id string, record_id string, lang string, source string, n_chars long",
    )
    out = {
        r["cluster_id"]: r.asDict()
        for r in canonicalize_clusters(
            members,
            mode_cols=("lang", "source"),
            rep_order=(
                F.col("n_chars").desc_nulls_last(),
                F.col("record_id").cast("long").asc(),
            ),
        ).collect()
    }
    c1 = out["c1"]
    assert c1["n_members"] == 3
    assert c1["canon_lang"] == "en"  # majority 2-of-3
    assert c1["canon_source"] == "mail"
    assert c1["rep_id"] == "2"  # n_chars tie 90/90 -> lower id
    assert out["c2"]["rep_id"] == "9" and out["c2"]["n_members"] == 1


def test_semantic_dup_candidates_keep_lowest(spark):
    # cell 0: 1 and 2 identical direction, 3 orthogonal; cell 1: lone vec
    rows = [
        (1, [1.0, 0.0], 0),
        (2, [2.0, 0.0], 0),
        (3, [0.0, 1.0], 0),
        (9, [1.0, 1.0], 1),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, cell int")
    got = {
        r["vec_id"]: r.asDict()
        for r in semantic_dup_candidates(df, threshold=0.9).collect()
    }
    assert set(got) == {2}  # only 2 duplicates a LOWER id; 1 survives
    assert got[2]["dup_of"] == 1 and got[2]["cosine"] == pytest.approx(1.0)


# ---------------------------------------------------------------------------
# blocking_quality (operators/evalmetrics.py)
# ---------------------------------------------------------------------------

from dedupe_spark.operators.evalmetrics import blocking_quality  # noqa: E402


def test_blocking_quality_known_values(spark):
    records = spark.createDataFrame([(i,) for i in range(10)], "doc_id long")
    # C(10,2) = 45 possible; 9 candidates; truth 4 pairs, 3 covered
    cand = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], "id1 long, id2 long"
    )
    truth = spark.createDataFrame(
        [(0, 1), (2, 3), (5, 6), (0, 9)], "id1 long, id2 long"
    )
    (row,) = blocking_quality(records, cand, truth).collect()
    assert row["n_possible"] == 45
    assert row["n_candidates"] == 9 and row["n_true"] == 4
    assert row["n_covered"] == 3
    assert row["reduction_ratio"] == 0.8
    assert row["pairs_completeness"] == 0.75


def test_blocking_quality_perfect_and_empty(spark):
    records = spark.createDataFrame([(i,) for i in range(4)], "doc_id long")
    allp = spark.createDataFrame(
        [(i, j) for i in range(4) for j in range(i + 1, 4)],
        "id1 long, id2 long",
    )
    (row,) = blocking_quality(records, allp, allp).collect()
    assert row["reduction_ratio"] == 0.0  # no blocking at all
    assert row["pairs_completeness"] == 1.0  # but nothing lost


def test_prefix_sum_rejects_null_and_duplicate_order_keys(spark):
    import pytest

    from dedupe_spark.operators.packing import prefix_sum

    with_null = spark.createDataFrame(
        [(1, 10), (None, 20), (3, 30)], "oid long, v long"
    )
    with pytest.raises(ValueError, match="null"):
        prefix_sum(with_null, "oid", "v")
    dup = spark.createDataFrame([(1, 10), (1, 20)], "oid long, v long")
    with pytest.raises(ValueError, match="duplicate"):
        prefix_sum(dup, "oid", "v")


def test_cluster_metrics_zero_on_unlabeled_slice(spark):
    from dedupe_spark.operators.evalmetrics import pairwise_cluster_metrics

    df = spark.createDataFrame([(None, None)], "p string, t string")
    (row,) = pairwise_cluster_metrics(df, "p", "t").collect()
    assert row["tp"] == 0 and row["pred_pairs"] == 0
    assert row["pairwise_f1"] == 0.0  # 0.0, never NULL


def test_blocking_quality_degenerate_inputs_no_crash(spark):
    from dedupe_spark.operators.evalmetrics import blocking_quality

    one = spark.createDataFrame([(1,)], "doc_id long")
    empty = spark.createDataFrame([], "id1 long, id2 long")
    (row,) = blocking_quality(one, empty, empty).collect()
    assert row["n_possible"] == 0
    assert row["reduction_ratio"] is None  # undefined, not a crash
    assert row["pairs_completeness"] is None


# ---------------------------------------------------------------- B-cubed


def _ref_bcubed(recs):
    """(pred, true) tuples -> (P, R, ARI) by the textbook definitions."""
    from collections import Counter

    cells = Counter(recs)
    nc = Counter(p for p, _ in recs)
    nt = Counter(t for _, t in recs)
    n = len(recs)
    pmic = sum(int(round(v * v * 1e6 / nc[p])) for (p, t), v in cells.items())
    rmic = sum(int(round(v * v * 1e6 / nt[t])) for (p, t), v in cells.items())
    tp = sum(v * (v - 1) // 2 for v in cells.values())
    pp = sum(v * (v - 1) // 2 for v in nc.values())
    tpr = sum(v * (v - 1) // 2 for v in nt.values())
    tot = n * (n - 1) / 2.0
    e = pp * tpr / tot
    mx = (pp + tpr) / 2.0
    ari = 1.0 if mx == e else (tp - e) / (mx - e)
    return (
        round(pmic / (1e6 * n), 6),
        round(rmic / (1e6 * n), 6),
        round(ari, 6),
    )


def test_bcubed_hand_computed(spark):
    from dedupe_spark.operators.evalmetrics import bcubed_metrics

    recs = [("a", "x"), ("a", "x"), ("a", "y"), ("b", "y"), ("b", "y"), ("c", "z")]
    df = spark.createDataFrame(
        [(i, p, t) for i, (p, t) in enumerate(recs)],
        "id long, pred string, gold string",
    )
    row = bcubed_metrics(df, "pred", "gold").first()
    p, r, ari = _ref_bcubed(recs)
    assert row["bcubed_precision"] == p
    assert row["bcubed_recall"] == r
    assert row["ari"] == ari
    assert row["n_records"] == 6


def test_bcubed_perfect_and_degenerate(spark):
    from dedupe_spark.operators.evalmetrics import bcubed_metrics

    # identical clusterings: P = R = F1 = 1, ARI = 1
    same = [(i, f"c{i % 3}", f"g{i % 3}") for i in range(12)]
    df = spark.createDataFrame(same, "id long, pred string, gold string")
    row = bcubed_metrics(df, "pred", "gold").first()
    assert row["bcubed_precision"] == 1.0 and row["bcubed_recall"] == 1.0
    assert row["bcubed_f1"] == 1.0 and row["ari"] == 1.0
    # all-singleton prediction vs one gold cluster: precision 1, recall 1/n
    sing = [(i, f"p{i}", "g") for i in range(8)]
    df2 = spark.createDataFrame(sing, "id long, pred string, gold string")
    r2 = bcubed_metrics(df2, "pred", "gold").first()
    assert r2["bcubed_precision"] == 1.0
    assert r2["bcubed_recall"] == 0.125
    assert r2["ari"] == 0.0  # tp=0, E=0 -> (0-0)/(mx-0)


def test_bcubed_vs_pairwise_divergence(spark):
    """The case B-cubed exists for: one giant correct cluster + many
    wrong singles scores higher on pairwise F1 than on B3 recall."""
    from dedupe_spark.operators.evalmetrics import (
        bcubed_metrics,
        pairwise_cluster_metrics,
    )

    recs = [(i, "big", "big") for i in range(40)]
    recs += [(100 + i, f"s{i}", f"t{i % 2}") for i in range(10)]
    df = spark.createDataFrame(recs, "id long, pred string, gold string")
    pw = pairwise_cluster_metrics(df, "pred", "gold").first()
    b3 = bcubed_metrics(df, "pred", "gold").first()
    assert pw["pairwise_recall"] > b3["bcubed_recall"]


def test_bcubed_null_exclusion_and_empty(spark):
    from dedupe_spark.operators.evalmetrics import bcubed_metrics

    df = spark.createDataFrame(
        [(1, "a", "x"), (2, None, "x"), (3, "a", None)],
        "id long, pred string, gold string",
    )
    row = bcubed_metrics(df, "pred", "gold").first()
    assert row["n_records"] == 1
    empty = spark.createDataFrame([], "id long, pred string, gold string")
    r0 = bcubed_metrics(empty, "pred", "gold").first()
    assert r0["n_records"] == 0 and r0["bcubed_f1"] == 0.0 and r0["ari"] == 0.0
