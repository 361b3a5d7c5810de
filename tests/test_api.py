"""End-to-end tests of the reference-shaped API (Deduper / dedupe_table)
on the KNA-style customer-master fixture — the reference's own domain."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dedupe_spark.api import Deduper, dedupe_table
from dedupe_spark.fixtures import make_kna_customers
from dedupe_spark.functions.features import FieldSpec
from dedupe_spark.operators.assemble import export_flat


@pytest.fixture(scope="module")
def kna(spark):
    pdf = make_kna_customers(n_base=120, seed=44)
    df = spark.createDataFrame(pdf).withColumn(
        "record_id", F.col("Customer")
    )
    # ground truth: base record 1xxxx and its dup 9xxxx share suffix
    truth = {
        r["Customer"]: r["Customer"][1:] for r in df.select("Customer").collect()
    }
    return df.cache(), truth


def _true_pairs(truth):
    from collections import defaultdict

    groups = defaultdict(list)
    for cid, base in truth.items():
        groups[base].append(cid)
    pairs = set()
    for ids in groups.values():
        ids = sorted(ids)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                pairs.add((ids[i], ids[j]))
    return pairs


def _labels(truth, spark, n_neg=60):
    import random

    rng = random.Random(7)
    pos = sorted(_true_pairs(truth))
    ids = sorted(truth)
    neg = set()
    while len(neg) < n_neg:
        a, b = rng.sample(ids, 2)
        if truth[a] != truth[b]:
            neg.add((min(a, b), max(a, b)))
    rows = [(a, b, "y") for a, b in pos] + [(a, b, "n") for a, b in sorted(neg)]
    return spark.createDataFrame(rows, "id1 string, id2 string, label string"), pos


def test_dedupe_table_kna_f1(spark, kna):
    df, truth = kna
    labels, pos = _labels(truth, spark)
    clusters = dedupe_table(
        df,
        labels,
        feature_cols=["Name 1", "Name 2", "Street", "Postal Code", "City"],
        id_col="record_id",
        threshold=0.5,
    ).cache()
    # pairwise F1 against ground truth over ALL true pairs
    got_pairs = set()
    for row in clusters.collect():
        ids = sorted(m["record_id"] for m in row["records"])
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                got_pairs.add((ids[i], ids[j]))
    true = _true_pairs(truth)
    tp = len(got_pairs & true)
    prec = tp / len(got_pairs) if got_pairs else 0
    rec = tp / len(true)
    f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0
    assert f1 >= 0.99, (tp, len(got_pairs), len(true))  # measured 1.0
    # output shape parity (FIXTURES.md F5)
    assert {"cluster_id", "group_size", "confidence_score", "records"} <= set(
        clusters.columns
    )
    # export with reference column order and N/A -> ''
    flat = export_flat(
        clusters, ["Name 1", "Name 2", "Street", "Postal Code", "City", "source_file"]
    )
    assert flat.columns[0] == "cluster_id"
    assert flat.columns[-1] == "source_file"
    assert flat.where(F.col("Name 2") == "N/A").count() == 0


def test_active_learning_loop(spark, kna):
    """Simulated human loop: uncertain_pairs -> oracle labels -> retrain."""
    df, truth = kna
    fields = [FieldSpec("Name 1"), FieldSpec("City"), FieldSpec("Street")]
    d = Deduper(fields, id_col="record_id", seed=1)
    d.prepare_training(df)

    # bootstrap labels from ground truth (the role of the human)
    labels, pos = _labels(truth, spark)
    boot = labels.orderBy("id1", "id2").limit(30).collect()
    d.mark_pairs(
        match=[(r["id1"], r["id2"]) for r in boot if r["label"] == "y"],
        distinct=[(r["id1"], r["id2"]) for r in boot if r["label"] == "n"],
    )
    if not d._match or not d._distinct:
        # ensure both classes present
        d.mark_pairs(match=[next(iter(_true_pairs(truth)))])
    d.train()
    assert d.model is not None and d.predicates

    # active rounds: label the k most uncertain pairs each round
    for _ in range(2):
        unc = d.uncertain_pairs(k=5).collect()
        assert len(unc) <= 5
        m, n = [], []
        for r in unc:
            (m if truth[r["id1"]] == truth[r["id2"]] else n).append(
                (r["id1"], r["id2"])
            )
        d.mark_pairs(match=m, distinct=n)
        if d._match and d._distinct:
            d.train()

    clusters = d.partition(df, threshold=0.5)
    assert clusters.count() > 0
    assert clusters.where("group_size < 2").count() == 0


def test_uncertain_pairs_budget(spark, kna):
    """max_training_pairs is a real budget (the reference plumbs 100 but
    never enforces it, main.py:108): uncertain_pairs serves at most that
    many pairs in total, then returns empty — the labeling loop terminates
    deterministically."""
    df, _ = kna
    d = Deduper(
        [FieldSpec("Name 1")], id_col="record_id", max_training_pairs=7
    )
    d.prepare_training(df)
    served = 0
    for _ in range(5):
        got = d.uncertain_pairs(k=3).collect()
        served += len(got)
    assert served == 7
    assert d.uncertain_pairs(k=3).count() == 0


def test_deduper_guards(spark, kna):
    df, _ = kna
    d = Deduper([FieldSpec("Name 1")], id_col="record_id")
    with pytest.raises(RuntimeError):
        d.uncertain_pairs()
    d.prepare_training(df)
    with pytest.raises(ValueError):
        d.train()  # no labels
    with pytest.raises(RuntimeError):
        d.partition(df)  # not trained
