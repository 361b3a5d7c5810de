"""Tests for the long-tail SURVEY.md §2 operators: P5/P6 reprocess slice,
J6 review-pair expansion, O3 interleave, M9 refinement, P7/P8/J4/S6 helpers."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dedupe_spark import training as TR
from dedupe_spark.operators.clustering import refine_components
from dedupe_spark.sources import (
    drop_empty_rows,
    lookup_source_file,
    with_row_index,
)


def test_reprocess_training_records(spark):
    records = spark.createDataFrame(
        [(f"u{i}", f"name{i}", f"city{i % 3}") for i in range(20)],
        "url string, name string, city string",
    )
    pair_records = spark.createDataFrame(
        [("name3", "city0"), ("name7", "city1")], "name string, city string"
    )
    out = TR.reprocess_training_records(
        records, pair_records, ["name", "city"], "url", max_rows=5
    )
    ids = [r["url"] for r in out.collect()]
    assert len(ids) == 5
    assert "u3" in ids and "u7" in ids  # referenced records always kept


def test_pairs_from_reviewed_groups(spark):
    members = spark.createDataFrame(
        [("a", "c1"), ("b", "c1"), ("x", "c1"), ("p", "c2"), ("q", "c2")],
        "record_id string, cluster_id string",
    )
    removals = spark.createDataFrame([("x",)], "record_id string")
    got = {
        (r["id1"], r["id2"]): r["label"]
        for r in TR.pairs_from_reviewed_groups(members, removals).collect()
    }
    assert got[("a", "b")] == "y"      # kept x kept
    assert got[("a", "x")] == "n"      # kept x removed
    assert got[("b", "x")] == "n"
    assert got[("p", "q")] == "y"
    assert len(got) == 4               # no cross-cluster pairs


def test_interleave_pairs(spark):
    m = spark.createDataFrame([("a", "b"), ("c", "d")], "id1 string, id2 string")
    r = spark.createDataFrame([("e", "f")], "id1 string, id2 string")
    d = spark.createDataFrame([("g", "h"), ("i", "j")], "id1 string, id2 string")
    out = TR.interleave_pairs({"matching": m, "random": r, "distinct": d})
    got = [(row["id1"], row["bucket"]) for row in out.collect()]
    assert got == [
        ("a", "matching"), ("e", "random"), ("g", "distinct"),
        ("c", "matching"), ("i", "distinct"),
    ]


def test_refine_components_splits_chained(spark):
    """Two tight pairs chained by one weak edge: CC merges them, the
    hierarchical refinement at threshold 0.5 splits them back."""
    edges = spark.createDataFrame(
        [("a", "b", 0.95), ("c", "d", 0.9), ("b", "c", 0.55)],
        "id1 string, id2 string, score double",
    )
    from dedupe_spark.operators.clustering import connected_components

    assign = connected_components(edges.select("id1", "id2"))
    assert assign.select("cluster_id").distinct().count() == 1  # one chain
    refined = refine_components(assign, edges, threshold=0.5)
    comp = {r["record_id"]: r["cluster_id"] for r in refined.collect()}
    assert comp["a"] == comp["b"]
    assert comp["c"] == comp["d"]
    assert comp["a"] != comp["c"]


def test_refine_components_keeps_tight_cluster(spark):
    edges = spark.createDataFrame(
        [("a", "b", 0.9), ("b", "c", 0.85), ("a", "c", 0.8)],
        "id1 string, id2 string, score double",
    )
    from dedupe_spark.operators.clustering import connected_components

    assign = connected_components(edges.select("id1", "id2"))
    refined = refine_components(assign, edges, threshold=0.5)
    assert refined.select("cluster_id").distinct().count() == 1


def test_drop_empty_rows(spark):
    df = spark.createDataFrame(
        [("a", "b", "f1"), ("", "  ", "f1"), (None, None, "f2"), ("x", None, "f2")],
        "c1 string, c2 string, source_file string",
    )
    kept = drop_empty_rows(df).collect()
    assert {(r["c1"]) for r in kept} == {"a", "x"}


def test_with_row_index(spark):
    df = spark.createDataFrame([("z",), ("a",), ("m",)], "v string")
    out = {r["v"]: r["record_id"] for r in with_row_index(df, "v").collect()}
    assert out == {"a": "0", "m": "1", "z": "2"}


def test_lookup_source_file(spark):
    df = spark.createDataFrame([("r1", "x")], "record_id string, v string")
    lineage = spark.createDataFrame(
        [("r1", "a.csv"), ("r2", "b.csv")], "record_id string, source_file string"
    )
    out = lookup_source_file(df, lineage).collect()
    assert out[0]["source_file"] == "a.csv"
