"""Cluster assembly / export tests (SURVEY.md A1/O1/S8/J3)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dedupe_spark.normalize import MISSING
from dedupe_spark.operators.assemble import (
    assemble_clusters,
    export_columns,
    export_flat,
    remove_duplicates,
)


@pytest.fixture()
def members(spark):
    return spark.createDataFrame(
        [
            ("a", "c1", 0.9),
            ("b", "c1", 0.7),
            ("c", "c2", 0.6),
            ("d", "c2", 0.8),
            ("e", "c3", 0.0),  # singleton -> filtered (group_size 1)
        ],
        "record_id string, cluster_id string, confidence double",
    )


@pytest.fixture()
def records(spark):
    return spark.createDataFrame(
        [
            ("a", "en", "f1.csv"),
            ("b", "de", "f1.csv"),
            ("c", MISSING, "f2.csv"),
            ("d", "en", "f2.csv"),
            ("e", "pl", "f1.csv"),
        ],
        "record_id string, lang string, source_file string",
    )


def test_assemble(members, records):
    out = assemble_clusters(
        members, records, "record_id", ["lang", "source_file"]
    ).collect()
    assert [r["cluster_id"] for r in out] == ["c1", "c2"]  # 0.8 avg > 0.7 avg
    c1 = out[0]
    assert c1["group_size"] == 2
    assert c1["confidence_score"] == pytest.approx(0.8)
    assert [m["record_id"] for m in c1["records"]] == ["a", "b"]
    assert c1["records"][0]["confidence_score"] == pytest.approx(0.9)


def test_export_columns_order():
    cols = export_columns(["lang", "source_file", "alpha", "record_id"])
    assert cols == [
        "cluster_id",
        "alpha",
        "lang",
        "record_id",
        "confidence_score",
        "source_file",
    ]


def test_export_flat_na_mapping(members, records):
    clusters = assemble_clusters(members, records, "record_id", ["lang", "source_file"])
    flat = export_flat(clusters, ["lang", "source_file"]).collect()
    by_id = {r["record_id"]: r for r in flat}
    assert by_id["c"]["lang"] == ""  # MISSING -> '' on export
    assert by_id["a"]["lang"] == "en"
    assert list(flat[0].asDict()) == [
        "cluster_id", "lang", "record_id", "confidence_score", "source_file"
    ]


def test_remove_duplicates_anti_join(records, spark):
    removals = spark.createDataFrame([("b",), ("d",)], "record_id string")
    kept = remove_duplicates(records, removals, "record_id")
    assert {r["record_id"] for r in kept.collect()} == {"a", "c", "e"}
