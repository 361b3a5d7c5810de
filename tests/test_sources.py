"""Ingestion source tests (S1-S5, J5)."""

from __future__ import annotations

import os

import pytest

from dedupe_spark.sources import (
    detect_fields,
    load_testdata,
    read_files_union,
    schema_mapped_merge,
)
from dedupe_spark.sources.ingest import validate_extension


@pytest.fixture()
def csv_files(tmp_path):
    p1 = tmp_path / "a.csv"
    p1.write_text("name,city\nAcme,Berlin\nZenith,Hamburg\n")
    p2 = tmp_path / "b.csv"
    p2.write_text("name,country\nNadir,DE\n")
    return str(p1), str(p2)


def test_read_files_union_lineage_and_columns(spark, csv_files):
    p1, p2 = csv_files
    df = read_files_union(spark, [p1, p2])
    rows = {r["name"]: r for r in df.collect()}
    assert set(df.columns) == {"name", "city", "country", "source_file"}
    assert rows["Acme"]["source_file"] == "a.csv"
    assert rows["Nadir"]["source_file"] == "b.csv"
    assert rows["Nadir"]["city"] is None  # missing col -> null
    assert dict(df.dtypes)["name"] == "string"


def test_validate_extension():
    validate_extension("x.csv")
    validate_extension("x.XLSX")
    with pytest.raises(ValueError):
        validate_extension("x.json")


def test_detect_fields(spark, csv_files):
    df = read_files_union(spark, [csv_files[0]])
    fields = detect_fields(df)
    assert fields == [
        {"field": "name", "type": "String", "has_missing": True},
        {"field": "city", "type": "String", "has_missing": True},
    ]


def test_schema_mapped_merge(spark):
    primary = spark.createDataFrame(
        [("Acme", "Berlin")], "company string, city string"
    )
    secondary = spark.createDataFrame(
        [("Zenith", "HH", "extra")], "firm string, city string, note string"
    )
    merged = schema_mapped_merge(primary, secondary, {"firm": "company"})
    assert set(merged.columns) == {"company", "city", "note"}
    rows = {r["company"]: r for r in merged.collect()}
    assert rows["Zenith"]["city"] == "HH"      # auto-mapped same name
    assert rows["Zenith"]["note"] == "extra"   # unmapped col kept
    assert rows["Acme"]["note"] is None


def test_load_testdata(spark):
    t = load_testdata(spark, "/root/testdata/sf0.001", ["documents", "region"])
    assert t["documents"].columns == ["doc_id", "text", "lang", "source", "n_chars"]
    assert t["region"].count() == 5
