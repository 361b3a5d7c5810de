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


# ---------------------------------------------------------------------------
# S2: stdlib .xlsx reader
# ---------------------------------------------------------------------------

import zipfile


def _write_min_xlsx(path: str) -> None:
    """Hand-crafted minimal SpreadsheetML workbook: shared strings (one
    rich-text), an inline string, numerics, a boolean, a skipped cell, and
    a ragged row."""
    wb = (
        '<?xml version="1.0"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        '<sheets><sheet name="Data" sheetId="1" r:id="rId1"/></sheets></workbook>'
    )
    rels = (
        '<?xml version="1.0"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" '
        'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" '
        'Target="worksheets/sheet1.xml"/></Relationships>'
    )
    shared = (
        '<?xml version="1.0"?>'
        '<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'count="3" uniqueCount="3">'
        "<si><t>Name</t></si>"
        "<si><t>City</t></si>"
        "<si><r><t>ALDI</t></r><r><t> Nord</t></r></si></sst>"  # rich text
    )
    sheet = (
        '<?xml version="1.0"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        "<sheetData>"
        '<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c>'
        '<c r="C1" t="inlineStr"><is><t>Score</t></is></c></row>'
        '<row r="2"><c r="A2" t="s"><v>2</v></c><c r="C2"><v>12.5</v></c></row>'
        '<row r="3"><c r="A3" t="b"><v>1</v></c></row>'
        # the r= attribute is optional; position is implied sequential
        '<row r="4"><c t="s"><v>1</v></c><c><v>7</v></c></row>'
        "</sheetData></worksheet>"
    )
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("xl/workbook.xml", wb)
        z.writestr("xl/_rels/workbook.xml.rels", rels)
        z.writestr("xl/sharedStrings.xml", shared)
        z.writestr("xl/worksheets/sheet1.xml", sheet)


def test_read_xlsx_rows_minimal(tmp_path):
    from dedupe_spark.sources.ingest import read_xlsx_rows

    p = str(tmp_path / "mini.xlsx")
    _write_min_xlsx(p)
    rows = read_xlsx_rows(p)
    assert rows == [
        ["Name", "City", "Score"],
        ["ALDI Nord", None, "12.5"],
        ["TRUE", None, None],
        ["City", "7", None],  # cells without r= land at implied positions
    ]


def test_read_excel_df(spark, tmp_path):
    from dedupe_spark.sources.ingest import read_excel_df

    p = str(tmp_path / "mini.xlsx")
    _write_min_xlsx(p)
    df = read_excel_df(spark, p)
    assert df.columns == ["Name", "City", "Score", "source_file"]
    got = [r.asDict() for r in df.orderBy("Name").collect()]
    assert got[0]["Name"] == "ALDI Nord" and got[0]["City"] is None
    assert got[1]["Name"] == "City" and got[1]["City"] == "7"
    assert got[2]["Name"] == "TRUE"
    assert all(r["source_file"] == "mini.xlsx" for r in got)


def test_excel_to_parquet_roundtrip(spark, tmp_path):
    from dedupe_spark.sources.ingest import excel_to_parquet

    p = str(tmp_path / "mini.xlsx")
    _write_min_xlsx(p)
    out = excel_to_parquet(p, str(tmp_path / "mini.parquet"))
    df = spark.read.parquet(out)
    assert df.count() == 3
    assert set(df.columns) == {"Name", "City", "Score"}


KNA2 = "/root/reference/KNA2.xlsx"


def test_read_reference_kna2_if_present(spark):
    """Integration: the reference's own sample workbook (410 data rows x 8
    string columns, SURVEY.md §1) must ingest through the stdlib reader.
    Data-only use of the read-only reference tree; skipped if absent."""
    if not os.path.exists(KNA2):
        pytest.skip("reference sample data not present")
    from dedupe_spark.sources.ingest import read_xlsx_rows

    rows = read_xlsx_rows(KNA2)
    assert len(rows) == 411  # header + 410 data rows (sheet dim A1:H411)
    assert len(rows[0]) == 8
    header = rows[0]
    assert "Name 1" in header and "City" in header


def test_xls_routes_to_biff_parser(tmp_path):
    """The allowlist admits .xls (reference P3 parity); the xlsx parser
    itself stays SpreadsheetML-only and points at the dispatching reader
    (BIFF ingest proper is covered in test_xls.py)."""
    from dedupe_spark.sources.ingest import read_xlsx_rows, validate_extension

    p = str(tmp_path / "legacy.xls")
    with open(p, "wb") as fh:
        fh.write(b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1" + b"\x00" * 64)  # OLE2 magic
    validate_extension(p)  # allowlist accepts it, like the reference
    with pytest.raises(ValueError, match="read_excel_rows"):
        read_xlsx_rows(p)


def test_excel_header_sanitization(spark, tmp_path):
    """Duplicate / backtick / empty header cells must produce unique, safe
    column names (ADVICE r2: DDL-string schema broke on metacharacters)."""
    import zipfile

    from dedupe_spark.sources.ingest import read_excel_df

    sheet = (
        '<?xml version="1.0"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        "<sheetData>"
        '<row r="1">'
        '<c r="A1" t="inlineStr"><is><t>a`b</t></is></c>'
        '<c r="B1" t="inlineStr"><is><t>dup</t></is></c>'
        '<c r="C1" t="inlineStr"><is><t>dup</t></is></c>'
        "</row>"
        '<row r="2"><c r="A2"><v>1</v></c><c r="B2"><v>2</v></c>'
        '<c r="C2"><v>3</v></c><c r="D2"><v>4</v></c></row>'
        "</sheetData></worksheet>"
    )
    p = str(tmp_path / "hdr.xlsx")
    with zipfile.ZipFile(p, "w") as z:
        z.writestr("xl/worksheets/sheet1.xml", sheet)
    df = read_excel_df(spark, p)
    assert df.columns == ["a`b", "dup", "dup_2", "col3", "source_file"]
    row = df.collect()[0]
    assert [row["a`b"], row["dup"], row["dup_2"], row["col3"]] == ["1", "2", "3", "4"]


def test_shared_strings_exclude_phonetic_runs(tmp_path):
    """<rPh> furigana runs must not concatenate into the cell value
    (openpyxl/pandas parity on East Asian workbooks)."""
    import zipfile

    from dedupe_spark.sources.ingest import read_xlsx_rows

    shared = (
        '<?xml version="1.0"?>'
        '<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'count="1" uniqueCount="1">'
        "<si><t>東京</t><rPh sb=\"0\" eb=\"2\"><t>トウキョウ</t></rPh>"
        '<phoneticPr fontId="1"/></si></sst>'
    )
    sheet = (
        '<?xml version="1.0"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        '<sheetData><row r="1"><c r="A1" t="s"><v>0</v></c></row></sheetData>'
        "</worksheet>"
    )
    p = str(tmp_path / "ph.xlsx")
    with zipfile.ZipFile(p, "w") as z:
        z.writestr("xl/sharedStrings.xml", shared)
        z.writestr("xl/worksheets/sheet1.xml", sheet)
    assert read_xlsx_rows(p) == [["東京"]]


def test_read_files_union_jsonl(spark, tmp_path):
    """JSONL through the union scan: all-string model (primitivesAsString),
    lineage column, multi-file union — same contract as the CSV path."""
    import json
    from dedupe_spark.sources.ingest import read_files_union

    f1 = tmp_path / "a.jsonl"
    f2 = tmp_path / "b.jsonl"
    f1.write_text(json.dumps({"name": "Ann", "amount": 12}) + "\n"
                  + json.dumps({"name": "Bob", "amount": 7}) + "\n")
    f2.write_text(json.dumps({"name": "Cyd", "city": "Oslo"}) + "\n")
    df = read_files_union(spark, [str(f1), str(f2)], fmt="jsonl")
    rows = {r["name"]: r for r in df.collect()}
    assert set(rows) == {"Ann", "Bob", "Cyd"}
    assert rows["Ann"]["amount"] == "12"            # all-string model
    assert rows["Cyd"]["amount"] is None            # union of columns
    assert rows["Cyd"]["city"] == "Oslo"
    assert rows["Bob"]["source_file"] == "a.jsonl"  # lineage
