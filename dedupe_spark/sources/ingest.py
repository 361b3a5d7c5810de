"""Ingestion sources (SURVEY.md §2.1 S1-S5, §2.3 J5).

Reference semantics re-expressed Spark-first:

- S1/S3 multi-file union scan with ``source_file`` lineage:
  ``read_files_union`` — Spark's streaming file scan replaces the
  reference's chunked pandas reads (dedupe_script.py:44-136); lineage via
  ``input_file_name()`` instead of a manually appended column.
- S4 schema inference: ``detect_fields`` — all-columns-String parity with
  the reference (dedupe_script.py:156-167); ``inferSchema`` stays off.
- S2 Excel: no distributed reader exists; from-scratch stdlib .xlsx parser
  (zipfile + streaming XML) feeds a driver-side conversion to parquet —
  the reference's own sample workbooks ingest without openpyxl. Legacy
  .xls (BIFF8 in a CFB container) is parsed by sources/xls_biff.py;
  ``read_excel_rows`` sniffs magic bytes and dispatches.
- J5 schema-mapped two-file merge: ``schema_mapped_merge`` — rename-then-
  unionByName of the reference's client-side merge (fileUtils.ts:61-312).
- testdata loader for the driver's parquet tables.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ALLOWED_EXTENSIONS = (".csv", ".parquet", ".xlsx", ".xls")


def validate_extension(path: str) -> None:
    """Reference P3 file-type predicate (main.py:86-91), extended to parquet."""
    if not path.lower().endswith(ALLOWED_EXTENSIONS):
        raise ValueError(
            f"unsupported file type {os.path.splitext(path)[1]!r}; "
            f"allowed: {ALLOWED_EXTENSIONS}"
        )


def read_files_union(
    spark: SparkSession,
    paths: list[str],
    fmt: str = "csv",
    all_string: bool = True,
) -> DataFrame:
    """Union scan of 1-N files with a ``source_file`` lineage column.

    All-string schema mode matches the reference's untyped model (§1.2);
    files may have different column sets (reference J5 keeps the union of
    columns) — missing columns come back null, later normalized to 'N/A'.
    """
    for p in paths:
        # the extension allowlist is the reference UI's upload contract —
        # parquet/jsonl are engine-level formats outside it
        validate_extension(p) if fmt not in ("parquet", "json", "jsonl") else None
    dfs = []
    for p in paths:
        reader = spark.read
        if fmt == "csv":
            reader = reader.option("header", True).option("inferSchema", False)
            df = reader.csv(p)
        elif fmt == "parquet":
            df = reader.parquet(p)
        elif fmt in ("json", "jsonl"):
            # primitivesAsString keeps the reference's all-string model
            # without a cast pass; NOTE schema inference scans the data —
            # at scale pass an explicit schema via spark.read.schema(...)
            # .json(...) instead (queries.q_jsonl_roundtrip does)
            df = reader.option("primitivesAsString", True).json(p)
        else:
            raise ValueError(f"unsupported distributed format {fmt!r}")
        if all_string:
            df = df.select([F.col(c).cast("string").alias(c) for c in df.columns])
        df = df.withColumn(
            "source_file", F.element_at(F.split(F.input_file_name(), "/"), -1)
        )
        dfs.append(df)
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d, allowMissingColumns=True)
    return out


def detect_fields(df: DataFrame, exclude: tuple[str, ...] = ("source_file",)) -> list[dict]:
    """Reference S4: every data column declared String/has_missing
    (dedupe_script.py:156-167)."""
    return [
        {"field": c, "type": "String", "has_missing": True}
        for c in df.columns
        if c not in exclude
    ]


def schema_mapped_merge(
    primary: DataFrame,
    secondary: DataFrame,
    mapping: dict[str, str],
    auto_map_same_names: bool = True,
) -> DataFrame:
    """Reference J5 two-file merge (fileUtils.ts:61-312).

    ``mapping`` maps secondary-column -> primary-column name; unmapped
    columns from both sides are kept (union of columns); rows stack
    (union, not a key join). Same-name columns auto-map like the frontend's
    ColumnMapper default (ColumnMapper.tsx:86-94).
    """
    mapping = dict(mapping)
    if auto_map_same_names:
        for c in secondary.columns:
            if c in primary.columns and c not in mapping:
                mapping[c] = c
    renamed = secondary.select(
        [F.col(c).alias(mapping.get(c, c)) for c in secondary.columns]
    )
    return primary.unionByName(renamed, allowMissingColumns=True)


# ---------------------------------------------------------------------------
# S2 Excel ingest — pure-stdlib .xlsx reader (zipfile + streaming XML).
#
# The reference reads its sample data (KNA2.xlsx etc.) with pandas/openpyxl
# in windowed chunks (dedupe_script.py:44-85). No distributed Excel reader
# exists in Spark, and openpyxl is not installed here, so this is a
# from-scratch SpreadsheetML parser: .xlsx is a zip of XML parts; cells
# live in xl/worksheets/sheetN.xml with shared strings interned in
# xl/sharedStrings.xml. iterparse streams the sheet part, so memory stays
# bounded like the reference's chunked reads. Scope (documented): shared /
# inline / formula-cached strings, booleans, and raw numerics (returned as
# their stored decimal string — date styling is not resolved; the engine's
# model is all-string anyway, §1.2).
# ---------------------------------------------------------------------------

_XLSX_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"


def _col_index(cell_ref: str) -> int:
    """'A1' -> 0, 'AB17' -> 27."""
    n = 0
    for ch in cell_ref:
        if ch.isalpha():
            n = n * 26 + (ord(ch.upper()) - ord("A") + 1)
        else:
            break
    return n - 1


def _xlsx_shared_strings(zf) -> list[str]:
    import xml.etree.ElementTree as ET

    name = "xl/sharedStrings.xml"
    if name not in zf.namelist():
        return []
    out: list[str] = []
    root = ET.fromstring(zf.read(name))
    for si in root.iter(f"{_XLSX_NS}si"):
        # plain <t> or rich-text runs <r><t>..</t></r> — concatenate all t's
        # EXCEPT phonetic guides (<rPh> furigana runs on East Asian
        # workbooks carry a reading of the text, not the text; openpyxl/
        # pandas exclude them too)
        for ph in si.findall(f"{_XLSX_NS}rPh") + si.findall(f"{_XLSX_NS}phoneticPr"):
            si.remove(ph)
        out.append("".join(t.text or "" for t in si.iter(f"{_XLSX_NS}t")))
    return out


def _xlsx_first_sheet(zf) -> str:
    """Resolve the first sheet's part name via workbook rels (falls back to
    xl/worksheets/sheet1.xml)."""
    import xml.etree.ElementTree as ET

    try:
        wb = ET.fromstring(zf.read("xl/workbook.xml"))
        rel_ns = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
        first = next(iter(wb.iter(f"{_XLSX_NS}sheet")))
        rid = first.get(f"{rel_ns}id")
        rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
        pkg_ns = "{http://schemas.openxmlformats.org/package/2006/relationships}"
        for rel in rels.iter(f"{pkg_ns}Relationship"):
            if rel.get("Id") == rid:
                target = rel.get("Target", "")
                return target if target.startswith("xl/") else f"xl/{target}"
    except (KeyError, StopIteration):
        pass
    return "xl/worksheets/sheet1.xml"


def read_excel_rows(path: str) -> list[list[str | None]]:
    """Format-sniffing Excel reader: dispatches on the file's magic bytes
    to the SpreadsheetML (.xlsx, zip) or BIFF8 (.xls, CFB/OLE2) parser —
    the reference allowlist admits both (main.py:86-91) and users routinely
    misname one as the other, so the bytes decide, not the extension."""
    from dedupe_spark.sources.xls_biff import CFB_MAGIC, read_xls_rows

    with open(path, "rb") as fh:
        head = fh.read(8)
    if head == CFB_MAGIC:
        return read_xls_rows(path)
    return read_xlsx_rows(path)


def read_xlsx_rows(path: str) -> list[list[str | None]]:
    """Stream the first worksheet into rows of cell strings (None = absent
    cell). Pure stdlib; see module section comment for the supported cell
    types."""
    import io
    import xml.etree.ElementTree as ET
    import zipfile

    if not zipfile.is_zipfile(path):
        raise ValueError(
            f"{path!r} is not an .xlsx (zip/SpreadsheetML) workbook; for "
            "legacy .xls (BIFF8) use read_excel_rows, which sniffs the "
            "format and dispatches to the CFB/BIFF parser"
        )
    with zipfile.ZipFile(path) as zf:
        shared = _xlsx_shared_strings(zf)
        sheet = _xlsx_first_sheet(zf)
        rows: list[list[str | None]] = []
        with zf.open(sheet) as fh:
            row_cells: dict[int, str] = {}
            next_col = 0  # implied position: the r= attribute is OPTIONAL
            for event, el in ET.iterparse(io.BufferedReader(fh)):
                tag = el.tag
                if tag == f"{_XLSX_NS}c":
                    ref = el.get("r")
                    # minimal writers omit r; position is then sequential
                    pos = _col_index(ref) if ref else next_col
                    next_col = pos + 1
                    ctype = el.get("t", "n")
                    if ctype == "inlineStr":
                        val = "".join(
                            t.text or "" for t in el.iter(f"{_XLSX_NS}t")
                        )
                    else:
                        v = el.find(f"{_XLSX_NS}v")
                        if v is None or v.text is None:
                            el.clear()
                            continue
                        if ctype == "s":
                            val = shared[int(v.text)]
                        elif ctype == "b":
                            val = "TRUE" if v.text.strip() == "1" else "FALSE"
                        else:  # n, str (formula cache), e
                            val = v.text
                    row_cells[pos] = val
                    el.clear()
                elif tag == f"{_XLSX_NS}row":
                    width = max(row_cells) + 1 if row_cells else 0
                    rows.append([row_cells.get(i) for i in range(width)])
                    row_cells = {}
                    next_col = 0
                    el.clear()
    # pad ragged rows to the sheet's max width
    width = max((len(r) for r in rows), default=0)
    return [r + [None] * (width - len(r)) for r in rows]


def _header_names(raw: list) -> list[str]:
    """Header row -> safe, unique column names: absent cells get col<i>,
    repeats get a _<k> suffix (duplicate or metacharacter headers would
    otherwise break createDataFrame / parquet)."""
    seen: dict[str, int] = {}
    out: list[str] = []
    for i, h in enumerate(raw):
        name = h if h not in (None, "") else f"col{i}"
        k = seen.get(name, 0)
        seen[name] = k + 1
        out.append(name if k == 0 else f"{name}_{k + 1}")
    return out


def read_excel_df(spark: SparkSession, path: str) -> DataFrame:
    """S2: first row = header (reference header probe, dedupe_script.py:58),
    every cell a string, plus ``source_file`` lineage — the Excel twin of
    read_files_union."""
    from pyspark.sql.types import StringType, StructField, StructType

    rows = read_excel_rows(path)
    if not rows:
        raise ValueError(f"empty worksheet in {path}")
    header = _header_names(rows[0])
    data = [[c for c in r] for r in rows[1:]]
    # StructType, not a DDL string: header cells are arbitrary user text
    # (backticks, dots, spaces) and must never be parsed as DDL
    schema = StructType([StructField(h, StringType()) for h in header])
    df = spark.createDataFrame(data, schema)
    return df.withColumn("source_file", F.lit(os.path.basename(path)))


def excel_to_parquet(xlsx_path: str, out_path: str) -> str:
    """S2 Excel ingest: driver-side stdlib reader -> parquet (Excel has no
    distributed reader; the parquet handoff is the distributed boundary)."""
    import pandas as pd

    rows = read_excel_rows(xlsx_path)
    if not rows:
        raise ValueError(f"empty worksheet in {xlsx_path}")
    header = _header_names(rows[0])
    pd.DataFrame(rows[1:], columns=header, dtype=object).to_parquet(out_path)
    return out_path


def drop_empty_rows(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """P7 (reference fileUtils.ts:56-58): drop rows where every data cell is
    empty/blank/null."""
    cols = cols or [c for c in df.columns if c != "source_file"]
    joined = F.concat_ws("", *[F.coalesce(F.trim(F.col(c)), F.lit("")) for c in cols])
    return df.where(joined != "")


def with_row_index(df: DataFrame, order_col: str, name: str = "record_id") -> DataFrame:
    """P8 parity helper (reference dedupe_script.py:41): positional string
    record ids via a ranking window over an explicit order column.

    The engine itself keys records by natural key (url/doc_id) — this exists
    only for byte-parity tests against reference exports. The global window
    is a deliberate single-partition bottleneck; never use it at scale.
    """
    from pyspark.sql import Window

    w = Window.orderBy(order_col)
    return df.withColumn(
        name, (F.row_number().over(w) - 1).cast("string")
    )


def lookup_source_file(
    df: DataFrame, lineage: DataFrame, id_col: str = "record_id"
) -> DataFrame:
    """J4 (reference useFileProcessor.ts:168-183): attach source_file via a
    broadcast equi-join on record id."""
    return df.join(
        F.broadcast(lineage.select(id_col, "source_file")), id_col, "left"
    )


def write_json(df: DataFrame, path: str) -> None:
    """S6/S7 JSON sink (reference dedupe_script.py:394-417 / main.py:125-145):
    results as JSON lines."""
    df.write.mode("overwrite").json(path)


TESTDATA_TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def load_testdata(
    spark: SparkSession, sf_dir: str, tables: list[str] | None = None
) -> dict[str, DataFrame]:
    """Load the driver's parquet tables from an sf directory."""
    return {
        t: spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet"))
        for t in (tables or TESTDATA_TABLES)
    }
