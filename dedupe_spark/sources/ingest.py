"""Ingestion sources (SURVEY.md §2.1 S1-S5, §2.3 J5).

Reference semantics re-expressed Spark-first:

- S1/S3 multi-file union scan with ``source_file`` lineage:
  ``read_files_union`` — Spark's streaming file scan replaces the
  reference's chunked pandas reads (dedupe_script.py:44-136); lineage via
  ``input_file_name()`` instead of a manually appended column.
- S4 schema inference: ``detect_fields`` — all-columns-String parity with
  the reference (dedupe_script.py:156-167); ``inferSchema`` stays off.
- S2 Excel: no distributed reader exists; gated driver-side conversion to
  parquet (openpyxl is optional — absent in this sandbox).
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
        validate_extension(p) if fmt != "parquet" else None
    dfs = []
    for p in paths:
        reader = spark.read
        if fmt == "csv":
            reader = reader.option("header", True).option("inferSchema", False)
            df = reader.csv(p)
        elif fmt == "parquet":
            df = reader.parquet(p)
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


def excel_to_parquet(xlsx_path: str, out_path: str, chunk_rows: int = 50_000) -> str:
    """S2 Excel ingest: driver-side openpyxl -> parquet (Excel has no
    distributed reader). Gated: raises a clear error when openpyxl is
    absent (it is not installed in this sandbox)."""
    try:
        import openpyxl  # noqa: F401
        import pandas as pd
    except ImportError as e:  # pragma: no cover - environment-dependent
        raise NotImplementedError(
            "Excel ingest needs openpyxl; convert to CSV/parquet upstream"
        ) from e
    pd.read_excel(xlsx_path, dtype=str).to_parquet(out_path)  # pragma: no cover
    return out_path  # pragma: no cover


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
