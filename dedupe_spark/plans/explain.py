"""Physical-plan inspection helpers.

The scale contract of every operator in this engine is checked against the
plan, not assumed: filters must reach the parquet scan (PushedFilters),
projections must prune the scan (ReadSchema), and relational glue must stay
inside whole-stage codegen. These helpers parse ``explain("formatted")``
output so tests can assert those properties (tests/test_plans.py).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters pushed into file scans, e.g. ['IsNotNull(doc_id)', ...]."""
    text = explain_str(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", text):
        inner = m.group(1).strip()
        if inner:
            out += [f.strip() for f in inner.split(",")]
    return out


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists each file scan actually reads (one list per scan)."""
    text = explain_str(df)
    out = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", text):
        cols = [
            c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()
        ]
        out.append(cols)
    return out


def scan_reads_only(df: DataFrame, allowed: set[str]) -> bool:
    """True iff every file scan in the plan reads a subset of ``allowed`` —
    the column-pruning assertion for a projection over a wide table."""
    schemas = read_schema_columns(df)
    return bool(schemas) and all(set(s) <= allowed for s in schemas)


def wholestage_codegen_spans(df: DataFrame, execute: bool = True) -> int:
    """Number of WholeStageCodegen subtrees in the plan (wider is better
    for relational glue; Python-UDF stages necessarily break them).

    Under AQE the codegen markers only appear in the *executed* final plan
    (as ``*(n)`` stage ids), so by default this runs the query and inspects
    executedPlan.
    """
    if execute:
        df.collect()
        text = df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
        stage_ids = {m.group(1) for m in re.finditer(r"\*\((\d+)\)", text)}
        return len(stage_ids)
    return len(re.findall(r"WholeStageCodegen", explain_str(df)))


def exchange_count(df: DataFrame) -> int:
    """Number of Exchange (shuffle) operators in the initial physical plan.

    The bucketed-layout assertion: a bk-keyed aggregate/join chain over a
    table written with ``bucketBy("bk")`` must plan ZERO exchanges below
    the final pair dedup — write-time co-location replacing runtime
    shuffles (blocking.write_bucketed_blocks).

    Counts only shuffle Exchange nodes (not BroadcastExchange — broadcasts
    move the small side, which is the point), and each node once (the
    formatted plan prints the tree AND a per-node detail section; the
    ``(n) Exchange`` detail headers are unique per node).
    """
    return len(re.findall(r"\(\d+\) Exchange\b", explain_str(df)))
