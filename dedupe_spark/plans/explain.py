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


_LINT_RULES = (
    # (code, marker, why it matters at 100 TB)
    (
        "cartesian_product",
        "CartesianProduct",
        "O(|L|x|R|) pairwise work: a join lost its equi-key",
    ),
    (
        "nested_loop_join",
        "BroadcastNestedLoopJoin",
        "non-equi join fell back to per-row probing of a broadcast side",
    ),
    (
        "single_partition_exchange",
        "Exchange SinglePartition",
        "everything funnels through ONE task (global window/sort/limit "
        "without partitioning)",
    ),
    (
        "row_python_udf",
        "BatchEvalPython",
        "row-at-a-time Python UDF on the data path (ArrowEvalPython is "
        "the vectorized form and is not flagged)",
    ),
)


def lint_plan(df: DataFrame) -> list[dict]:
    """Scan the physical plan for the classic scale killers; returns
    [{code, detail}] findings (empty = clean). The same checks the
    repo's plan tests assert one-off, packaged as a reusable instrument
    — run it on any composed query before shipping it to a real cluster.

    Uses the pre-execution plan (no job is run); under AQE some
    single-partition coalesces only materialize at runtime, so a clean
    lint is necessary, not sufficient.
    """
    text = explain_str(df, mode="simple")
    findings = []
    for code, marker, why in _LINT_RULES:
        n = text.count(marker)
        if n:
            findings.append(
                {"code": code, "detail": f"{n}x {marker}: {why}"}
            )
    return findings


def assert_plan_clean(df: DataFrame, allow: set[str] = frozenset()) -> None:
    """Raise AssertionError listing any lint finding not in ``allow``."""
    bad = [f for f in lint_plan(df) if f["code"] not in allow]
    if bad:
        raise AssertionError(
            "plan lint: " + "; ".join(f["detail"] for f in bad)
        )
