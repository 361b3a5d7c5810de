"""Exact grouped quantiles without sorting groups on single tasks.

``percentile_approx`` is not value-reproducible across engines, and the
textbook exact plan — sort each group's rows under one window — puts a
whole hot group on one task. This operator computes EXACT discrete
quantiles from the (group, value) COUNT relation instead:

  1. ``groupBy(group, value).count()`` — map-side combinable, shuffles at
     most one row per distinct (group, value), never the raw rows;
  2. a per-group cumulative sum over value order. This window partitions
     by group, but its input is the DISTINCT-VALUE relation: for bounded
     domains (lengths, scores, counts — the usual quantile subjects) that
     is orders of magnitude smaller than the group. For genuinely
     unbounded/continuous domains, pre-bucket (round) first — exactness
     then holds per bucket;
  3. quantile p = the smallest value whose cumulative count reaches
     rank ceil(p·N) — one MIN(CASE WHEN ...) aggregate per p.

Definition pinned (and mirrored verbatim in the SQL twin — NOT the
vendor's quantile_disc, whose tie/interpolation rules vary): lower
discrete quantile over ascending values, nulls excluded.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def grouped_quantiles_exact(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    ps: Sequence[float],
    aliases: Sequence[str],
) -> DataFrame:
    """One row per group; one exact discrete-quantile column per p."""
    if len(ps) != len(aliases):
        raise ValueError("ps and aliases must pair up")
    if not all(0 < p <= 1 for p in ps):
        raise ValueError("quantiles must be in (0, 1]")
    gcols = [F.col(c) for c in group_cols]
    vc = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(*gcols, F.col(value_col))
        .agg(F.count("*").alias("__c"))
    )
    wcum = (
        Window.partitionBy(*gcols)
        .orderBy(F.col(value_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy(*gcols)
    z = vc.select(
        *gcols,
        F.col(value_col),
        F.sum("__c").over(wcum).alias("__cum"),
        F.sum("__c").over(wtot).alias("__n"),
    )
    # rank m = ceil(p*N): p*N computed in doubles can land an ulp ABOVE
    # the true rational (0.55*100 = 55.000000000000007), making ceil
    # return m+1 — the 1e-9 back-off restores the true rank for every
    # p expressible at nanoprecision, mirrored in the SQL twin
    aggs = [
        F.min(
            F.when(
                F.col("__cum")
                >= F.ceil(F.lit(p) * F.col("__n") - F.lit(1e-9)),
                F.col(value_col),
            )
        ).alias(a)
        for p, a in zip(ps, aliases)
    ]
    return z.groupBy(*gcols).agg(*aggs)


def grouped_quantiles_sql(
    table: str,
    group_col: str,
    value_col: str,
    ps: Sequence[float],
    aliases: Sequence[str],
) -> str:
    """DuckDB twin — same rank definition, same ceil arithmetic."""
    cols = ",\n       ".join(
        f"min(CASE WHEN cum >= CAST(ceil({p!r} * n - 1e-9) AS BIGINT) "
        f"THEN v END) AS {a}"
        for p, a in zip(ps, aliases)
    )
    return f"""
WITH vc AS (
  SELECT {group_col} AS g, {value_col} AS v, count(*) AS c
  FROM {table} WHERE {value_col} IS NOT NULL GROUP BY 1, 2
), z AS (
  SELECT g, v,
         sum(c) OVER (PARTITION BY g ORDER BY v
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         sum(c) OVER (PARTITION BY g) AS n
  FROM vc
)
SELECT g AS {group_col},
       {cols}
FROM z GROUP BY g
"""
