"""One-pass table profiling: per-column row/null counts, deterministic
HLL distinct estimate, lexicographic min/max.

The data-quality first-look every ingest runs. Shape: the table is
melted to (column, value-as-string) with ``stack`` — ONE scan feeds
every column's profile (per-column jobs would re-scan the table per
column; at 100 TB the melt's k× row blowup is map-local and feeds a
map-side-combinable aggregate, the re-scans are k× the I/O). Distinct
counts use the md5 HyperLogLog from operators/sketches.py, so the whole
profile — estimates included — is value-reproducible in the DuckDB twin.

min/max are over the string representation (profiling summary, not
typed statistics) and truncated to 24 chars; casts are engine-portable
for int/string columns (the driver tables' types). Nulls: counted,
excluded from distinct/min/max.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sketches import _ALPHA, _RHO_CAP, M

_TRUNC = 24


def profile_table(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """One row per column: (column, n_rows, n_null, distinct_est,
    min_val, max_val).

    Genuinely single-scan: level 1 aggregates the melt by (col, HLL
    register) — map-side combinable, ≤ cols×(m+1) output rows — carrying
    counts/min/max partials AND the register's max rho; level 2 folds
    those to one row per column and applies the HLL estimator. A
    base-stats ⋈ sketch two-branch plan would scan the table twice
    (Spark does not auto-reuse the melt subtree).
    """
    from .sketches import _hex_pair_int, _rho

    pairs = ", ".join(f"'{c}', CAST({c} AS STRING)" for c in cols)
    melted = df.selectExpr(f"stack({len(cols)}, {pairs}) AS (col, val)")
    h = F.md5(F.col("val"))
    lvl1 = (
        melted.withColumn(
            "reg", F.when(F.col("val").isNotNull(), _hex_pair_int(h, 1))
        )
        .withColumn("rho", F.when(F.col("val").isNotNull(), _rho(h)))
        .groupBy("col", "reg")
        .agg(
            F.count("*").alias("cnt"),
            F.min(F.substring("val", 1, _TRUNC)).alias("min_v"),
            F.max(F.substring("val", 1, _TRUNC)).alias("max_v"),
            F.max("rho").alias("rho_max"),
        )
    )
    lvl2 = lvl1.groupBy("col").agg(
        F.sum("cnt").alias("n_rows"),
        F.sum(
            F.when(F.col("reg").isNull(), F.col("cnt")).otherwise(F.lit(0))
        ).alias("n_null"),
        F.min("min_v").alias("min_val"),
        F.max("max_v").alias("max_val"),
        F.sum(
            F.when(
                F.col("reg").isNotNull(),
                F.expr(f"shiftleft(CAST(1 AS BIGINT), {_RHO_CAP} - rho_max)"),
            ).otherwise(F.lit(0).cast("long"))
        ).alias("z_used"),
        F.count("reg").alias("n_used"),  # count skips the null-reg row
    )
    v = F.lit(M) - F.col("n_used")
    one = F.lit(1).cast("long")
    z = F.col("z_used") + v.cast("long") * F.shiftleft(one, _RHO_CAP)
    raw = F.lit(_ALPHA * M * M * float(2**_RHO_CAP)) / z.cast("double")
    est = F.when(F.col("n_used") == 0, F.lit(0.0)).otherwise(
        F.when(
            (raw <= 2.5 * M) & (v > 0), F.lit(float(M)) * F.log(F.lit(M) / v)
        ).otherwise(raw)
    )
    return lvl2.select(
        F.col("col").alias("column"),
        "n_rows",
        "n_null",
        F.round(est, 6).alias("distinct_est"),
        "min_val",
        "max_val",
    )


def profile_table_sql(table: str, cols: Sequence[str]) -> str:
    """DuckDB twin: UNION ALL melt + the shared md5-HLL estimator
    fragment (sketches.hll_estimator_ctes — one source for the
    correction arithmetic across every HLL oracle)."""
    from .sketches import hll_estimator_ctes, hll_reg_sql, hll_rho_sql

    melt = "\n  UNION ALL\n  ".join(
        f"SELECT '{c}' AS col, CAST({c} AS VARCHAR) AS val FROM {table}"
        for c in cols
    )
    est_ctes = hll_estimator_ctes("regs", ["col"], "distinct_est")
    return f"""
WITH melted AS (
  {melt}
), base AS (
  SELECT col, count(*) AS n_rows,
         CAST(sum(CASE WHEN val IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_null,
         min(substr(val, 1, {_TRUNC})) AS min_val,
         max(substr(val, 1, {_TRUNC})) AS max_val
  FROM melted GROUP BY col
), h AS (
  SELECT col, md5(val) AS hh FROM melted WHERE val IS NOT NULL
), regs AS (
  SELECT col, {hll_reg_sql('hh')} AS reg, max({hll_rho_sql('hh')}) AS rho
  FROM h GROUP BY 1, 2
), {est_ctes}
SELECT base.col AS "column", base.n_rows, base.n_null,
       coalesce(hll_est.distinct_est, 0.0) AS distinct_est,
       base.min_val, base.max_val
FROM base LEFT JOIN hll_est ON base.col = hll_est.col
"""
