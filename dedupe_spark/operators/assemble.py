"""Cluster assembly + export (SURVEY.md A1/O1/S8, J3/J4).

Reference semantics: /root/reference/backend/dedupe_script.py:363-392
(group_size, mean confidence, size>1 filter, confidence-desc sort) and
frontend/src/hooks/useFileProcessor.ts:163-242 (CSV export column order,
``N/A`` -> empty string, removal anti-join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..normalize import MISSING


def assemble_clusters(
    members: DataFrame,
    records: DataFrame,
    id_col: str,
    record_cols: list[str],
    min_size: int = 2,
) -> DataFrame:
    """members(record_id, cluster_id, confidence) ⋈ records ->
    clusters(cluster_id, group_size, confidence_score, records).

    records array is sorted by record_id for deterministic output; clusters
    ordered by confidence_score desc (dedupe_script.py:392).
    """
    joined = members.join(
        records.select(F.col(id_col).alias("record_id"), *record_cols), "record_id"
    )
    member_struct = F.struct(
        *[F.col(c) for c in record_cols],
        F.col("confidence").alias("confidence_score"),
        F.col("record_id"),
    )
    by_record_id = lambda l, r: F.when(l["record_id"] < r["record_id"], -1).otherwise(
        F.when(l["record_id"] > r["record_id"], 1).otherwise(0)
    )
    return (
        joined.groupBy("cluster_id")
        .agg(
            F.count("*").alias("group_size"),
            F.avg("confidence").alias("confidence_score"),
            F.array_sort(F.collect_list(member_struct), by_record_id).alias("records"),
        )
        .where(F.col("group_size") >= min_size)
        .orderBy(F.desc("confidence_score"), F.asc("cluster_id"))
    )


def export_columns(data_cols: list[str]) -> list[str]:
    """Reference CSV export order (useFileProcessor.ts:196-203):
    cluster_id, sorted data columns, record_id, confidence_score, source_file."""
    meta = {"cluster_id", "record_id", "confidence_score", "source_file"}
    data = sorted(c for c in data_cols if c not in meta)
    return ["cluster_id", *data, "record_id", "confidence_score", "source_file"]


def export_flat(clusters: DataFrame, data_cols: list[str]) -> DataFrame:
    """Explode clusters back to one row per member in export column order,
    mapping the ``N/A`` sentinel back to '' (useFileProcessor.ts:207)."""
    m = clusters.select(
        "cluster_id", F.explode("records").alias("rec")
    ).select("cluster_id", "rec.*")
    cols = [c for c in export_columns(data_cols) if c in m.columns]
    out = m.select(*cols)
    for c in cols:
        if dict(out.dtypes)[c] == "string":
            out = out.withColumn(
                c, F.when(F.col(c) == MISSING, F.lit("")).otherwise(F.col(c))
            )
    return out


def remove_duplicates(records: DataFrame, removals: DataFrame, id_col: str) -> DataFrame:
    """Anti-join 'remove selected duplicates' export (J3,
    useFileProcessor.ts:166-177)."""
    return records.join(
        removals.select(F.col(removals.columns[0]).alias(id_col)).distinct(),
        id_col,
        "left_anti",
    )


def write_csv(df: DataFrame, path: str) -> None:
    """RFC-4180-quoted CSV sink (S8) — Spark's writer quotes per RFC."""
    df.write.mode("overwrite").option("header", True).csv(path)


def canonicalize_clusters(
    members: DataFrame,
    cluster_col: str = "cluster_id",
    id_col: str = "record_id",
    mode_cols: tuple[str, ...] = (),
    rep_order: tuple = (),
) -> DataFrame:
    """Golden-record survivorship: fuse each duplicate cluster into one
    canonical row. For every column in ``mode_cols`` take the in-cluster
    majority value (ties: higher count first, then value ascending NULLS
    LAST — deterministic); the representative record is the first member
    under ``rep_order`` (a tuple of Column sort expressions, e.g.
    ``(F.col("n_chars").desc_nulls_last(), F.col("doc_id").asc())``).

    Returns ``(cluster_col, n_members, canon_<col>..., rep_id)``.

    Scale shape: one map-side-combinable groupBy per mode column (the
    grouped relation is |distinct (cluster, value)|, far smaller than the
    members), a window over that small relation, and one window shuffle
    on ``cluster_col`` for the representative — no self-joins, nothing
    quadratic in cluster size.
    """
    from pyspark.sql import Window

    out = members.groupBy(cluster_col).agg(F.count("*").alias("n_members"))
    for c in mode_cols:
        w = Window.partitionBy(cluster_col).orderBy(
            F.col("_n").desc(), F.col(c).asc_nulls_last()
        )
        top = (
            members.groupBy(cluster_col, c)
            .agg(F.count("*").alias("_n"))
            .withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select(cluster_col, F.col(c).alias(f"canon_{c}"))
        )
        out = out.join(top, cluster_col)
    wr = Window.partitionBy(cluster_col).orderBy(*rep_order)
    rep = (
        members.withColumn("_rn", F.row_number().over(wr))
        .where(F.col("_rn") == 1)
        .select(cluster_col, F.col(id_col).alias("rep_id"))
    )
    return out.join(rep, cluster_col)
