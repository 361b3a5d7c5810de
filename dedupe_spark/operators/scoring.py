"""Pairwise feature extraction + match scoring (SURVEY.md §2.6 M1/M7/M8).

The reference scores candidate pairs with dedupe 3.0.3's C comparators and a
regularized logistic regression, fanned out with multiprocessing (call site
/root/reference/backend/dedupe_script.py:360). Spark-first design: candidate
pairs are joined to the (projected, normalized) record table twice — two
shuffle-hash/sort-merge equi-joins Catalyst plans on its own — and then a
single Arrow-batched pandas UDF computes the whole field-distance vector AND
the sigmoid in one pass. The LR model is <1 KB: it travels to executors in
the UDF closure (an explicit broadcast of a weight struct would buy nothing).

Field types mirror dedupe variables (dedupe_script.py:266-286):
  String   -> Jaro-Winkler + normalized Levenshtein (affine-gap stand-ins)
  Text     -> token-count cosine
  Exact    -> 0/1 equality
  Price    -> normalized numeric difference
Missing semantics (has_missing=True, dedupe_script.py:159-162): the sentinel
"N/A" zeroes the distance features and raises a per-field missing indicator,
matching dedupe's missing-data treatment.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

from ..functions.features import (  # noqa: F401  (re-exported public API)
    FieldSpec,
    compute_features,
    feature_names,
)
from ..model import LogisticModel, sigmoid


# ---------------------------------------------------------------------------
# Spark-side: pair table assembly + scoring UDF
# ---------------------------------------------------------------------------


def attach_pair_fields(
    pairs: DataFrame,
    records: DataFrame,
    id_col: str,
    field_cols: list[str],
) -> DataFrame:
    """pairs(id1,id2) ⋈ records twice -> (id1, id2, l_<f>..., r_<f>...).

    Records are projected to id + match fields *before* the join so the
    parquet scan prunes to exactly the needed columns (ReadSchema) and the
    shuffle moves no dead weight (html/text stay behind).
    """
    proj = records.select(F.col(id_col).alias("_rid"), *field_cols)
    l = proj.select(
        F.col("_rid").alias("id1"), *[F.col(c).alias(f"l_{c}") for c in field_cols]
    )
    r = proj.select(
        F.col("_rid").alias("id2"), *[F.col(c).alias(f"r_{c}") for c in field_cols]
    )
    return pairs.join(l, "id1").join(r, "id2")


def make_score_udf(model: LogisticModel, fields: list[FieldSpec], norm_suffix: str = ""):
    """pandas UDF (l_f1, r_f1, l_f2, r_f2, ...) -> double match probability.

    Column order: interleaved left/right per field, in ``fields`` order. The
    model's feature_names must equal feature_names(fields).
    """
    expected = feature_names(fields)
    if model.feature_names and model.feature_names != expected:
        raise ValueError(
            f"model features {model.feature_names} != spec {expected}"
        )
    w = model.weights.copy()
    b = float(model.intercept)
    fields = list(fields)

    @pandas_udf(DoubleType())
    def _score(*cols: pd.Series) -> pd.Series:
        left = {f.name: cols[2 * i] for i, f in enumerate(fields)}
        right = {f.name: cols[2 * i + 1] for i, f in enumerate(fields)}
        X = compute_features(left, right, fields)
        return pd.Series(sigmoid(X @ w + b))

    return _score


def score_pairs(
    pairs: DataFrame,
    records: DataFrame,
    model: LogisticModel,
    fields: list[FieldSpec],
    id_col: str,
    norm_suffix: str = "_norm",
    threshold: float | None = None,
) -> DataFrame:
    """(id1, id2, score) for every candidate pair; optional threshold filter
    (reference M8: keep score >= similarity_threshold,
    dedupe_script.py:341-342)."""
    field_cols = [f.name + norm_suffix for f in fields]
    wide = attach_pair_fields(pairs, records, id_col, field_cols)
    # AQE's byte-based partition coalescing is tuned for JVM operators; a
    # pandas-UDF stage is CPU-bound per *row*, so a ~100MB pair table would
    # coalesce to 1-2 partitions and starve the cores. Spread the UDF stage
    # across the cluster's full parallelism explicitly — at 3 tasks/core so
    # dynamic scheduling absorbs stragglers (1 task/core makes the stage
    # wall-clock equal to the single slowest core).
    par = pairs.sparkSession.sparkContext.defaultParallelism
    wide = wide.repartition(par * 3)
    udf = make_score_udf(model, fields)
    in_cols = []
    for c in field_cols:
        in_cols += [F.col(f"l_{c}"), F.col(f"r_{c}")]
    scored = wide.select("id1", "id2", udf(*in_cols).alias("score"))
    if threshold is not None:
        scored = scored.where(F.col("score") >= F.lit(float(threshold)))
    return scored
