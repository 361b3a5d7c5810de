"""Exact, skew-safe grouped top-k.

The naive plan for "top k rows per group" is a single window
``row_number() OVER (PARTITION BY group ORDER BY ...)`` — at web scale
that puts an entire group on one task, so one hot group (one mega-domain,
one dominant language) serializes the whole stage and can OOM it. The
reference's per-file / per-cluster "show the best N" surfaces
(dedupe_script.py results assembly; backend/main.py result preview) are
exactly this shape once the corpus is 100 TB.

``grouped_topk`` runs the same computation as two bounded phases:

  phase 1 — salt every row into ``group × salt`` subgroups
            (salt = xxhash64(tiebreak) % buckets) and take the LOCAL
            top-k inside each salted subgroup. Each window partition is
            ~|group|/buckets rows, so no task ever sees a whole hot group.
  phase 2 — re-rank the ≤ buckets·k survivors per group. This window IS
            keyed by the raw group, but its input is capped at buckets·k
            rows per group by construction, so the hot-group partition is
            bounded regardless of input skew.

Exactness: every row of the group's true top-k is, within its own salt
bucket, at rank ≤ k (fewer than k rows of the bucket can beat it, because
fewer than k rows of the whole group beat it). Hence phase 1 never drops
a true top-k row and phase 2 computes the exact answer. The ordering
must be total (append a unique tiebreak column) or ranks are
nondeterministic — same contract as the naive window.

Cost: phase 1 shuffles on (group, salt) — same bytes as the naive
shuffle, strictly better balance; phase 2 shuffles buckets·k rows per
group, negligible. Map-side the filter `rank <= k` discards everything
else before phase 2's exchange.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

SALT_COL = "__tk_salt"
RANK_COL = "__tk_rank"


def grouped_topk(
    df: DataFrame,
    group_cols: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    *,
    salt_src: str,
    buckets: int = 32,
    rank_alias: str = "rnk",
) -> DataFrame:
    """Exact top-k rows per group, skew-safe via two-phase salted windows.

    order_by must be a TOTAL order over each group (include a unique
    tiebreak, e.g. the id column) — required for deterministic ranks.
    salt_src names a column hashed to form the salt; any column works for
    correctness, a high-cardinality one (the id) works for balance.
    """
    if k < 1 or buckets < 1:
        raise ValueError("k and buckets must be >= 1")
    gcols = [F.col(c) for c in group_cols]
    salted = df.withColumn(
        SALT_COL, F.pmod(F.xxhash64(F.col(salt_src)), F.lit(buckets))
    )
    local = Window.partitionBy(*gcols, F.col(SALT_COL)).orderBy(*order_by)
    survivors = (
        salted.withColumn(RANK_COL, F.row_number().over(local))
        .where(F.col(RANK_COL) <= k)
        .drop(SALT_COL, RANK_COL)
    )
    final = Window.partitionBy(*gcols).orderBy(*order_by)
    return (
        survivors.withColumn(rank_alias, F.row_number().over(final))
        .where(F.col(rank_alias) <= k)
    )


def grouped_topk_naive(
    df: DataFrame,
    group_cols: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    *,
    rank_alias: str = "rnk",
) -> DataFrame:
    """The single-window plan — the correctness reference for tests and
    the right plan when groups are known-bounded (don't pay two windows
    for data that can't skew)."""
    w = Window.partitionBy(*[F.col(c) for c in group_cols]).orderBy(*order_by)
    return (
        df.withColumn(rank_alias, F.row_number().over(w))
        .where(F.col(rank_alias) <= k)
    )
