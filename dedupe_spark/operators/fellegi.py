"""Fellegi–Sunter probabilistic record-linkage weights.

The canonical probabilistic ER model (Fellegi & Sunter 1969, JASA; the
model behind Splink and most national-statistics linkage systems): for
each comparison field k with agreement indicator γ_k, estimate

    m_k = P(γ_k = 1 | pair is a match)
    u_k = P(γ_k = 1 | pair is a non-match)

and score a pair by the log-likelihood ratio Σ_k w_k where w_k is
ln(m_k/u_k) on agreement and ln((1-m_k)/(1-u_k)) on disagreement. The
engine's LR scorer (operators/scoring.py) is the discriminative
counterpart; this is the generative classic, estimated here supervised
(labels from an exact-Jaccard ground truth) with Laplace smoothing
(+0.5 / +1) so no weight is ±inf.

Scale design (the 100 TB story):
- Estimation is ONE map-side-combinable aggregation over the candidate
  relation → a single 1-row parameter relation (2+2·k numbers). The
  parameters are cross-joined back by broadcast, so scoring is a pure
  projection: the candidate relation is never re-shuffled, and there is
  no per-field melt/explode (a stack+join plan would shuffle
  |pairs|·k rows to re-sum per pair).
- Engine-portable floats, the operators/lm.py micro-nat contract: m_k
  and u_k are single divisions of exact integers, each field weight is
  quantized to integer micro-nats (round(ln(·)·1e6) AS BIGINT) before
  the per-pair sum, so the score is exact integer arithmetic —
  associative and bit-identical in the DuckDB twin.

Reference parity note: the reference app's engine (the dedupe pip
package) trains a regularized logistic model, not Fellegi–Sunter; this
operator is part of the beyond-reference ER toolkit (SURVEY.md §6).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MICRO = 1000000.0


def _micro_ln(x):
    return F.round(F.log(x) * F.lit(_MICRO), 0).cast("long")


def fellegi_sunter_scores(
    pairs: DataFrame, label_col: str, gamma_cols: Sequence[str]
) -> DataFrame:
    """Score labeled comparison vectors with Fellegi–Sunter weights.

    ``pairs``: one row per candidate pair with ``label_col`` (1 = match)
    and one 0/1 agreement column per field. Returns the input key/label
    columns plus ``fs_micros`` (the summed log-likelihood-ratio weight in
    integer micro-nats). m/u are estimated from the same relation —
    callers wanting a train/score split pass the training slice through
    this and reuse the params, but the one-relation form is the common
    diagnostics query.
    """
    lbl = F.col(label_col)
    aggs = [
        F.sum(lbl).cast("long").alias("n_m"),
        F.sum(1 - lbl).cast("long").alias("n_u"),
    ]
    for g in gamma_cols:
        aggs.append(F.sum(lbl * F.col(g)).cast("long").alias(f"am_{g}"))
        aggs.append(F.sum((1 - lbl) * F.col(g)).cast("long").alias(f"au_{g}"))
    counts = pairs.agg(*aggs)
    # Laplace-smoothed probabilities: exact-integer inputs, one division
    # each, then one ln — identical IEEE ops in the DuckDB twin
    wcols = []
    for g in gamma_cols:
        m = (F.col(f"am_{g}") + 0.5) / (F.col("n_m") + 1)
        u = (F.col(f"au_{g}") + 0.5) / (F.col("n_u") + 1)
        wcols.append((_micro_ln(m) - _micro_ln(u)).alias(f"wa_{g}"))
        wcols.append((_micro_ln(1 - m) - _micro_ln(1 - u)).alias(f"wd_{g}"))
    params = counts.select(*wcols)
    score = None
    for g in gamma_cols:
        w = F.when(F.col(g) == 1, F.col(f"wa_{g}")).otherwise(F.col(f"wd_{g}"))
        score = w if score is None else score + w
    keep = [c for c in pairs.columns]
    return pairs.crossJoin(F.broadcast(params)).select(
        *keep, score.alias("fs_micros")
    )


def fellegi_sunter_sql(
    pairs_cte: str, label_col: str, gamma_cols: Sequence[str]
) -> str:
    """DuckDB twin over a CTE named ``fs_pairs`` (provided by
    ``pairs_cte``) with the same label/gamma columns."""
    aggs = [
        f"CAST(sum({label_col}) AS BIGINT) AS n_m",
        f"CAST(sum(1 - {label_col}) AS BIGINT) AS n_u",
    ]
    for g in gamma_cols:
        aggs.append(f"CAST(sum({label_col} * {g}) AS BIGINT) AS am_{g}")
        aggs.append(f"CAST(sum((1 - {label_col}) * {g}) AS BIGINT) AS au_{g}")
    wexprs = []
    for g in gamma_cols:
        m = f"((am_{g} + 0.5) / (n_m + 1))"
        u = f"((au_{g} + 0.5) / (n_u + 1))"
        wexprs.append(
            f"CAST(round(ln({m}) * 1e6, 0) AS BIGINT)"
            f" - CAST(round(ln({u}) * 1e6, 0) AS BIGINT) AS wa_{g}"
        )
        wexprs.append(
            f"CAST(round(ln(1 - {m}) * 1e6, 0) AS BIGINT)"
            f" - CAST(round(ln(1 - {u}) * 1e6, 0) AS BIGINT) AS wd_{g}"
        )
    score = " + ".join(
        f"(CASE WHEN {g} = 1 THEN wa_{g} ELSE wd_{g} END)" for g in gamma_cols
    )
    return f"""
WITH {pairs_cte},
fs_counts AS (
  SELECT {', '.join(aggs)} FROM fs_pairs
), fs_params AS (
  SELECT {', '.join(wexprs)} FROM fs_counts
)
SELECT fs_pairs.*, {score} AS fs_micros
FROM fs_pairs CROSS JOIN fs_params
"""
