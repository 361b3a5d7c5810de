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


def tf_adjusted_scores(
    pairs: DataFrame,
    values: DataFrame,
    label_col: str,
    gamma_cols: Sequence[str],
    tf_gamma: str,
    value_col: str,
) -> DataFrame:
    """Term-frequency-adjusted Fellegi–Sunter weights (the Splink
    ``tf_adjustments`` refinement; Winkler 1989 value-specific
    u-probabilities): agreement on a RARE value of one designated field
    is stronger evidence than agreement on a common one — two records
    sharing surname "Zybkowski" are far likelier duplicates than two
    sharing "Smith", yet the generic model prices both identically.

    The generic agreement Bayes factor m/u uses the field-level
    u = P(agree | non-match) ≈ Σ_v tf(v)². For a pair agreeing on the
    SPECIFIC value v, the value-specific chance agreement probability is
    tf(v) = cnt(v)/N, so the adjusted factor is m/tf(v) and the adjusted
    agreement weight ln(m) − ln(tf(v)). Disagreement weights and every
    other field keep their generic form.

    ``pairs`` carries ``label_col``, the 0/1 ``gamma_cols``, and
    ``value_col`` — the SHARED value when ``tf_gamma`` agrees (NULL on
    disagreement). ``values`` is the one-column record-level relation the
    term frequencies are counted over (the full record table's field, not
    just candidates — tf must reflect the population).

    Returns the input columns plus ``fs_micros`` (generic),
    ``fs_tf_micros`` (adjusted) and ``tf_adj_micros`` (their difference:
    positive for rarer-than-baseline values, negative for stopword-grade
    ones, 0 on disagreement).

    Scale shape: the tf relation is VOCABULARY-bounded (one row per
    distinct value) and joins back broadcast, so the pair relation never
    re-shuffles — a hot value ("smith") is a broadcast-hash probe, never
    a skewed exchange. All weights quantized to integer micro-nats
    (each a single ln of a single exact-integer division), so both sums
    are exact int64 arithmetic, bit-identical in the DuckDB twin.
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
    wcols = []
    for g in gamma_cols:
        m = (F.col(f"am_{g}") + 0.5) / (F.col("n_m") + 1)
        u = (F.col(f"au_{g}") + 0.5) / (F.col("n_u") + 1)
        wcols.append((_micro_ln(m) - _micro_ln(u)).alias(f"wa_{g}"))
        wcols.append((_micro_ln(1 - m) - _micro_ln(1 - u)).alias(f"wd_{g}"))
    m_tf = (F.col(f"am_{tf_gamma}") + 0.5) / (F.col("n_m") + 1)
    wcols.append(_micro_ln(m_tf).alias("wm_tf"))
    params = counts.select(*wcols)

    vcol = values.columns[0]
    vals = values.where(F.col(vcol).isNotNull())
    n_total = vals.agg(F.count("*").cast("long").alias("n_vals"))
    tf = (
        vals.groupBy(F.col(vcol).alias("_v"))
        .agg(F.count("*").cast("long").alias("_cnt"))
        .crossJoin(F.broadcast(n_total))
        .select(
            "_v",
            _micro_ln(F.col("_cnt") / F.col("n_vals")).alias("_ln_tf"),
        )
    )
    keep = list(pairs.columns)
    scored = pairs.crossJoin(F.broadcast(params)).join(
        F.broadcast(tf), F.col(value_col) == F.col("_v"), "left"
    )
    generic = None
    adjusted = None
    for g in gamma_cols:
        wg = F.when(F.col(g) == 1, F.col(f"wa_{g}")).otherwise(F.col(f"wd_{g}"))
        generic = wg if generic is None else generic + wg
        if g == tf_gamma:
            wt = F.when(
                F.col(g) == 1, F.col("wm_tf") - F.col("_ln_tf")
            ).otherwise(F.col(f"wd_{g}"))
        else:
            wt = wg
        adjusted = wt if adjusted is None else adjusted + wt
    return scored.select(
        *keep,
        generic.alias("fs_micros"),
        adjusted.alias("fs_tf_micros"),
        (adjusted - generic).alias("tf_adj_micros"),
    )


def tf_adjusted_sql(
    pairs_cte: str,
    values_sql: str,
    label_col: str,
    gamma_cols: Sequence[str],
    tf_gamma: str,
    value_col: str,
) -> str:
    """DuckDB twin of :func:`tf_adjusted_scores` over a CTE named
    ``fs_pairs`` (provided by ``pairs_cte``; must carry ``value_col``)
    and ``values_sql`` — a SELECT yielding one column ``v`` per record."""
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
    m_tf = f"((am_{tf_gamma} + 0.5) / (n_m + 1))"
    wexprs.append(f"CAST(round(ln({m_tf}) * 1e6, 0) AS BIGINT) AS wm_tf")
    gen_terms = []
    adj_terms = []
    for g in gamma_cols:
        gen_terms.append(f"(CASE WHEN {g} = 1 THEN wa_{g} ELSE wd_{g} END)")
        if g == tf_gamma:
            adj_terms.append(
                f"(CASE WHEN {g} = 1 THEN wm_tf - _ln_tf ELSE wd_{g} END)"
            )
        else:
            adj_terms.append(
                f"(CASE WHEN {g} = 1 THEN wa_{g} ELSE wd_{g} END)"
            )
    generic = " + ".join(gen_terms)
    adjusted = " + ".join(adj_terms)
    return f"""
WITH {pairs_cte},
fs_counts AS (
  SELECT {', '.join(aggs)} FROM fs_pairs
), fs_params AS (
  SELECT {', '.join(wexprs)} FROM fs_counts
), tf_vals AS (
  SELECT v FROM ({values_sql}) _vv WHERE v IS NOT NULL
), tf_n AS (
  SELECT CAST(count(*) AS BIGINT) AS n_vals FROM tf_vals
), tf AS (
  SELECT v AS _v,
         CAST(round(ln(CAST(count(*) AS BIGINT) / n_vals) * 1e6, 0)
              AS BIGINT) AS _ln_tf
  FROM tf_vals, tf_n GROUP BY v, n_vals
)
SELECT fs_pairs.*, {generic} AS fs_micros, {adjusted} AS fs_tf_micros,
       ({adjusted}) - ({generic}) AS tf_adj_micros
FROM fs_pairs CROSS JOIN fs_params LEFT JOIN tf ON {value_col} = tf._v
"""


def fs_waterfall(
    pairs: DataFrame, label_col: str, gamma_cols: Sequence[str]
) -> DataFrame:
    """Per-field match-weight WATERFALL (the Splink waterfall-chart
    relation): one row per (pair, comparison field) with that field's
    log-likelihood-ratio contribution and the running cumulative — the
    explain-this-match artifact a clerical reviewer reads to see WHY a
    pair scored high (which agreements drove it, which disagreements
    dragged it down).

    Returns ``id1, id2, <label>, step, field, gamma, w_micros,
    cum_micros``; the final step's ``cum_micros`` equals
    :func:`fellegi_sunter_scores`' ``fs_micros`` by construction.

    Scale shape: the k-row expansion happens INSIDE the row via a
    literal struct array + explode with the cumulative computed as an
    array prefix-sum BEFORE the explode (slice+aggregate, all JVM
    built-ins) — zero additional shuffles and no per-pair window; the
    output is k·|pairs| rows, which at 100 TB is materialized for the
    clerical-review band, not the full candidate set (filter on the
    band first — the plan composes).
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
    wcols = []
    for g in gamma_cols:
        m = (F.col(f"am_{g}") + 0.5) / (F.col("n_m") + 1)
        u = (F.col(f"au_{g}") + 0.5) / (F.col("n_u") + 1)
        wcols.append((_micro_ln(m) - _micro_ln(u)).alias(f"wa_{g}"))
        wcols.append((_micro_ln(1 - m) - _micro_ln(1 - u)).alias(f"wd_{g}"))
    params = counts.select(*wcols)
    entries = F.array(
        *[
            F.struct(
                F.lit(i + 1).alias("step"),
                F.lit(g).alias("field"),
                F.col(g).cast("int").alias("gamma"),
                F.when(F.col(g) == 1, F.col(f"wa_{g}"))
                .otherwise(F.col(f"wd_{g}"))
                .alias("w_micros"),
            )
            for i, g in enumerate(gamma_cols)
        ]
    )
    # prefix-sum inside the array (slice 1..i+1, fold), then explode once
    with_cum = F.transform(
        entries,
        lambda e, i: F.struct(
            e.step.alias("step"),
            e.field.alias("field"),
            e.gamma.alias("gamma"),
            e.w_micros.alias("w_micros"),
            F.aggregate(
                F.slice(entries, F.lit(1), i + 1),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x.w_micros,
            ).alias("cum_micros"),
        ),
    )
    return (
        pairs.crossJoin(F.broadcast(params))
        .select(
            "id1",
            "id2",
            F.col(label_col),
            F.explode(with_cum).alias("_e"),
        )
        .select("id1", "id2", label_col, "_e.*")
    )


def fs_waterfall_sql(
    pairs_cte: str, label_col: str, gamma_cols: Sequence[str]
) -> str:
    """DuckDB twin of :func:`fs_waterfall`: the k steps unrolled as a
    UNION ALL with explicit cumulative sums (k is a fixed model
    property, so the unroll is static)."""
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
    w = {
        g: f"(CASE WHEN {g} = 1 THEN wa_{g} ELSE wd_{g} END)"
        for g in gamma_cols
    }
    branches = []
    for i, g in enumerate(gamma_cols):
        cum = " + ".join(w[gg] for gg in gamma_cols[: i + 1])
        branches.append(
            f"SELECT id1, id2, {label_col}, {i + 1} AS step,"
            f" '{g}' AS field, CAST({g} AS INTEGER) AS gamma,"
            f" {w[g]} AS w_micros,"
            f" CAST({cum} AS BIGINT) AS cum_micros"
            f" FROM fs_pairs CROSS JOIN fs_params"
        )
    return f"""
WITH {pairs_cte},
fs_counts AS (
  SELECT {', '.join(aggs)} FROM fs_pairs
), fs_params AS (
  SELECT {', '.join(wexprs)} FROM fs_counts
)
{" UNION ALL ".join(branches)}
"""
