"""Unsupervised EM estimation of Fellegi–Sunter m/u parameters.

The workhorse of modern probabilistic linkage (Winkler 1988's EM fit of
the Fellegi–Sunter model; the estimation engine inside Splink): with NO
labels, treat match/non-match as a latent 2-class mixture over the
agreement vectors γ and fit (λ, m_k, u_k) by expectation-maximization.
The supervised twin is operators/fellegi.py; this one needs only the
candidate pairs themselves.

The classic implementation detail (also Splink's): EM never iterates
over pairs — it iterates over the γ-PATTERN HISTOGRAM, which has at
most 2^k rows for k binary comparison fields. The distributed work is
exactly one map-side-combinable groupBy over the candidate relation;
the ≤2^k-row histogram is then a contractually bounded driver relation
(the same bound-and-collect contract as scoring's broadcast lookup),
and the fitted posterior is broadcast-joined back as a 16-row lookup —
the pair relation is shuffled once, scored with zero further exchanges.

Engine-portable determinism (the operators/lm.py contract, extended to
an ITERATIVE algorithm): every EM iteration quantizes each pattern's
responsibility mass to integer micro-units t_i = floor(p_i·cnt_i·1e6
+ 0.5) BEFORE the M-step sums, so cross-pattern accumulation is exact
int64 arithmetic; the M-step ratios are single divisions of exact
integers; the E-step products are written in one fixed association
order. The DuckDB twin unrolls the iterations as CTEs computing the
same ops on the same doubles — after 5 iterations the posteriors are
still bit-identical (asserted by the driver oracle, not hoped).

floor(x + 0.5) is used instead of round() on both engines: Python's
round() is banker's, DuckDB's is half-away — floor(+0.5) is the one
spelling they share exactly.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000
CLAMP = 1e-4  # keep m/u off 0/1 so no pattern gets probability 0
# likelihood-ratio micro-units cap: with all k fields at the CLAMP
# extremes the raw ratio reaches ((1-1e-4)/1e-4)^k * 1e6 ~ 1e22 for k=4,
# past int64 — cap at 1e18 (fits comfortably, same value both engines;
# ordering among capped patterns falls to the gamma tie-break, which the
# decision sort already pins)
LR_CAP = 1_000_000_000_000_000_000


def _q(x: float) -> int:
    return math.floor(x + 0.5)


def em_fit(
    hist: list[tuple[tuple[int, ...], int]],
    k: int,
    iters: int = 5,
    init_lambda: float = 0.5,
    init_m: float = 0.9,
    init_u: float = 0.1,
) -> tuple[float, list[float], list[float], dict[tuple[int, ...], int]]:
    """EM over a pattern histogram [(γ-tuple, count)].

    Returns (λ, m[], u[], posterior_micros per pattern). Pure-Python
    IEEE doubles in a pinned operation order — the SQL twin replays it.
    """
    lam = init_lambda
    m = [init_m] * k
    u = [init_u] * k
    if not hist:
        return lam, m, u, {}
    n_total = sum(c for _, c in hist)
    t = {}
    for _ in range(iters):
        # E-step: fixed left-to-right product order
        t = {}
        for g, cnt in hist:
            pm = lam
            pu = 1.0 - lam
            for j in range(k):
                pm = pm * (m[j] if g[j] == 1 else 1.0 - m[j])
                pu = pu * (u[j] if g[j] == 1 else 1.0 - u[j])
            p = pm / (pm + pu)
            t[g] = _q(p * cnt * MICRO)
        # M-step: exact integer sums, single divisions
        s = sum(t.values())
        comp = n_total * MICRO - s
        lam = s / (n_total * MICRO)
        for j in range(k):
            sj = sum(ti for g, ti in t.items() if g[j] == 1)
            cj = sum(
                cnt * MICRO - t[g] for g, cnt in hist if g[j] == 1
            )
            m[j] = min(max(sj / s, CLAMP), 1.0 - CLAMP)
            u[j] = min(max(cj / comp, CLAMP), 1.0 - CLAMP)
        lam = min(max(lam, CLAMP), 1.0 - CLAMP)
    # posterior per pattern at the FINAL parameters
    post = {}
    for g, _cnt in hist:
        pm = lam
        pu = 1.0 - lam
        for j in range(k):
            pm = pm * (m[j] if g[j] == 1 else 1.0 - m[j])
            pu = pu * (u[j] if g[j] == 1 else 1.0 - u[j])
        post[g] = _q(pm / (pm + pu) * MICRO)
    return lam, m, u, post


def em_posterior_scores(
    pairs: DataFrame, gamma_cols: Sequence[str], iters: int = 5
) -> DataFrame:
    """Adds ``posterior_micros`` (latent-match probability, micro-units)
    to every pair, fitted unsupervised by EM on the pattern histogram."""
    k = len(gamma_cols)
    if k > 8:
        raise ValueError(
            f"{k} comparison fields -> up to {2**k} patterns; the "
            "bounded-histogram contract is documented for k <= 8"
        )
    rows = pairs.groupBy(*gamma_cols).agg(F.count("*").alias("cnt")).collect()
    hist = [
        (tuple(int(r[g]) for g in gamma_cols), int(r["cnt"])) for r in rows
    ]
    _, _, _, post = em_fit(hist, k, iters=iters)
    spark = pairs.sparkSession
    lookup = spark.createDataFrame(
        [(*g, p) for g, p in post.items()],
        ", ".join(f"{c} int" for c in gamma_cols) + ", posterior_micros long",
    )
    return pairs.join(F.broadcast(lookup), list(gamma_cols))


def fs_decisions(
    hist: list[tuple[tuple[int, ...], int]],
    k: int,
    m: list[float],
    u: list[float],
    mu: float = 0.01,
    lam_err: float = 0.05,
) -> dict[tuple[int, ...], tuple[int, str]]:
    """Fellegi–Sunter Theorem-II decision rule: order patterns by
    likelihood ratio Π P(γ|M) / Π P(γ|U) descending, auto-MATCH the
    longest prefix whose accumulated u-mass (false-match probability)
    stays ≤ mu, auto-NON-MATCH the longest suffix whose accumulated
    m-mass (false-non-match probability) stays ≤ lam_err, send the rest
    to clerical review. Match wins if the two regions would overlap.

    Masses are micro-quantized per pattern BEFORE the cumulative sums
    (exact ints, like the EM fit), ordering ties are broken by the γ
    tuple descending, so the rule is bit-identical in SQL.

    Returns {γ: (lr_micros, decision)}.
    """
    rows = []
    for g, _cnt in hist:
        pm = 1.0
        pu = 1.0
        for j in range(k):
            pm = pm * (m[j] if g[j] == 1 else 1.0 - m[j])
            pu = pu * (u[j] if g[j] == 1 else 1.0 - u[j])
        rows.append(
            (
                g,
                _q(pm * MICRO),
                _q(pu * MICRO),
                _q(min(pm / pu * MICRO, float(LR_CAP))),
            )
        )
    rows.sort(key=lambda r: (-r[3],) + tuple(-x for x in r[0]))
    # row-wise conditions on monotone cumulative masses ≡ prefix/suffix
    # bands, and are exactly what the SQL twin's windowed CASE evaluates
    out = {}
    cum_u = 0
    matched = set()
    for g, _pm, pu_mass, lr in rows:
        cum_u += pu_mass
        if cum_u <= mu * MICRO:
            out[g] = (lr, "match")
            matched.add(g)
    cum_m = 0
    for g, pm_mass, _pu, lr in reversed(rows):
        cum_m += pm_mass
        if cum_m <= lam_err * MICRO and g not in matched:
            out[g] = (lr, "non_match")
    for g, _pm, _pu, lr in rows:
        if g not in out:
            out[g] = (lr, "clerical")
    return out


def fs_decision_patterns(
    pairs: DataFrame,
    gamma_cols: Sequence[str],
    iters: int = 5,
    mu: float = 0.01,
    lam_err: float = 0.05,
) -> DataFrame:
    """Pattern-level decision table (γ..., cnt, lr_micros, decision)
    fitted unsupervised: EM for m/u, Theorem-II rule for the bands."""
    k = len(gamma_cols)
    if k > 8:
        raise ValueError("bounded-histogram contract is documented for k <= 8")
    rows = pairs.groupBy(*gamma_cols).agg(F.count("*").alias("cnt")).collect()
    hist = [
        (tuple(int(r[g]) for g in gamma_cols), int(r["cnt"])) for r in rows
    ]
    _, m, u, _ = em_fit(hist, k, iters=iters)
    dec = fs_decisions(hist, k, m, u, mu=mu, lam_err=lam_err)
    spark = pairs.sparkSession
    return spark.createDataFrame(
        [(*g, cnt, *dec[g]) for g, cnt in hist],
        ", ".join(f"{c} int" for c in gamma_cols)
        + ", cnt long, lr_micros long, decision string",
    )


def fs_decisions_sql_ctes(
    gamma_cols: Sequence[str],
    iters: int = 5,
    mu: float = 0.01,
    lam_err: float = 0.05,
) -> str:
    """CTE tail to append after em_sql's p{iters} CTE: per-pattern
    masses, ROWS-framed cumulative sums over the pinned total order,
    and the decision CASE. SELECT FROM ``dec``."""
    k = len(gamma_cols)
    gl = ", ".join(gamma_cols)
    pm = "1.0"
    pu = "1.0"
    for j, g in enumerate(gamma_cols):
        pm = f"({pm} * (CASE WHEN {g} = 1 THEN m{j} ELSE 1.0 - m{j} END))"
        pu = f"({pu} * (CASE WHEN {g} = 1 THEN u{j} ELSE 1.0 - u{j} END))"
    desc = ", ".join(f"{g} DESC" for g in gamma_cols)
    asc = ", ".join(f"{g} ASC" for g in gamma_cols)
    frame = "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
    return f"""mass AS (
  SELECT {gl}, cnt,
         CAST(floor({pm} * {MICRO} + 0.5) AS BIGINT) AS pm_mass,
         CAST(floor({pu} * {MICRO} + 0.5) AS BIGINT) AS pu_mass,
         CAST(floor(least({pm} / {pu} * {MICRO},
                          CAST({LR_CAP} AS DOUBLE)) + 0.5) AS BIGINT)
           AS lr_micros
  FROM hist CROSS JOIN p{iters}
), cums AS (
  SELECT *,
         sum(pu_mass) OVER (ORDER BY lr_micros DESC, {desc} {frame})
           AS cum_u,
         sum(pm_mass) OVER (ORDER BY lr_micros ASC, {asc} {frame})
           AS cum_m
  FROM mass
), dec AS (
  SELECT {gl}, cnt, lr_micros,
         CASE WHEN cum_u <= {mu!r} * {MICRO} THEN 'match'
              WHEN cum_m <= {lam_err!r} * {MICRO} THEN 'non_match'
              ELSE 'clerical' END AS decision
  FROM cums
)"""


def _em_cte_chain(gamma_cols: Sequence[str], iters: int) -> list[str]:
    """The shared unrolled-EM CTE list (hist .. p{iters}) over a CTE
    named ``em_pairs``."""
    k = len(gamma_cols)
    gl = ", ".join(gamma_cols)

    def prod(base: str, params: list[str], invert: bool) -> str:
        e = base
        for j, g in enumerate(gamma_cols):
            p = params[j]
            e = (
                f"({e} * (CASE WHEN {g} = 1 THEN {p} "
                f"ELSE 1.0 - {p} END))"
            )
        return e

    ctes = [
        f"hist AS (\n  SELECT {gl}, count(*) AS cnt FROM em_pairs"
        f" GROUP BY {gl}\n)",
        "tot AS (\n  SELECT CAST(sum(cnt) AS BIGINT) AS n_total FROM hist\n)",
        (
            "p0 AS (\n  SELECT CAST(0.5 AS DOUBLE) AS lam, "
            + ", ".join(
                f"CAST(0.9 AS DOUBLE) AS m{j}, CAST(0.1 AS DOUBLE) AS u{j}"
                for j in range(k)
            )
            + "\n)"
        ),
    ]
    for it in range(iters):
        pm = prod("lam", [f"m{j}" for j in range(k)], False)
        pu = prod("(1.0 - lam)", [f"u{j}" for j in range(k)], True)
        ctes.append(
            f"e{it} AS (\n  SELECT {gl}, cnt,\n"
            f"    CAST(floor({pm} / ({pm} + {pu}) * cnt * {MICRO} + 0.5)"
            f" AS BIGINT) AS t\n  FROM hist CROSS JOIN p{it}\n)"
        )
        msel = []
        for j, g in enumerate(gamma_cols):
            msel.append(
                f"least(greatest("
                f"CAST(sum(CASE WHEN {g} = 1 THEN t ELSE 0 END) AS DOUBLE)"
                f" / sum(t), {CLAMP!r}), {1.0 - CLAMP!r}) AS m{j}"
            )
            msel.append(
                f"least(greatest("
                f"CAST(sum(CASE WHEN {g} = 1 THEN cnt * {MICRO} - t"
                f" ELSE 0 END) AS DOUBLE)"
                f" / (max(tot.n_total) * {MICRO} - sum(t)), {CLAMP!r}),"
                f" {1.0 - CLAMP!r}) AS u{j}"
            )
        ctes.append(
            f"p{it + 1} AS (\n  SELECT least(greatest("
            f"CAST(sum(t) AS DOUBLE) / (max(tot.n_total) * {MICRO}),"
            f" {CLAMP!r}), {1.0 - CLAMP!r}) AS lam,\n    "
            + ",\n    ".join(msel)
            + f"\n  FROM e{it} CROSS JOIN tot\n)"
        )
    pm = prod("lam", [f"m{j}" for j in range(k)], False)
    pu = prod("(1.0 - lam)", [f"u{j}" for j in range(k)], True)
    ctes.append(
        f"post AS (\n  SELECT {gl},\n"
        f"    CAST(floor({pm} / ({pm} + {pu}) * {MICRO} + 0.5) AS BIGINT)"
        f" AS posterior_micros\n  FROM hist CROSS JOIN p{iters}\n)"
    )
    return ctes


def em_sql(
    pairs_cte: str, gamma_cols: Sequence[str], iters: int = 5
) -> str:
    """DuckDB twin over a CTE named ``em_pairs``: unrolled EM iterations
    on the pattern histogram, same quantization, same operation order."""
    gl = ", ".join(gamma_cols)
    ctes = _em_cte_chain(gamma_cols, iters)
    return (
        f"WITH {pairs_cte},\n"
        + ",\n".join(ctes)
        + f"\nSELECT em_pairs.*, post.posterior_micros\n"
        f"FROM em_pairs JOIN post USING ({gl})"
    )


def fs_decision_sql(
    pairs_cte: str,
    gamma_cols: Sequence[str],
    iters: int = 5,
    mu: float = 0.01,
    lam_err: float = 0.05,
) -> str:
    """DuckDB twin of fs_decision_patterns: the EM chain + the
    Theorem-II decision CTEs, returning the pattern-level table."""
    gl = ", ".join(gamma_cols)
    ctes = _em_cte_chain(gamma_cols, iters)[:-1]  # drop the post CTE
    ctes.append(fs_decisions_sql_ctes(gamma_cols, iters, mu, lam_err))
    return (
        f"WITH {pairs_cte},\n"
        + ",\n".join(ctes)
        + f"\nSELECT {gl}, cnt, lr_micros, decision FROM dec"
    )
