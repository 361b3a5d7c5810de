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


def em_sql(
    pairs_cte: str, gamma_cols: Sequence[str], iters: int = 5
) -> str:
    """DuckDB twin over a CTE named ``em_pairs``: unrolled EM iterations
    on the pattern histogram, same quantization, same operation order."""
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
    return (
        f"WITH {pairs_cte},\n"
        + ",\n".join(ctes)
        + f"\nSELECT em_pairs.*, post.posterior_micros\n"
        f"FROM em_pairs JOIN post USING ({gl})"
    )
