"""Deterministic weighted sampling without replacement (A-ES).

Efraimidis & Spirakis 2006: draw k items with probability proportional
to weight by keying each item with u_i^(1/w_i) (u_i uniform) and taking
the top k — THE distributed weighted sampler, because the key is a pure
per-row function and selection is a top-k (per-partition heaps + driver
merge of k·partitions rows, no global sort, no sequential reservoir).

Determinism contract: u_i is an md5-derived exact rational
(first 56 hash bits + 1) / (2^56 + 1) ∈ (0, 1], so there is no RNG and
no sample()-style partition nondeterminism — reruns, repartitionings
and the DuckDB twin all select the same rows. The selection key is the
monotone-equivalent ln(u)/w (avoids cross-engine pow(); ln on identical
doubles is the established lm.py/bm25 precedent), ties broken by id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_U_BITS = 56  # 14 hex chars: exact int64, one division to a double
_U_DEN = float((1 << _U_BITS) + 1)


def es_key(id_col: Column, weight: Column, tag: str = "wsamp") -> Column:
    """ln(u)/w — order-equivalent to the A-ES key u^(1/w); weights are
    floored at 1 (a zero/negative weight would be a caller bug, not a
    division crash)."""
    h = F.md5(F.concat_ws("|", id_col.cast("string"), F.lit(tag)))
    u_num = F.conv(F.substring(h, 1, 14), 16, 10).cast("long") + 1
    u = u_num.cast("double") / F.lit(_U_DEN)
    return F.log(u) / F.greatest(weight.cast("double"), F.lit(1.0))


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    tag: str = "wsamp",
) -> DataFrame:
    """Top-k rows by the A-ES key: a without-replacement sample where
    P(selected) is (asymptotically) proportional to weight. Adds
    ``es_key_nanos`` (the key in integer nano-units, floor(x·1e9+0.5) —
    the cross-engine rounding spelling)."""
    key = es_key(F.col(id_col), F.col(weight_col), tag)
    return (
        df.select(
            id_col,
            weight_col,
            F.floor(key * F.lit(1e9) + F.lit(0.5)).cast("long").alias(
                "es_key_nanos"
            ),
            key.alias("_k"),
        )
        .orderBy(F.col("_k").desc(), F.col(id_col).asc())
        .limit(k)
        .drop("_k")
    )


def weighted_sample_sql(
    table: str,
    id_col: str,
    weight_col: str,
    k: int,
    tag: str = "wsamp",
) -> str:
    """DuckDB twin: same md5 bits, same rational u, same ln(u)/w key."""
    from .sketches import cms_pair_sql

    h = f"md5(CAST({id_col} AS VARCHAR) || '|{tag}')"
    num = " + ".join(
        f"{cms_pair_sql(h, 1 + 2 * i)} * {256 ** (6 - i)}" for i in range(7)
    )
    # +1 in INTEGER arithmetic before the double cast, exactly like the
    # Spark side (double(n)+1.0 re-rounds and can differ by an ulp)
    key = (
        f"ln(CAST(({num}) + 1 AS DOUBLE) / {_U_DEN!r})"
        f" / greatest(CAST({weight_col} AS DOUBLE), 1.0)"
    )
    return f"""
SELECT {id_col}, {weight_col},
       CAST(floor({key} * 1e9 + 0.5) AS BIGINT) AS es_key_nanos
FROM {table}
ORDER BY {key} DESC, {id_col} ASC
LIMIT {k}
"""
