"""Deterministic HyperLogLog cardinality sketch (Flajolet et al. 2007).

COUNT(DISTINCT x) at 100 TB shuffles every distinct value; the HLL
register relation shuffles at most ``groups × m`` rows regardless of
input size, because ``groupBy(group, register).agg(max(rho))`` partially
aggregates map-side (max is commutative/associative) — the classic
sketch trade the reference's "per-file counts" surfaces would need at
web scale (dedupe_script.py per-file tallies).

Design goals beyond textbook HLL:

- **Deterministic and engine-portable.** The hash is md5 (not a seeded
  murmur): register index = first 2 hex nibbles (m = 256), rho = 1 +
  leading-zero bits of the next 12 nibbles (48-bit stream). Both are
  pure hex-string arithmetic, so a DuckDB SQL twin re-derives the exact
  registers — the sketch is value-oracled, not just sanity-checked.
- **Exact integer merge state.** The estimator needs sum_j 2^(-M_j),
  a float whose value depends on addition order. We sum the INTEGER
  terms 2^(49 - M_j) instead (M_j <= 49, so each term and the 256-term
  sum fit in int64) and divide once at the end — bit-identical across
  partitionings and engines (same trick as operators/lm.py micro-nats).
- **Mergeable state.** ``hll_registers`` output is the sketch state;
  ``hll_merge`` unions register relations with another max — the
  shape of a distributed / incremental rollup (combine per-shard
  sketches without re-reading the shards).

Small-range correction (linear counting when E <= 2.5m and empty
registers exist) is applied as in the paper; ln() on a ratio of exact
integers is the only float transcendental, identical across engines at
6-decimal rounding.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

M = 256  # registers (first 2 hex nibbles)
_ALPHA = 0.7213 / (1 + 1.079 / M)  # alpha_m for m >= 128 (Flajolet Fig. 3)
_RHO_CAP = 49  # 48-bit stream: rho in [1, 49]


def _hex_pair_int(h: Column, pos: int) -> Column:
    """Integer value of two hex chars of ``h`` at 1-based ``pos``."""
    return F.conv(F.substring(h, pos, 2), 16, 10).cast("int")


def _rho(h: Column) -> Column:
    """1 + leading-zero bits of the 48-bit stream in hex chars 3..14."""
    s = F.substring(h, 3, 12)
    z = F.length(F.regexp_extract(s, "^0*", 0))  # leading zero NIBBLES
    first = s.substr(z + F.lit(1), F.lit(1))  # '' when all 12 are zero
    nib = (
        F.when(first == "1", 3)
        .when(first.isin("2", "3"), 2)
        .when(first.isin("4", "5", "6", "7"), 1)
        .otherwise(0)
    )
    bits = F.when(z == 12, F.lit(48)).otherwise(z * 4 + nib)
    return (bits + 1).cast("int")


def hll_registers(
    df: DataFrame, group_cols: Sequence[str], item_col: str
) -> DataFrame:
    """Sketch state: one row per (group, register) with the max rho.

    Shuffle volume is bounded by groups × m rows after map-side combine,
    independent of input row count — the reason to sketch at all.
    """
    h = F.md5(F.col(item_col).cast("string"))
    return (
        df.where(F.col(item_col).isNotNull())
        .select(*group_cols, h.alias("__h"))
        .select(
            *group_cols,
            _hex_pair_int(F.col("__h"), 1).alias("reg"),
            _rho(F.col("__h")).alias("rho"),
        )
        .groupBy(*group_cols, "reg")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(*register_dfs: DataFrame) -> DataFrame:
    """Union sketch states (same schema) — max(rho) per register again."""
    it = iter(register_dfs)
    out = next(it)
    for d in it:
        out = out.unionByName(d)
    keys = [c for c in out.columns if c != "rho"]
    return out.groupBy(*keys).agg(F.max("rho").alias("rho"))


def hll_estimate(
    registers: DataFrame, group_cols: Sequence[str], est_alias: str = "est"
) -> DataFrame:
    """HLL estimate per group from a register relation.

    Z is summed as exact int64 terms 2^(49 - rho); empty registers
    contribute 2^49 each. raw = alpha·m²·2^49 / Z; linear counting when
    raw <= 2.5m and empty registers remain.
    """
    one = F.lit(1).cast("long")
    agg = registers.groupBy(*group_cols).agg(
        # shiftleft's bit count must be a column here: SQL-expression form
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {_RHO_CAP} - rho)")
        ).alias("z_used"),
        F.count("*").alias("n_used"),
    )
    v = F.lit(M) - F.col("n_used")  # empty registers
    z = F.col("z_used") + v.cast("long") * F.shiftleft(one, _RHO_CAP)
    raw = F.lit(_ALPHA * M * M * float(2**_RHO_CAP)) / z.cast("double")
    est = F.when(
        (raw <= 2.5 * M) & (v > 0), F.lit(float(M)) * F.log(F.lit(M) / v)
    ).otherwise(raw)
    return agg.select(*group_cols, F.round(est, 6).alias(est_alias))


def hll_rho_sql(h: str) -> str:
    """DuckDB twin of _rho over an md5-hex expression ``h``."""
    s = f"substr({h}, 3, 12)"
    z = f"length(regexp_extract({s}, '^0*'))"
    first = f"substr({s}, {z} + 1, 1)"
    nib = (
        f"CASE WHEN {first} = '1' THEN 3 "
        f"WHEN {first} IN ('2','3') THEN 2 "
        f"WHEN {first} IN ('4','5','6','7') THEN 1 ELSE 0 END"
    )
    return f"(CASE WHEN {z} = 12 THEN 48 ELSE {z} * 4 + {nib} END + 1)"


def hll_reg_sql(h: str) -> str:
    """DuckDB twin of _hex_pair_int(h, 1)."""
    hexd = "'0123456789abcdef'"
    return (
        f"((strpos({hexd}, substr({h}, 1, 1)) - 1) * 16 "
        f"+ strpos({hexd}, substr({h}, 2, 1)) - 1)"
    )
