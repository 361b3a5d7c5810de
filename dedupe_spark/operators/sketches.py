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


# ---------------------------------------------------------------------------
# Count-min sketch (Cormode & Muthukrishnan 2005) — deterministic md5 rows
# ---------------------------------------------------------------------------
# Width 1024 divides 2^16, so "4 hex chars mod W" is an UNBIASED bucket;
# the D row-hashes are disjoint nibble windows of one md5 — one hash
# evaluation per item, D index extractions.

CMS_W = 1024
CMS_D = 4
_CMS_OFFS = (1, 5, 9, 13)  # 1-based hex offsets of the 4 16-bit windows


def _cms_bucket(h: Column, off: int) -> Column:
    return (F.conv(F.substring(h, off, 4), 16, 10).cast("long") % CMS_W).cast(
        "int"
    )


def cms_sketch(df: DataFrame, item_col: str) -> DataFrame:
    """CMS state: (row, bucket, cnt), at most D×W rows after the map-side
    combine — the bounded-size summary that replaces an exact
    COUNT GROUP BY over an unbounded token domain. The ×D explode is
    map-local and feeds a commutative sum, so shuffle volume is ≤ D×W
    rows per map partition regardless of input size."""
    h = F.md5(F.col(item_col).cast("string"))
    arr = F.array(*[_cms_bucket(h, o) for o in _CMS_OFFS])
    return (
        df.where(F.col(item_col).isNotNull())
        .select(F.posexplode(arr).alias("row", "bucket"))
        .groupBy("row", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Union CMS states — counters add (the sketch is a linear map)."""
    it = iter(sketches)
    out = next(it)
    for d in it:
        out = out.unionByName(d)
    return out.groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_point_estimates(
    sketch: DataFrame, probes: DataFrame, item_col: str, est_alias: str = "est_cnt"
) -> DataFrame:
    """min over rows of the probed counters — the CMS point query.
    Guarantees est >= true count, est <= true + eps·N w.h.p. The sketch
    side is ≤ D×W rows: Spark broadcasts it, so probing never shuffles
    the probe relation."""
    h = F.md5(F.col(item_col).cast("string"))
    arr = F.array(*[_cms_bucket(h, o) for o in _CMS_OFFS])
    pb = probes.select(
        item_col, F.posexplode(arr).alias("row", "bucket")
    )
    return (
        pb.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy(item_col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias(est_alias))
    )


def cms_inner_product(sk_a: DataFrame, sk_b: DataFrame) -> DataFrame:
    """Join-size estimate from two CMS states (Cormode & Muthukrishnan
    2005 §4.2): |A ⋈ B on k| = Σ_v fA(v)·fB(v), estimated as
    min over rows of Σ_bucket cntA·cntB — never an underestimate, off by
    at most ε·|A|·|B| w.h.p. Exact int64 arithmetic on two ≤ D×W
    relations: the join-size question costs two sketch scans instead of
    the join. Returns one row: (est)."""
    a = sk_a.select("row", "bucket", F.col("cnt").alias("_ca"))
    b = sk_b.select("row", "bucket", F.col("cnt").alias("_cb"))
    per_row = (
        a.join(b, ["row", "bucket"])
        .groupBy("row")
        .agg(F.sum(F.col("_ca") * F.col("_cb")).alias("_ip"))
    )
    return per_row.agg(F.min("_ip").alias("est"))


def cms_pair_sql(h: str, pos: int) -> str:
    """DuckDB: integer value of the two hex chars of ``h`` at ``pos``."""
    hexd = "'0123456789abcdef'"
    return (
        f"((strpos({hexd}, substr({h}, {pos}, 1)) - 1) * 16 "
        f"+ strpos({hexd}, substr({h}, {pos + 1}, 1)) - 1)"
    )


def cms_bucket_sql(h: str, off: int) -> str:
    """DuckDB twin of _cms_bucket: 16-bit window mod W."""
    return (
        f"(({cms_pair_sql(h, off)} * 256 + {cms_pair_sql(h, off + 2)})"
        f" % {CMS_W})"
    )


def cms_buckets_union_sql(src: str, item: str) -> str:
    """UNION ALL of the D (row, bucket) projections over ``src`` rows."""
    h = f"md5(CAST({item} AS VARCHAR))"  # matches Spark's cast("string")
    return "\n  UNION ALL\n  ".join(
        f"SELECT {item}, {i} AS row, {cms_bucket_sql(h, off)}"
        f" AS bucket FROM {src}"
        for i, off in enumerate(_CMS_OFFS)
    )


# ---------------------------------------------------------------------------
# Bloom filter (Bloom 1970) — deterministic md5 bit positions
# ---------------------------------------------------------------------------
# Completes the sketch family: HLL = cardinality, CMS = frequency,
# Bloom = membership. m = 2^16 bits, k = 4 positions from disjoint
# nibble windows of one md5 (same windows as the CMS rows — 16 bits mod
# 2^16 is the identity, so no bias). The filter is represented
# RELATIONALLY as the distinct set-bit positions (≤ m rows, usually far
# fewer): map-side-combinable to build, broadcast to probe, and — unlike
# a packed bitmap blob — bit-for-bit re-derivable in the DuckDB twin.

BLOOM_M = 65536
BLOOM_K = 4
_BLOOM_OFFS = (1, 5, 9, 13)


def _bloom_pos(h: Column, off: int) -> Column:
    return (
        F.conv(F.substring(h, off, 4), 16, 10).cast("long") % BLOOM_M
    ).cast("int")


def bloom_build(df: DataFrame, item_col: str) -> DataFrame:
    """Bloom state: one row per SET bit position. distinct() partially
    aggregates map-side, so shuffle volume is ≤ m rows per map
    partition regardless of build-side size."""
    h = F.md5(F.col(item_col).cast("string"))
    return (
        df.where(F.col(item_col).isNotNull())
        .select(
            F.explode(F.array(*[_bloom_pos(h, o) for o in _BLOOM_OFFS])).alias(
                "pos"
            )
        )
        .distinct()
    )


def bloom_probe(
    probes: DataFrame, bloom: DataFrame, item_col: str, flag: str = "maybe"
) -> DataFrame:
    """Adds ``flag``: 1 iff ALL k positions are set (possibly-member;
    false positives possible, false negatives impossible). The bit
    relation is broadcast; the probe relation is never shuffled — the
    shape that lets a 100 TB fact scan drop non-joining rows before its
    join exchange."""
    h = F.md5(F.col(item_col).cast("string"))
    bits = F.broadcast(bloom.withColumn("_set", F.lit(1)))
    pb = probes.select(
        "*", F.posexplode(F.array(*[_bloom_pos(h, o) for o in _BLOOM_OFFS])).alias(
            "_i", "pos"
        )
    )
    keys = [c for c in probes.columns]
    return (
        pb.join(bits, "pos", "left")
        .groupBy(*keys)
        .agg(
            (F.sum(F.coalesce("_set", F.lit(0))) == BLOOM_K)
            .cast("int")
            .alias(flag)
        )
    )


def bloom_pos_sql(h: str, off: int) -> str:
    """DuckDB twin of _bloom_pos (16-bit window is mod-2^16 identity)."""
    return (
        f"({cms_pair_sql(h, off)} * 256 + {cms_pair_sql(h, off + 2)})"
    )


def bloom_positions_union_sql(src: str, item: str) -> str:
    """UNION ALL of the k bit-position projections over ``src``."""
    return "\n  UNION ALL\n  ".join(
        f"SELECT {item}, {bloom_pos_sql(f'md5(CAST({item} AS VARCHAR))', off)}"
        f" AS pos FROM {src}"
        for off in _BLOOM_OFFS
    )


def hll_estimator_ctes(
    regs: str, group_cols: Sequence[str], est_alias: str = "est"
) -> str:
    """CTE fragment re-deriving :func:`hll_estimate` in DuckDB over a
    register CTE ``regs`` with columns (group_cols..., reg, rho).
    Appends ``hll_agg``/``hll_raw``/``hll_est`` — select the estimate
    from ``hll_est``. ONE source for the estimator arithmetic (integer Z
    terms, alpha·m²·2^49 scale, 2.5m linear-counting correction): every
    HLL oracle twin must compose this fragment, never restate it, or a
    future correction-rule change desynchronizes the twins."""
    gl = ", ".join(group_cols)
    scale = repr(_ALPHA * M * M * float(2**_RHO_CAP))
    return f"""hll_agg AS (
  SELECT {gl},
         sum(CAST(1 AS BIGINT) << ({_RHO_CAP} - rho)) AS z_used,
         count(*) AS n_used
  FROM {regs} GROUP BY {gl}
), hll_raw AS (
  SELECT {gl}, n_used,
         {scale} / CAST(z_used + ({M} - n_used)
                        * (CAST(1 AS BIGINT) << {_RHO_CAP}) AS DOUBLE) AS raw
  FROM hll_agg
), hll_est AS (
  SELECT {gl},
         round(CASE WHEN raw <= {2.5 * M} AND {M} - n_used > 0
                    THEN {float(M)} * ln({float(M)} / ({M} - n_used))
                    ELSE raw END, 6) AS {est_alias}
  FROM hll_raw
)"""


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


# ---------------------------------------------------------------------------
# bottom-k (KMV-style) uniform sample: the mergeable quantile sketch
# ---------------------------------------------------------------------------


def kmv_sample(
    df: DataFrame,
    group_cols: "Sequence[str]",
    id_col: str,
    k: int,
    buckets: int = 32,
) -> DataFrame:
    """Per-group bottom-k rows by md5 rank — a deterministic uniform
    without-replacement sample and the state of a mergeable quantile
    sketch (bottom-k sketches: Bar-Yossef et al. 2002 / Cohen & Kaplan
    2007; the row-sampling counterpart of the HLL/CMS family above).

    ``md5(CAST(id AS VARCHAR))`` is a uniform, engine-portable rank over
    rows; the k lexicographically-smallest hashes per group are a
    uniform sample of the group. Because selection is by GLOBAL hash
    order, the sketch merges trivially: union shard samples and
    re-bottom-k — merge ≡ one-shot by construction (no RNG, no
    reservoir order-dependence). Exact grouped quantiles shuffle one row
    per distinct (group, value); this state is capped at k rows per
    group regardless of cardinality — the incremental/rollup form.

    Selection is skew-safe via the two-phase salted window of
    operators/topk.grouped_topk (no task ever ranks a whole hot group).
    Quantile estimates are then exact lower-discrete quantiles OF THE
    SAMPLE (grouped_quantiles_exact applied to this output), carrying
    the usual Dvoretzky–Kiefer–Wolfowitz sample error bound.
    """
    from .topk import grouped_topk

    ranked = df.withColumn(
        "_kmv", F.md5(F.col(id_col).cast("string"))
    )
    return grouped_topk(
        ranked,
        list(group_cols),
        [F.col("_kmv").asc(), F.col(id_col).asc()],
        k,
        salt_src=id_col,
        buckets=buckets,
    ).drop("_kmv", "rnk")
