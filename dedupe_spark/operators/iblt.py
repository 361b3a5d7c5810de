"""Invertible Bloom Lookup Table (IBLT) set reconciliation.

Goodrich & Mitzenmacher 2011 (IBLT); Eppstein, Goodrich, Uyeda &
Varghese, SIGCOMM 2011 ("What's the Difference?") — the difference
digest: two sides each summarize their key set into a FIXED-size cell
table; subtracting the tables cancels every common key exactly, and a
peeling decode recovers the symmetric difference — both the keys and
WHICH side holds each — provided the cell count is ~1.3–1.5× the
difference size.

Why this matters at 100 TB: reconciling two crawl snapshots by exact
anti-joins shuffles BOTH full key sets; the IBLT ships O(|diff|) state
instead. Each side's build is one map-side-combinable aggregation
(cells are count/XOR accumulators — commutative and associative, so
partial aggregation does almost all the work before the exchange, and
the shuffle carries at most m cell rows per partition regardless of
input size). The subtract is one m-row join; the peel works entirely on
the ≤m-row cell relation.

Construction (the standard k disjoint-subtable variant): each key k
lands in exactly K=3 cells, one per subtable — position
i·m_block + (u31(md5(i|k)) mod m_block) — so a key can never collide
with itself (the unpartitioned variant lets two of a key's positions
coincide, and the XOR self-cancels, breaking the decode invariants).
Cell state: (cnt, key_xor, chk_xor) where chk(k) = u60(md5('c|'||k)) is
the decode checksum. A DIFFERENCE table (A−B) has cnt=+1 cells holding
one A-only key, cnt=−1 cells holding one B-only key; a cell is PURE —
decodable — when |cnt| = 1 and chk_xor = chk(key_xor). Peeling removes
each recovered key from its other cells, exposing new pure cells, until
nothing is left (complete decode) or no pure cell remains (table
overloaded — returns the partial recovery, never crashes).

Engine-portable determinism: keys and checksums are u60 md5 prefixes,
positions u31 md5 prefixes (the established md5 oracle contract), all
cell algebra int64 count/XOR — the DuckDB twin replays the identical
bits, including every peel round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

K = 3  # disjoint subtables
_HEXD = "0123456789abcdef"


def u60(c):
    """int64 value of the first 15 hex chars (60 bits) of md5(col)."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def _u31(c):
    return (
        F.conv(F.substring(F.md5(c), 1, 8), 16, 10)
        .cast("long")
        .bitwiseAND(F.lit(2147483647))
    )


def _chk(key_col):
    return u60(F.concat(F.lit("c|"), key_col.cast("string")))


def _positions(key_col, m_block: int):
    return F.array(
        *[
            F.lit(i * m_block)
            + (
                _u31(F.concat(F.lit(f"{i}|"), key_col.cast("string")))
                % m_block
            )
            for i in range(K)
        ]
    )


def iblt_build(keys: DataFrame, m_block: int) -> DataFrame:
    """keys: one int64 column of DISTINCT keys → cells(cell, cnt,
    key_xor, chk_xor). One explode (K rows per key) + one map-side-
    combinable groupBy; output ≤ K·m_block rows."""
    kcol = keys.columns[0]
    kc = F.col(kcol)
    ex = keys.select(
        kc.alias("k"),
        _chk(kc).alias("c"),
        F.explode(_positions(kc, m_block)).alias("cell"),
    )
    return ex.groupBy("cell").agg(
        F.count("*").cast("long").alias("cnt"),
        F.bit_xor("k").alias("key_xor"),
        F.bit_xor("c").alias("chk_xor"),
    )


def iblt_diff(cells_a: DataFrame, cells_b: DataFrame) -> DataFrame:
    """Cell-wise subtraction A−B: common keys cancel EXACTLY (their
    counts subtract, their XORs annihilate), leaving a table that
    encodes only the symmetric difference — cnt>0 mass is A-only,
    cnt<0 mass is B-only. Fully-zeroed cells are dropped, so the
    result is O(diff)-sized."""
    z = F.lit(0).cast("long")
    a = cells_a.select(
        "cell",
        F.col("cnt").alias("ca"),
        F.col("key_xor").alias("ka"),
        F.col("chk_xor").alias("ha"),
    )
    b = cells_b.select(
        "cell",
        F.col("cnt").alias("cb"),
        F.col("key_xor").alias("kb"),
        F.col("chk_xor").alias("hb"),
    )
    j = a.join(b, "cell", "full_outer").select(
        "cell",
        (F.coalesce("ca", z) - F.coalesce("cb", z)).alias("cnt"),
        F.coalesce("ka", z).bitwiseXOR(F.coalesce("kb", z)).alias("key_xor"),
        F.coalesce("ha", z).bitwiseXOR(F.coalesce("hb", z)).alias("chk_xor"),
    )
    return j.where(
        ~(
            (F.col("cnt") == 0)
            & (F.col("key_xor") == 0)
            & (F.col("chk_xor") == 0)
        )
    )


def iblt_peel(
    cells: DataFrame, m_block: int, rounds: int = 8
) -> DataFrame:
    """Decode a DIFFERENCE table → recovered(k, side): side=+1 for
    A-only keys, −1 for B-only. Bounded synchronous rounds (the CC/
    pagerank loop discipline: localCheckpoint lineage cuts, 1-row
    driver probes only); an overloaded table yields the decodable
    subset — callers detect incompleteness by the leftover cells, not
    by a failure."""
    spark = cells.sparkSession
    recovered = None
    cells = cells.localCheckpoint(eager=True)
    for _ in range(rounds):
        pure = cells.where(F.col("cnt").isin(1, -1)).where(
            _chk(F.col("key_xor")) == F.col("chk_xor")
        )
        rec = (
            pure.select(
                F.col("key_xor").alias("k"), F.col("cnt").alias("side")
            )
            .distinct()
            .localCheckpoint(eager=True)
        )
        if not rec.limit(1).count():
            break
        recovered = rec if recovered is None else recovered.union(rec)
        rem = (
            rec.select(
                "k",
                "side",
                _chk(F.col("k")).alias("c"),
                F.explode(_positions(F.col("k"), m_block)).alias("cell"),
            )
            .groupBy("cell")
            .agg(
                F.sum("side").cast("long").alias("dc"),
                F.bit_xor("k").alias("dk"),
                F.bit_xor("c").alias("dh"),
            )
        )
        z = F.lit(0).cast("long")
        cells = (
            cells.join(rem, "cell", "left")
            .select(
                "cell",
                (F.col("cnt") - F.coalesce("dc", z)).alias("cnt"),
                F.col("key_xor")
                .bitwiseXOR(F.coalesce("dk", z))
                .alias("key_xor"),
                F.col("chk_xor")
                .bitwiseXOR(F.coalesce("dh", z))
                .alias("chk_xor"),
            )
            .where(
                ~(
                    (F.col("cnt") == 0)
                    & (F.col("key_xor") == 0)
                    & (F.col("chk_xor") == 0)
                )
            )
            .localCheckpoint(eager=True)
        )
    if recovered is None:
        return spark.createDataFrame([], "k long, side long")
    return recovered


# ----------------------------------------------------------------- SQL twin


def _u31_sql(hcol: str) -> str:
    terms = " + ".join(
        f"(strpos('{_HEXD}', substr({hcol}, {i + 1}, 1)) - 1) * {16 ** (7 - i)}"
        for i in range(8)
    )
    return f"(({terms}) & 2147483647)"


def _u60_sql(hcol: str) -> str:
    terms = " + ".join(
        f"(strpos('{_HEXD}', substr({hcol}, {i + 1}, 1)) - 1)"
        f" * {16 ** (14 - i)}"
        for i in range(15)
    )
    return f"CAST(({terms}) AS BIGINT)"


def _chk_sql(kexpr: str) -> str:
    return _u60_sql(f"md5('c|' || CAST({kexpr} AS VARCHAR))")


def _cells_sql(keys_cte: str, m_block: int) -> str:
    """Exploded-positions UNION ALL + the cell aggregation over a CTE
    named ``keys_cte`` exposing one BIGINT column ``k``."""
    branches = " UNION ALL ".join(
        f"SELECT {i * m_block}"
        f" + ({_u31_sql(f'''md5('{i}|' || CAST(k AS VARCHAR))''')}"
        f" % {m_block}) AS cell, k, {_chk_sql('k')} AS chk"
        f" FROM {keys_cte}"
        for i in range(K)
    )
    return (
        f"SELECT cell, CAST(count(*) AS BIGINT) AS cnt,"
        f" bit_xor(k) AS key_xor, bit_xor(chk) AS chk_xor"
        f" FROM ({branches}) GROUP BY cell"
    )


def iblt_reconcile_sql(
    keys_a_sql: str, keys_b_sql: str, m_block: int, rounds: int = 8
) -> str:
    """Full DuckDB twin: build both cell tables, subtract, and unroll
    every peel round (MATERIALIZED — d{r-1} is referenced twice per
    round; inlining would re-evaluate the chain exponentially)."""
    parts = [
        f"ka AS MATERIALIZED ({keys_a_sql})",
        f"kb AS MATERIALIZED ({keys_b_sql})",
        f"cella AS MATERIALIZED ({_cells_sql('ka', m_block)})",
        f"cellb AS MATERIALIZED ({_cells_sql('kb', m_block)})",
        """d0 AS MATERIALIZED (
  SELECT cell, coalesce(a.cnt, 0) - coalesce(b.cnt, 0) AS cnt,
         xor(coalesce(a.key_xor, 0), coalesce(b.key_xor, 0)) AS key_xor,
         xor(coalesce(a.chk_xor, 0), coalesce(b.chk_xor, 0)) AS chk_xor
  FROM cella a FULL JOIN cellb b USING (cell)
  WHERE NOT (coalesce(a.cnt, 0) - coalesce(b.cnt, 0) = 0
             AND xor(coalesce(a.key_xor, 0), coalesce(b.key_xor, 0)) = 0
             AND xor(coalesce(a.chk_xor, 0), coalesce(b.chk_xor, 0)) = 0)
)""",
    ]
    for r in range(1, rounds + 1):
        p = r - 1
        rem_branches = " UNION ALL ".join(
            f"SELECT {i * m_block}"
            f" + ({_u31_sql(f'''md5('{i}|' || CAST(k AS VARCHAR))''')}"
            f" % {m_block}) AS cell, k, side, {_chk_sql('k')} AS chk"
            f" FROM p{r}"
            for i in range(K)
        )
        parts.append(
            f"""p{r} AS MATERIALIZED (
  SELECT DISTINCT key_xor AS k, cnt AS side FROM d{p}
  WHERE (cnt = 1 OR cnt = -1)
    AND chk_xor = {_chk_sql('key_xor')}
)"""
        )
        parts.append(
            f"""rm{r} AS MATERIALIZED (
  SELECT cell, CAST(sum(side) AS BIGINT) AS dc,
         bit_xor(k) AS dk, bit_xor(chk) AS dh
  FROM ({rem_branches}) GROUP BY cell
)"""
        )
        parts.append(
            f"""d{r} AS MATERIALIZED (
  SELECT d.cell, d.cnt - coalesce(rm.dc, 0) AS cnt,
         xor(d.key_xor, coalesce(rm.dk, 0)) AS key_xor,
         xor(d.chk_xor, coalesce(rm.dh, 0)) AS chk_xor
  FROM d{p} d LEFT JOIN rm{r} rm ON d.cell = rm.cell
  WHERE NOT (d.cnt - coalesce(rm.dc, 0) = 0
             AND xor(d.key_xor, coalesce(rm.dk, 0)) = 0
             AND xor(d.chk_xor, coalesce(rm.dh, 0)) = 0)
)"""
        )
    final = " UNION ALL ".join(
        f"SELECT k, side FROM p{r}" for r in range(1, rounds + 1)
    )
    return "WITH " + ",\n".join(parts) + "\n" + final
