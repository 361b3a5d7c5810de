"""American Soundex expression: standard vectors, Spark/DuckDB parity,
no-UDF plan, and the phonetic blocking query's semantics."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from dedupe_spark.functions.phonetic import (
    SURNAMES,
    soundex_col,
    soundex_sql,
)
from dedupe_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"

# classic published test vectors (h/w-transparent American Soundex)
VECTORS = {
    "Robert": "R163",
    "Rupert": "R163",
    "Ashcraft": "A261",
    "Ashcroft": "A261",
    "Tymczak": "T522",
    "Pfister": "P236",
    "Honeyman": "H555",
    "Jackson": "J250",
    "Washington": "W252",
    "Lee": "L000",
    "Gutierrez": "G362",
    "PF": "P000",  # first letter participates in the collapse
    "a": "A000",
    "": None,
    "123": None,  # letter-less input
    "o'brien": "O165",  # punctuation stripped before encoding
}


def test_soundex_standard_vectors(spark):
    df = spark.createDataFrame([(w,) for w in VECTORS], ["w"])
    got = {
        r["w"]: r["s"]
        for r in df.select("w", soundex_col("w").alias("s")).collect()
    }
    assert got == VECTORS


def test_soundex_sql_parity_fuzz(spark):
    """The DuckDB fragment and the Spark expression are the same
    function: compare on the vectors, the surname directory, and a
    pile of adversarial shapes (h/w runs, repeated codes, unicode)."""
    words = (
        list(VECTORS)
        + list(SURNAMES)
        + [
            "hw",
            "WHY",
            "hhhh",
            "bpbp",
            "aeiouy",
            "xxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxx",
            "McWhorter",
            "D'Amico-Lopez",
            "  spaced out  ",
            "üñíçødé",  # non-ASCII letters are stripped, not encoded
            "x1y2z3",
        ]
    )
    df = spark.createDataFrame([(w,) for w in words], ["w"])
    got = {
        r["w"]: r["s"]
        for r in df.select("w", soundex_col("w").alias("s")).collect()
    }
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT w, {soundex_sql('w')} FROM (SELECT unnest(?) AS w)",
        [words],
    ).fetchall()
    assert got == dict(rows)


def test_soundex_no_python_udf(spark):
    """The encoding is built-ins + higher-order functions only — no
    Python evaluation node may appear in the plan."""
    df = spark.range(10).select(
        soundex_col(F.concat(F.lit("name"), F.col("id"))).alias("s")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_phonetic_pairs_variant_groups(spark):
    """The blocking query surfaces the directory's spelling-variant
    pairs: smith/smyth share a key, and every emitted pair genuinely
    shares its soundex key with distinct words."""
    rows = QUERIES["phonetic_pairs"](spark, SF).collect()
    pairs = {(r["w1"], r["w2"]) for r in rows}
    assert ("smith", "smyth") in pairs
    assert ("mueller", "muller") in pairs
    got = {
        r["w"]: r["s"]
        for r in spark.createDataFrame([(w,) for w in SURNAMES], ["w"])
        .select("w", soundex_col("w").alias("s"))
        .collect()
    }
    for r in rows:
        assert r["w1"] < r["w2"]
        assert got[r["w1"]] == r["sdx"] == got[r["w2"]]
        assert r["freq1"] > 0 and r["freq2"] > 0


def test_phonetic_pairs_cap_is_enforced(spark):
    """No emitted key may exceed the documented block cap."""
    from dedupe_spark.queries import PHONETIC_CAP

    rows = QUERIES["phonetic_pairs"](spark, SF).collect()
    per_key: dict[str, set] = {}
    for r in rows:
        per_key.setdefault(r["sdx"], set()).update((r["w1"], r["w2"]))
    assert per_key and all(
        len(ws) <= PHONETIC_CAP for ws in per_key.values()
    )
