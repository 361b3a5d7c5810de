"""Phonetic encoding for blocking keys — American Soundex as a pure
built-in expression chain (no UDF: the whole encoding stays inside
whole-stage codegen / JVM higher-order functions, and the identical
algebra is emitted as a DuckDB SQL fragment for the correctness gate).

Soundex is the classic record-linkage blocking key (Russell 1918;
standard in every RDBMS and in Fellegi–Sunter practice): names that
sound alike — "Robert"/"Rupert", "Ashcraft"/"Ashcroft" — share a
4-character key, so a blocked self-join on the key surfaces candidate
pairs that exact or prefix blocking misses. The reference pipeline's
blocking predicates are token/prefix-based (dedupe's predicate zoo
includes phonetic variants); this module supplies the phonetic member
of that family Spark-first.

Algorithm (American Soundex, h/w-transparent variant — the behavior of
SQL Server/Oracle SOUNDEX): uppercase, strip non-letters; drop H/W
everywhere except a leading letter; map letters to digit codes
(bfpv→1 cgjkqsxz→2 dt→3 l→4 mn→5 r→6, vowels+y→0); collapse adjacent
equal codes (the first letter participates, so "Pfister"→P236 and
"PF"→P000); drop the leading code, strip the 0 separators, keep three
digits zero-padded; prepend the first letter. Letter-less input → NULL.

Scale: a stateless scalar projection — no shuffle, no state; the
blocked self-join built on top of it inherits the engine's standard
block-size caps (see q_phonetic_pairs).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["soundex_col", "soundex_sql", "SND_SRC", "SND_DST", "SURNAMES"]

# Common US-census surnames plus real-world spelling variants — the
# deterministic per-row synthesis corpus for the phonetic-blocking gate
# query (the pii_scrub idiom: both engines derive the same surname from
# the row key, so the oracle re-creates the input exactly). Variant
# groups ("smith"/"smyth"/"smithe") are what phonetic blocking exists
# to catch: same soundex key, different spellings.
SURNAMES = (
    "smith", "smyth", "smithe",
    "johnson", "jonson", "johnsen",
    "williams", "wilhelms",
    "brown", "braun",
    "jones", "johns",
    "miller", "mueller", "muller",
    "davis", "davies",
    "garcia", "garsia",
    "rodriguez", "rodrigues",
    "wilson", "willson",
    "martinez", "martines",
    "anderson", "andersen",
    "taylor", "tailor",
    "thomas", "tomas",
    "moore", "mohr",
    "jackson", "jaxon",
    "white", "wight",
    "harris", "harriss",
    "clark", "clarke",
    "lewis", "luis",
    "robinson", "robison",
    "walker", "walcker",
    "young", "yung",
    "wright", "rite",
    "scott", "schott",
)

# letter → digit map (vowels/y → '0' separators; H/W handled by removal)
SND_SRC = "AEIOUYBFPVCGJKQSXZDTLMNR"
SND_DST = "000000111122222222334556"

_BIG = 2147483647  # "rest of string" length for substring


def soundex_col(col: Column | str) -> Column:
    """American Soundex of a string column as a built-in expression.

    NULL for inputs with no ASCII letters; otherwise a 4-char key
    (letter + 3 digits). Mirrors soundex_sql() bit-for-bit.
    """
    c = F.col(col) if isinstance(col, str) else col
    u = F.upper(F.regexp_replace(c.cast("string"), "[^A-Za-z]", ""))
    first = F.substring(u, 1, 1)
    # H/W are transparent everywhere except the retained first letter
    rest = F.regexp_replace(F.substring(u, 2, _BIG), "[HW]", "")
    digits = F.translate(F.concat(first, rest), SND_SRC, SND_DST)
    chars = F.split(digits, "")
    # adjacency-collapse as a string fold: append x only when it differs
    # from the last appended char (Java split(-1) adds a trailing ""
    # element; "" never equals a 1-char string and concats away)
    coll = F.aggregate(
        chars,
        F.lit(""),
        lambda acc, x: F.concat(
            acc,
            F.when(F.substring(acc, -1, 1) == x, F.lit("")).otherwise(x),
        ),
    )
    body = F.rpad(
        F.substring(
            F.regexp_replace(F.substring(coll, 2, _BIG), "0", ""), 1, 3
        ),
        3,
        "0",
    )
    return F.when(F.length(u) == 0, F.lit(None).cast("string")).otherwise(
        F.concat(first, body)
    )


def soundex_sql(expr: str) -> str:
    """The same encoding as a single DuckDB scalar expression over the
    SQL expression `expr` (duplicated sub-expressions — use over a CTE
    column, not an expensive computation). DuckDB regexp_replace needs
    the explicit 'g' flag to match Spark's replace-all semantics; the
    fold seeds list_reduce with a prepended '' element (DuckDB's
    list_reduce takes its init from the first element)."""
    u = f"upper(regexp_replace(CAST({expr} AS VARCHAR), '[^a-zA-Z]', '', 'g'))"
    first = f"substr({u}, 1, 1)"
    rest = f"regexp_replace(substr({u}, 2, {_BIG}), '[HW]', '', 'g')"
    digits = f"translate({first} || {rest}, '{SND_SRC}', '{SND_DST}')"
    chars = (
        f"list_transform(range(1, len({digits}) + 1),"
        f" i -> substr({digits}, i, 1))"
    )
    coll = (
        f"list_reduce(list_prepend('', {chars}), (acc, x) -> acc || "
        f"CASE WHEN substr(acc, -1, 1) = x THEN '' ELSE x END)"
    )
    body = (
        f"rpad(substr(replace(substr({coll}, 2, {_BIG}), '0', ''), 1, 3),"
        f" 3, '0')"
    )
    return (
        f"CASE WHEN len({u}) = 0 THEN NULL ELSE {first} || {body} END"
    )
