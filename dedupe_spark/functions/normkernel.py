"""Scalar/batch normalization kernels — LIGHT module (no pyspark imports).

Lives under functions/ for the same reason as features.py: these run inside
pandas-UDF workers, and their import graph is the worker cold-start cost.
Semantics: reference ``preprocess()`` (dedupe_script.py:18-31); see
normalize.py for the Spark-facing wrappers and the full doc.
"""

from __future__ import annotations

import re
import unicodedata

import pandas as pd

MISSING = "N/A"

# Characters NFKD decomposition alone won't transliterate (no combining-mark
# decomposition). Mirrors the common unidecode outputs for European scripts.
_FOLD_MAP = str.maketrans(
    {
        "ß": "ss", "ẞ": "SS",
        "æ": "ae", "Æ": "AE",
        "œ": "oe", "Œ": "OE",
        "ø": "o", "Ø": "O",
        "đ": "d", "Đ": "D",
        "ð": "d", "Ð": "D",
        "þ": "th", "Þ": "Th",
        "ł": "l", "Ł": "L",
        "ı": "i", "İ": "I",
        "ħ": "h", "Ħ": "H",
        "ŋ": "ng", "Ŋ": "NG",
        "ĸ": "k",
        "“": '"', "”": '"', "„": '"',
        "‘": "'", "’": "'", "‚": "'",
        "–": "-", "—": "-", "‐": "-",
        "…": "...",
        " ": " ",
    }
)

_MULTISPACE = re.compile("  +")


def fold_ascii(s: str) -> str:
    """Best-effort ASCII transliteration (unidecode stand-in).

    NFKD-decompose, drop combining marks, apply the explicit fold map, then
    drop any remaining non-ASCII codepoints (unidecode renders unknown CJK
    etc. as romanizations; we drop — fine for matching since it is applied
    identically to both sides of every pair).
    """
    s = s.translate(_FOLD_MAP)
    s = unicodedata.normalize("NFKD", s)
    s = "".join(ch for ch in s if not unicodedata.combining(ch))
    return s.encode("ascii", "ignore").decode("ascii")


def preprocess_value(v: object) -> str:
    """Exact reference-parity scalar normalization (dedupe_script.py:18-31)."""
    if v is None or (isinstance(v, float) and v != v):  # NaN
        return MISSING
    s = fold_ascii(str(v))
    if s.lower() == "nan":
        return MISSING
    s = _MULTISPACE.sub(" ", s)
    s = s.replace("\n", " ")
    s = s.strip().strip('"').strip("'").lower().strip()
    return s if s else MISSING


def preprocess_series(col: pd.Series) -> pd.Series:
    """Whole-batch normalizer == ``preprocess_value`` per element.

    Unique-cached (dup-heavy match columns normalize once per distinct
    value), vectorized pandas str ops for the regex/strip/lower chain, and
    an ``str.isascii`` fast path that skips transliteration entirely for
    ASCII batches.
    """
    # factorize sends null/NaN to code -1 (handled at the end); uniques are
    # therefore non-null
    codes, uniq = pd.factorize(col)
    if len(uniq) == 0:  # all-null batch
        return pd.Series([MISSING] * len(col))
    u = pd.Series(uniq, dtype=object).map(
        lambda v: v if isinstance(v, str) else str(v)
    )
    u = u.map(lambda s: s if s.isascii() else fold_ascii(s))
    is_nan = u.str.lower() == "nan"
    s = u.str.replace("  +", " ", regex=True)
    s = s.str.replace("\n", " ", regex=False)
    s = s.str.strip().str.strip('"').str.strip("'").str.lower().str.strip()
    s = s.where(~is_nan & (s != ""), MISSING)
    out = s.to_numpy(dtype=object)[codes]
    out[codes < 0] = MISSING  # nulls factorize to -1
    return pd.Series(out)
