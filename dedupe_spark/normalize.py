"""Cell normalization — parity with the reference's ``preprocess()``.

Reference semantics (/root/reference/backend/dedupe_script.py:18-31), applied
to every cell before matching:

    1. ``unidecode(str(v))``          — ASCII transliteration
    2. value equal to 'nan' (case-insensitive) -> sentinel ``"N/A"``
    3. collapse runs of 2+ spaces to one space
    4. newline -> space
    5. strip; strip leading/trailing ``"``; strip leading/trailing ``'``;
       lowercase; strip again
    6. empty result -> ``"N/A"``

Three implementations, all tested against each other (tests/test_normalize.py):

* :func:`preprocess_value`   — exact scalar (golden truth).
* :func:`preprocess_udf`     — Arrow-batched pandas UDF (full parity incl.
  transliteration) for distributed use.
* :func:`preprocess_expr`    — pure Spark built-in Column chain (everything
  except transliteration — stays inside whole-stage codegen; use when input
  is known-ASCII or when a DuckDB-SQL oracle twin is needed).
* :func:`preprocess_sql`     — the DuckDB ANSI-SQL twin of ``preprocess_expr``.

IMPORTANT (north-rule invariant): normalization feeds *match features only*.
The stored ``text`` column of the pages table passes through the pipeline
byte-identical per ``url`` — pipeline stages must never overwrite it
(SURVEY.md §1.3 note; BASELINE.json input_hint).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

from .functions.normkernel import (  # noqa: F401  (re-exported public API)
    MISSING,
    fold_ascii,
    preprocess_series,
    preprocess_value,
)


@pandas_udf(StringType())
def preprocess_udf(col: pd.Series) -> pd.Series:
    """Arrow-batched full-parity normalizer (includes transliteration).

    The kernel lives in functions/normkernel.py (light import graph) so
    fresh UDF workers don't pay for pyspark.sql imports.
    """
    return preprocess_series(col)


def preprocess_expr(col: Column | str) -> Column:
    """Spark built-in Column chain: reference preprocess minus transliteration.

    Stays JVM-side / whole-stage-codegen. Step order matches the reference:
    nan-sentinel check happens before space handling and case folding; the
    newline replacement runs *after* the space collapse (so ``'a \\n b'``
    keeps two spaces — exact reference behavior).
    """
    c = F.col(col) if isinstance(col, str) else col
    s = F.regexp_replace(c, "  +", " ")
    s = F.regexp_replace(s, "\n", " ")
    s = F.trim(s)
    s = F.regexp_replace(s, '^"+|"+$', "")
    s = F.regexp_replace(s, "^'+|'+$", "")
    s = F.trim(F.lower(s))
    # the reference short-circuits on the *raw* value being 'nan' (pre-strip),
    # returning the sentinel verbatim (dedupe_script.py:25-26)
    s = F.when(F.lower(c) == "nan", F.lit(MISSING)).otherwise(
        F.when(s == "", F.lit(MISSING)).otherwise(s)
    )
    return F.coalesce(s, F.lit(MISSING))


def preprocess_sql(expr: str) -> str:
    """DuckDB ANSI-SQL twin of :func:`preprocess_expr` (for oracle queries)."""
    s = f"regexp_replace({expr}, '  +', ' ', 'g')"
    s = f"regexp_replace({s}, '\\n', ' ', 'g')"
    s = f"trim({s})"
    s = f"regexp_replace({s}, '^\"+|\"+$', '', 'g')"
    s = f"regexp_replace({s}, '^''+|''+$', '', 'g')"
    s = f"trim(lower({s}))"
    s = (
        f"CASE WHEN lower({expr}) = 'nan' THEN '{MISSING}' "
        f"WHEN {s} = '' THEN '{MISSING}' ELSE {s} END"
    )
    return f"coalesce({s}, '{MISSING}')"


def normalize_features(df, feature_cols: list[str], suffix: str = "_norm"):
    """Add full-parity normalized columns ``<col><suffix>`` for matching.

    Original columns are untouched (byte-identity invariant on ``text``).
    """
    out = df
    for c in feature_cols:
        out = out.withColumn(c + suffix, preprocess_udf(F.col(c)))
    return out
