"""Selective mirror of tests/oracle_check.py: verify a subset of the
__spark_entry__ queries against their DuckDB twins at one or more
scale factors.

Usage: python scripts/check_some.py q1,q2,... [sf_dir ...]
(default sf dirs: /root/testdata/sf0.001 /root/testdata/sf0.01)
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.oracle_check import (  # noqa: E402
    TABLES,
    dtype_kind_mismatches,
    normalize_frame,
)


def main(names: list[str], sf_dirs: list[str]) -> int:
    import __spark_entry__ as entrymod
    from dedupe_spark.session import get_spark

    spark = get_spark("check_some", master="local[8]", shuffle_partitions=8)
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for sf_dir in sf_dirs:
        duck = duckdb.connect()
        for t in TABLES:
            p = os.path.join(sf_dir, f"{t}.parquet")
            if os.path.exists(p):
                duck.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
        for name in names:
            t0 = time.time()
            spark_pd = queries[name](spark, sf_dir).toPandas()
            status = f"rows={len(spark_pd)}"
            if name in oracles:
                duck_pd = duck.sql(oracles[name]).df()
                a, b = normalize_frame(spark_pd), normalize_frame(duck_pd)
                if len(a) != len(b):
                    failures.append((sf_dir, name, f"rows {len(a)} != {len(b)}"))
                    status += f" MISMATCH rows vs {len(b)}"
                elif list(a.columns) != list(b.columns):
                    failures.append(
                        (sf_dir, name, f"cols {list(a.columns)} != {list(b.columns)}")
                    )
                    status += " MISMATCH columns"
                elif bad := dtype_kind_mismatches(a, b):
                    failures.append((sf_dir, name, f"dtype kinds {bad}"))
                    status += f" MISMATCH dtypes {bad}"
                else:
                    try:
                        pd.testing.assert_frame_equal(
                            a, b, check_dtype=False, check_exact=False, rtol=1e-5
                        )
                        status += " == oracle"
                    except AssertionError as e:
                        failures.append((sf_dir, name, str(e).splitlines()[-1]))
                        status += " MISMATCH values"
            else:
                status += " (rows-only)"
            print(
                f"{os.path.basename(sf_dir):8s} {name:28s} {status}"
                f"  [{time.time() - t0:.1f}s]",
                flush=True,
            )
        duck.close()
    if failures:
        print("\nFAILURES:")
        for sf_dir, name, msg in failures:
            print(f"  {os.path.basename(sf_dir)} {name}: {msg}")
        return 1
    print("\nOK")
    return 0


if __name__ == "__main__":
    qnames = sys.argv[1].split(",")
    dirs = sys.argv[2:] or ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
    raise SystemExit(main(qnames, dirs))
