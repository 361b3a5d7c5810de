"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship ER pipeline on /root/testdata/sf0.001 documents.
queries()     — one callable per implemented operator (SURVEY.md §2 plus the
                training-data-pipeline family): (spark, sf_dir) -> DataFrame.
oracle_sql()  — DuckDB ANSI-SQL twins for all but one query (188 registered,
                187 value-oracled as of round 5), including the
                flagship ER pipeline, the MinHash/SimHash/cosine LSH
                sketches (md5-prefix hashing and md5-Rademacher planes make
                them SQL-re-derivable), the frozen-quantizer IVF chain,
                the streaming near-dup replay AND the full streaming ER
                front (exactly-once foreachBatch result vs a one-shot SQL
                re-derivation); only the k-means ivf_topk is rows-only,
                with an exact-twin recall assertion in pytest.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from dedupe_spark.queries import ORACLES, QUERIES, q_er_clusters


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_er_clusters(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
