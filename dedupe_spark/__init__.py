"""dedupe_spark — a PySpark-native entity-resolution / record-linkage engine.

A from-scratch rebuild of the capabilities of muham-2002/dedupe (see
/root/repo/SURVEY.md) expressed Spark-first: DataFrame/SQL plans optimized by
Catalyst, Arrow-vectorized pandas UDFs for string-distance scoring, salted
skew-aware blocking self-joins, iterative large-star/small-star connected
components, and checkpointed, resumable pipeline stages.

Layout:
    session     SparkSession builders tuned for the engine
    normalize   cell normalization (reference preprocess(), dedupe_script.py:18-31)
    model       numpy logistic regression (broadcast match model)
    training    pair sampling, active learning, blocking-predicate selection
    pipeline    staged, checkpointed, resumable end-to-end pipeline
    fixtures    deterministic synthetic test corpora (pages, labeled pairs)
    functions/  scalar + vectorized kernels (string distances, minhash, text stats)
    operators/  relational operators (blocking, scoring, clustering, dedup, ANN)
    sources/    ingestion (CSV/parquet union scans, schema mapping)
    plans/      plan inspection / explain reporting helpers
    streaming/  incremental (Structured Streaming) variants
"""

__version__ = "0.1.0"
