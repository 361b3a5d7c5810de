"""Cache/broadcast lifecycle: a query-suite sweep must not accumulate
executor storage (VERDICT r2 item 6)."""

from __future__ import annotations

from dedupe_spark import lifecycle

SF = "/root/testdata/sf0.001"


def _persistent_rdd_count(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def test_sweep_releases_all_storage(spark):
    """The heaviest cache users (minhash, simhash, embedding LSH, flagship)
    leave zero persistent RDDs and zero tracked objects once the registry's
    release-at-entry plus a final release have run."""
    from dedupe_spark.queries import QUERIES

    for name in ("minhash_pairs", "simhash_pairs", "embedding_lsh_pairs", "er_clusters"):
        df = QUERIES[name](spark, SF)
        df.count()  # consume fully before the next query (driver contract)
    stats = lifecycle.release_session_storage(spark)
    assert stats["tracked_released"] >= 1
    assert lifecycle.tracked_count() == 0
    assert _persistent_rdd_count(spark) == 0


def test_release_at_entry_frees_previous_query(spark):
    """Running query N+1 releases query N's tracked caches (the registry
    wrapper), so tracked objects never exceed one query's worth."""
    from dedupe_spark.queries import QUERIES

    QUERIES["simhash_pairs"](spark, SF).count()
    assert lifecycle.tracked_count() >= 1
    QUERIES["per_source_counts"](spark, SF).count()
    # the cheap query tracked nothing, and released simhash's cache
    assert lifecycle.tracked_count() == 0
    lifecycle.release_session_storage(spark)


def test_deduper_close_destroys_lookup(spark):
    from dedupe_spark.api import Deduper
    from dedupe_spark.functions.features import FieldSpec

    df = spark.createDataFrame(
        [("1", "alice smith"), ("2", "alice smyth"), ("3", "bob jones")],
        "record_id string, name string",
    )
    d = Deduper([FieldSpec("name")], max_training_pairs=4)
    d.prepare_training(df)
    d.uncertain_pairs(k=1)
    # re-prepare must not leak the old cached tables/lookup
    d.prepare_training(df)
    d.close()
    assert d._lookup is None and d._records is None
    lifecycle.release_session_storage(spark)
