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


def test_scope_isolates_interleaved_builders(spark):
    """ADVICE r3: a scope() block shields its tracked objects from a
    global release_tracked() sweep (the interleaved-builders hazard) and
    releases exactly its own objects at exit."""
    from dedupe_spark import lifecycle as L

    outer = spark.range(10).cache()
    L.track(outer)
    with L.scope() as mine:
        inner = spark.range(5).cache()
        L.track(inner)
        assert mine == [inner]
        # another builder's between-queries sweep fires NOW: the scoped
        # cache must survive it, the global one is released
        L.release_tracked()
        assert inner.storageLevel.useMemory  # still cached
        assert inner.count() == 5
    assert not inner.storageLevel.useMemory  # released at scope exit
    assert L.tracked_count() == 0
