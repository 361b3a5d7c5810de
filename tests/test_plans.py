"""Plan-shape assertions: pushdown, pruning, codegen (the scale contract)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dedupe_spark.plans import (
    pushed_filters,
    read_schema_columns,
    scan_reads_only,
    wholestage_codegen_spans,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_filter_pushdown_reaches_scan(docs):
    q = docs.where(F.col("lang") == "en").where(F.col("n_chars") > 100)
    pf = " ".join(pushed_filters(q))
    assert "lang" in pf and "n_chars" in pf


def test_projection_prunes_scan(docs):
    q = docs.select("doc_id", "lang")
    assert scan_reads_only(q, {"doc_id", "lang"})
    # and the full-width scan really is wider
    assert not scan_reads_only(docs.select("*"), {"doc_id", "lang"})


def test_aggregate_prunes_to_grouping_columns(docs):
    q = docs.groupBy("source").agg(F.count("*").alias("n"))
    assert scan_reads_only(q, {"source"})


def test_join_prunes_both_sides(spark, docs):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = docs.select("doc_id", "lang").join(
        emb.select(F.col("vec_id").alias("doc_id"), "label"), "doc_id"
    )
    assert scan_reads_only(q, {"doc_id", "lang", "vec_id", "label"})


def test_relational_glue_stays_in_codegen(docs):
    q = (
        docs.where("n_chars > 50")
        .groupBy("lang")
        .agg(F.avg("n_chars").alias("m"))
        .orderBy("m")
    )
    assert wholestage_codegen_spans(q) >= 1


def test_scoring_projection_prunes_text_payload(spark):
    """attach_pair_fields projects before joining: the scan must not read
    the heavy text column when match fields are derived columns."""
    from dedupe_spark.operators.scoring import attach_pair_fields

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.col("lang").alias("f1"),
        "text",
    )
    pairs = spark.createDataFrame([("1", "2")], "id1 string, id2 string")
    wide = attach_pair_fields(pairs, docs, "doc_id", ["f1"])
    for cols in read_schema_columns(wide):
        assert "text" not in cols


def test_lookup_scoring_plan_has_no_exchange_when_prepartitioned(spark):
    """The steady-state scoring stage (broadcast lookup, pre-partitioned
    pairs, repartition_pairs=False) must contain NO shuffle: the pair scan
    feeds the Arrow UDF directly. The repartition shuffle was measured as a
    parallelism-independent ~1.5s floor per round (BENCH.md)."""
    import numpy as np

    from dedupe_spark.functions.features import FieldSpec, feature_names
    from dedupe_spark.model import LogisticModel
    from dedupe_spark.operators.scoring import RecordLookup, score_pairs
    from dedupe_spark.plans.explain import explain_str

    records = spark.createDataFrame(
        [(f"u{i}", f"text {i}") for i in range(20)], "url string, f_n string"
    )
    pairs = spark.createDataFrame(
        [(f"u{i}", f"u{i+1}") for i in range(19)], "id1 string, id2 string"
    ).repartition(24)
    fields = [FieldSpec("f_", "String")]
    model = LogisticModel(np.array([1.0, 1.0, -1.0]), 0.0, feature_names(fields))
    lookup = RecordLookup.build(records, "url", fields, "n")
    scored = score_pairs(
        pairs, records, model, fields, "url", "n",
        lookup=lookup, repartition_pairs=False,
    )
    import re

    plan = explain_str(scored)
    # formatted explain lists each node twice (tree + detail): count detail
    # headers. The pre-existing repartition(24) Exchange belongs to `pairs`
    # itself; scoring must add no shuffle and must evaluate the Arrow UDF
    # exactly ONCE (a filter on the score column used to be pushed below
    # the exchange, planning a second ArrowEvalPython).
    n_exchange = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
    n_arrow = len(re.findall(r"^\(\d+\) ArrowEvalPython", plan, re.M))
    assert n_exchange == 1
    assert n_arrow == 1


def test_minhash_blocks_plan_evaluates_kernel_once(spark):
    """Catalyst's infer-filters-from-generate rule duplicates a
    deterministic array UDF under its explode into a `size(udf(x)) > 0`
    filter — the whole MinHash band kernel evaluated twice per document.
    The bands UDF is nondeterministic precisely to stop that; this pins
    the plan shape (exactly one ArrowEvalPython in the blocks plan)."""
    import re

    from pyspark.sql import functions as F

    from dedupe_spark.operators import blocking as B
    from dedupe_spark.plans.explain import explain_str

    d = spark.createDataFrame(
        [(str(i), f"some text body number {i} with enough length") for i in range(30)],
        "doc_id string, text string",
    )
    mh = B.minhash_bands_udf(num_perm=16, bands=4, shingle_k=5)
    blocks = B.generate_blocks(d, "doc_id", {"mh": mh(F.col("text"))})
    plan = explain_str(blocks)
    n_arrow = len(re.findall(r"^\(\d+\) ArrowEvalPython", plan, re.M))
    assert n_arrow == 1, plan


def test_bucketed_candidates_zero_shuffle_below_dedup(spark, docs):
    """write_bucketed_blocks + bucketed_candidate_pairs: the bk-keyed size
    aggregate, size join and candidate self-join must all inherit the
    bucket hash-partitioning from the scan — the ONLY Exchange in the plan
    is the final pair dedup; the unbucketed twin plans several. And the
    pairs are identical."""
    from dedupe_spark.operators import blocking as B
    from dedupe_spark.plans.explain import exchange_count

    blocks = docs.select(
        F.col("doc_id").alias("record_id"),
        F.concat_ws("|", "lang", F.element_at(F.split(F.trim("text"), r"\s+"), 1)).alias("bk"),
    )
    B.write_bucketed_blocks(blocks, "t_bucketed_blocks", n_buckets=8)
    try:
        bucketed = B.bucketed_candidate_pairs(spark, "t_bucketed_blocks", max_block=100)
        plain = B.simple_candidate_pairs(blocks, max_block=100)
        assert exchange_count(bucketed) == 1  # the id-pair dedup only
        assert exchange_count(plain) >= 3  # agg + size join + self-join + dedup
        got = {(r.id1, r.id2) for r in bucketed.collect()}
        want = {(r.id1, r.id2) for r in plain.collect()}
        assert got == want and got
    finally:
        spark.sql("DROP TABLE IF EXISTS t_bucketed_blocks")


# ---------------------------------------------------------------------------
# plan linter
# ---------------------------------------------------------------------------

from pyspark.sql import Window as _W

from dedupe_spark.plans.explain import assert_plan_clean, lint_plan


def _codes(df):
    return {f["code"] for f in lint_plan(df)}


def test_lint_flags_cartesian(spark):
    # small sides broadcast (BNLJ); a true CartesianProduct needs both
    # sides non-broadcastable — either marker is the same scale verdict
    a = spark.range(10)
    b = spark.range(10).withColumnRenamed("id", "id2")
    assert _codes(a.crossJoin(b)) & {"cartesian_product", "nested_loop_join"}
    big = spark.range(10_000_000).hint("shuffle_replicate_nl")
    big2 = spark.range(10_000_000).withColumnRenamed("id", "id2")
    assert "cartesian_product" in _codes(big.crossJoin(big2))


def test_lint_flags_nested_loop(spark):
    a = spark.range(100)
    b = spark.range(100).withColumnRenamed("id", "id2")
    j = a.join(b, F.col("id") < F.col("id2"))
    assert _codes(j) & {"nested_loop_join", "cartesian_product"}


def test_lint_flags_global_window(spark):
    df = spark.range(100).withColumn(
        "rn", F.row_number().over(_W.orderBy("id"))
    )
    assert "single_partition_exchange" in _codes(df)


def test_lint_flags_row_python_udf(spark):
    slow = F.udf(lambda s: s + 1, "long")
    assert "row_python_udf" in _codes(spark.range(10).select(slow("id")))


def test_lint_clean_on_good_plans(spark):
    a = spark.range(1000).withColumn("k", F.col("id") % 7)
    b = spark.range(70).withColumn("k", F.col("id") % 7)
    good = a.join(b, "k").groupBy("k").count()
    assert lint_plan(good) == []
    assert_plan_clean(good)
    # the engine's own flagship-adjacent queries pass the lint
    from dedupe_spark.queries import q_block_candidates, q_range_join_counts

    assert_plan_clean(q_block_candidates(spark, "/root/testdata/sf0.001"))
    assert_plan_clean(q_range_join_counts(spark, "/root/testdata/sf0.001"))


def test_assert_plan_clean_raises_and_allows(spark):
    a = spark.range(10)
    b = spark.range(10).withColumnRenamed("id", "id2")
    bad = a.crossJoin(b)
    codes = _codes(bad)
    assert codes  # at least one finding
    try:
        assert_plan_clean(bad)
        raise RuntimeError("should have raised")
    except AssertionError as e:
        assert "Join" in str(e) or "Cartesian" in str(e)
    assert_plan_clean(bad, allow=codes)


def test_blocking_oracles_share_the_canonical_key_fragment():
    """The b/kept/cand blocking CTE is restated in many oracle constants;
    this pins them to ONE canonical key expression and cap so an edit to
    the block key that misses a twin fails here instead of drifting
    silently (the composition hazard _cand_truth_cte documents)."""
    from dedupe_spark.queries import ORACLES

    canon_key = (
        "concat_ws('|', lang, regexp_split_to_array(trim(text), "
        "'\\s+')[1]) AS bk"
    )
    with_blocks = [k for k, sql in ORACLES.items() if " AS bk" in sql]
    assert len(with_blocks) >= 9  # the blocked-candidate family
    for k in with_blocks:
        sql = ORACLES[k]
        if (
            "meta_blocking" in k
            or k.startswith("er_clusters")
            or k == "predicate_learning"
            or k == "progressive_pairs"
            or k == "adaptive_block_keys"
        ):
            continue  # deliberately different key families (multi-
            # predicate / flagship title+minhash blocking / the
            # predicate-learning candidates, whose bk IS the thing
            # being learned / the two-predicate progressive waves /
            # the overflow-refined key ladder, whose bk varies by level)
        assert canon_key in sql, f"{k} drifted from the canonical block key"
        assert "count(*) <= 100" in sql, f"{k} drifted from the block cap"


def test_lint_clean_on_graph_and_cdc_queries(spark):
    """The round-4 graph/lakehouse queries pass the lint (their
    checkpointed hot loops execute before the final plan; the unchunked
    loop is pinned separately below)."""
    from dedupe_spark.queries import (
        q_incremental_rollup,
        q_k_core,
        q_merge_upsert,
        q_pagerank,
        q_scd2_intervals,
        q_source_except,
    )

    sf = "/root/testdata/sf0.001"
    for fn in (
        q_pagerank,
        q_k_core,
        q_merge_upsert,
        q_scd2_intervals,
        q_incremental_rollup,
        q_source_except,
    ):
        assert_plan_clean(fn(spark, sf))


def test_pagerank_loop_plan_contract(spark):
    """The UNchunked pagerank loop's only lint findings must be the two
    shapes of its 1-row dangling-mass scalar aggregate (the broadcast
    cross join and the scalar agg's single-partition exchange) — both
    O(1)-row by construction. Anything else (a cartesian over ranks, a
    global window, a row UDF) fails. k_core's loop must be fully clean:
    its rounds are degree groupBys + semi-joins, no scalar relation."""
    from dedupe_spark.operators.graph import k_core, pagerank

    e = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (2, 3)], "src long, dst long"
    )
    nd = spark.createDataFrame([(i,) for i in range(5)], "node long")
    codes = _codes(pagerank(e, nd, iterations=3, checkpoint=False))
    assert codes <= {"nested_loop_join", "single_partition_exchange"}
    ek = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (2, 3)], "id1 long, id2 long"
    )
    assert_plan_clean(k_core(ek, 2, rounds=2, checkpoint=False))


def test_lint_clean_on_round4_late_queries(spark):
    """bloom/bpe_encode/warc_roundtrip pass the scale-killer lint: no
    cartesian joins, no single-partition exchanges on data paths, no
    row-at-a-time Python UDFs (all three are pure built-in plans)."""
    from dedupe_spark.queries import (
        q_bloom_membership,
        q_bpe_encode,
        q_warc_roundtrip,
    )

    sf = "/root/testdata/sf0.001"
    for fn in (q_bloom_membership, q_bpe_encode, q_warc_roundtrip):
        assert_plan_clean(fn(spark, sf))


def test_lint_edit_distance_join(spark):
    """The Ed-Join plan is clean except the DOCUMENTED BroadcastNestedLoop
    on the short bucket (strings outside the prefix theorem's guarantee,
    broadcast-sized by construction) — everything else (gram explode,
    rarest-first prefix join, banded levenshtein verify) must stay in
    equi-join + codegen territory with no cartesian and no Python."""
    from dedupe_spark.queries import q_edit_distance_pairs

    df = q_edit_distance_pairs(spark, "/root/testdata/sf0.001")
    assert_plan_clean(df, allow={"nested_loop_join"})
    # and the gram-prefix equi-join really is present (not a cross join)
    from dedupe_spark.plans import explain_str

    txt = explain_str(df, mode="simple")
    assert "CartesianProduct" not in txt
    assert "BatchEvalPython" not in txt


def test_lint_on_session_query_additions(spark):
    """The Q21/Q7/phonetic/pivot/canopy/chunking/predicate-learning
    plans lint fully clean; the two queries built around a 1-row scalar
    aggregate (Q22's avg-balance threshold, mixture sampling's weight
    total) may show exactly the scalar-broadcast pair of findings —
    a BroadcastNestedLoopJoin whose build side is ONE row and the
    scalar agg's single-partition exchange — and nothing else."""
    from dedupe_spark.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    for name in (
        "waiting_suppliers",
        "nation_trade_volume",
        "phonetic_pairs",
        "pivot_clusters",
        "canopy_blocks",
        "chunk_documents",
        "predicate_learning",
        # round-4 close additions: TPC-H completion + k-truss +
        # phrase search + greedy 1:1 assignment (important_parts has
        # its own scalar-allowance test in test_tpch)
        "min_cost_supplier",
        "nation_profit",
        "returnflag_priority",
        "dominant_suppliers",
        "k_truss",
        "phrase_search",
        "link_assignment",
        # IBLT reconciliation: the peel runs eagerly at build time, so
        # the returned plan is the union of checkpointed pure-cell scans
        "iblt_reconcile",
        "weighted_minhash_pairs",
        "minhash_index_maintain",
        "progressive_pairs",
        "match_calibration",
        "dedup_provenance",
        "lang_confusion",
        "adaptive_block_keys",
        "cross_source_dup_matrix",
        "dedup_threshold_sweep",
        "schema_match",
        # Sums fixpoint runs eagerly (per-round localCheckpoint); the
        # returned plan is the final argmax window over checkpointed
        # beliefs
        "truth_discovery",
        # MMR rounds run eagerly on the checkpointed bounded pool; the
        # returned plan is the union of the k picks
        "mmr_diversify",
        "l_diversity",
    ):
        assert_plan_clean(QUERIES[name](spark, sf))
    scalar_ok = {"nested_loop_join", "single_partition_exchange"}
    # these queries are built around 1-row broadcast parameter/total
    # aggregates (FS params, B³ count relations) — the scalar pair is
    # the expected shape, nothing else is tolerated
    for name in (
        "idle_rich_customers",
        "mixture_sample",
        "bcubed_eval",
        "fs_tf_weights",
        "fs_waterfall",
        # PSI drift: the (na, nb, nbk) totals and the psi_total are both
        # 1-row broadcast scalar aggregates by design
        "drift_psi",
        # RRF: 1-row query-vector/corpus-stats broadcasts + the final
        # global top-10 order over a <=100-row fused relation
        "hybrid_search_rrf",
        # t-closeness: the domain/total/m scalars are 1-row broadcasts
        # and the (groups x domain) grid is a broadcast cross join
        "t_closeness",
        # zipf: the OLS sufficient-statistics scalar is a 1-row broadcast
        "zipf_profile",
        # heaps: OLS scalar broadcast + a global window over the 4-row
        # nested-prefix relation
        "heaps_law",
        # FD/IND: per-candidate 1-row scalar aggregates (and IND's
        # broadcast crossJoin of two scalars)
        "fd_discovery",
        "ind_discovery",
        "ucc_discovery",
    ):
        codes = {f["code"] for f in lint_plan(QUERIES[name](spark, sf))}
        assert codes <= scalar_ok, (name, codes)


def test_lint_pq_ann_queries(spark):
    """PQ family plan contracts: the full ADC scan is BY DESIGN one
    broadcast nested-loop pass of the codes table per (tiny) query set —
    that finding and the per-query rank window's bounded exchange are the
    allowed shape; the probed IVF-PQ variants replace the cross join with
    a cell equi-join and must not show a nested-loop at all."""
    from dedupe_spark.plans import explain_str
    from dedupe_spark.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    allow_scan = {"nested_loop_join", "single_partition_exchange"}
    codes = {f["code"] for f in lint_plan(QUERIES["pq_adc_topk"](spark, sf))}
    assert codes <= allow_scan, codes
    for name in ("ivfpq_topk", "ivfpq_residual_topk"):
        df = QUERIES[name](spark, sf)
        codes = {f["code"] for f in lint_plan(df)}
        assert codes <= {"single_partition_exchange"}, (name, codes)
        txt = explain_str(df, mode="simple")
        assert "CartesianProduct" not in txt
        assert "BatchEvalPython" not in txt
