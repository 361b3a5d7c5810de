"""BM25 search (operators/search.py) vs an independent math.log reference."""

from __future__ import annotations

import math

import pytest

from dedupe_spark.operators.search import B, K1, bm25_topk


def ref_bm25(corpus: dict[int, str], terms, k=10):
    dl = {i: len(t.split()) if t.strip() else 0 for i, t in corpus.items()}
    n = len(corpus)
    avgdl = sum(dl.values()) / n
    tf = {
        (i, w): corpus[i].split().count(w)
        for i in corpus
        for w in set(terms)
        if w in corpus[i].split()
    }
    df = {w: sum(1 for (_, ww) in tf if ww == w) for w in terms}
    scores = {}
    for (i, w), f in tf.items():
        idf = math.log((n - df[w] + 0.5) / (df[w] + 0.5) + 1.0)
        s = idf * (f * (K1 + 1)) / (f + K1 * (1 - B + B * dl[i] / avgdl))
        scores[i] = scores.get(i, 0) + int(round(s * 1e6))
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return [(i, round(m / 1e6, 6)) for i, m in ranked]


CORPUS = {
    1: "spark shuffle join join join merge",
    2: "join merge scan",
    3: "scan scan scan scan window",
    4: "nothing relevant here at all whatsoever",
    5: "join",
    6: "",
    7: "window window join merge scan extra words to lengthen this doc",
}


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in CORPUS.items()], "doc_id long, text string"
    )


def test_scores_match_reference(docs):
    got = [
        (r["doc_id"], r["score"])
        for r in bm25_topk(docs, ["join", "merge", "scan"], k=10)
        .orderBy("rnk")
        .collect()
    ]
    assert got == ref_bm25(CORPUS, ["join", "merge", "scan"])


def test_rank_order_is_sensible(docs):
    ranked = [
        r["doc_id"]
        for r in bm25_topk(docs, ["join", "merge", "scan"], k=10)
        .orderBy("rnk")
        .collect()
    ]
    # no-match docs never appear
    assert 4 not in ranked and 6 not in ranked
    # doc 2 (all three terms, short) outranks doc 5 (one term once)
    assert ranked.index(2) < ranked.index(5)


def test_unknown_terms_and_empty_result(docs):
    assert bm25_topk(docs, ["zzz", "qqq"], k=5).count() == 0
    # unknown terms alongside real ones change nothing
    a = bm25_topk(docs, ["join"], k=10).collect()
    b = bm25_topk(docs, ["join", "zzz"], k=10).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_small_relations_broadcast(docs):
    plan = (
        bm25_topk(docs, ["join"], k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Broadcast" in plan  # dfreq + corpus stats never shuffle the fact side
    assert "TakeOrderedAndProject" in plan  # top-k, not a global sort


def test_bm25_quote_terms_and_empty_guard(spark):
    import duckdb
    import pytest

    from dedupe_spark.operators.search import bm25_topk, bm25_topk_sql

    with pytest.raises(ValueError):
        bm25_topk(spark.range(1), [])
    with pytest.raises(ValueError):
        bm25_topk_sql([])
    con = duckdb.connect()
    con.sql("CREATE VIEW documents AS SELECT 1 AS doc_id, 'o''brien says hi' AS text")
    assert len(con.sql(bm25_topk_sql(["o'brien"])).df()) == 1


# ------------------------------------------------------------ phrase_match


def ref_phrase(corpus: dict[int, str], phrase: str):
    """Brute-force sliding window over the token list."""
    terms = phrase.split()
    out = {}
    for i, t in corpus.items():
        toks = t.split()
        hits = [
            p
            for p in range(len(toks) - len(terms) + 1)
            if toks[p : p + len(terms)] == terms
        ]
        if hits:
            out[i] = (len(hits), hits[0])
    return out


PHRASE_CORPUS = {
    1: "the table table key holds",
    2: "table key table table table end",          # overlapping run of 3
    3: "table key",                                  # terms present, never adjacent
    4: "key table",                                  # wrong order
    5: "table table",                                # exact at position 0
    6: "",
    7: "x table table y table table z",              # two separate hits
}


def _run_phrase(spark, corpus, phrase):
    from dedupe_spark.operators.search import phrase_match

    df = spark.createDataFrame(
        [(i, t) for i, t in corpus.items()], "doc_id long, text string"
    )
    return {
        r["doc_id"]: (r["n_hits"], r["first_pos"])
        for r in phrase_match(df, phrase).collect()
    }


def test_phrase_repeated_term_matches_reference(spark):
    """'table table' is the repeated-term case: one token occurrence
    votes for two anchors, and an overlapping run of three 'table's
    contains TWO phrase occurrences — counting votes instead of
    distinct offsets gets both wrong."""
    got = _run_phrase(spark, PHRASE_CORPUS, "table table")
    assert got == ref_phrase(PHRASE_CORPUS, "table table")
    assert got[2] == (2, 2)  # the overlapping run
    assert 3 not in got and 4 not in got


def test_phrase_three_terms_and_order(spark):
    got = _run_phrase(spark, PHRASE_CORPUS, "table table key")
    assert got == ref_phrase(PHRASE_CORPUS, "table table key")
    assert got == {1: (1, 1)}


def test_phrase_single_term_and_validation(spark):
    got = _run_phrase(spark, PHRASE_CORPUS, "key")
    assert got == ref_phrase(PHRASE_CORPUS, "key")
    import pytest as _pytest

    from dedupe_spark.operators.search import phrase_match

    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        phrase_match(df, "  ")


def test_phrase_token_filter_before_shuffle(spark):
    """The postings explode is filtered to the phrase terms below the
    first Exchange — the corpus's token stream never shuffles."""
    from dedupe_spark.operators.search import phrase_match

    df = spark.createDataFrame(
        [(i, t) for i, t in PHRASE_CORPUS.items()], "doc_id long, text string"
    )
    plan = phrase_match(df, "table table")._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Generate posexplode" in plan
    # the term whitelist Filter sits DIRECTLY above the Generate (i.e.
    # it appears later in the tree dump than the first shuffle Exchange,
    # which is printed above it), so the exploded stream is filtered
    # before any hashpartitioning
    filt = plan.find("Filter (term")
    ex = plan.find("Exchange hashpartitioning")
    assert filt != -1 and ex != -1 and filt > ex


# ---------------------------------------------------------------------------
# RRF hybrid fusion + MMR diversification
# ---------------------------------------------------------------------------


def test_rrf_fuses_both_modalities(spark):
    from dedupe_spark.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    rows = QUERIES["hybrid_search_rrf"](spark, sf).collect()
    assert len(rows) == 10
    # contribution arithmetic: exact integer micro-units
    for r in rows:
        want = 0
        if r.lex_rnk != -1:
            want += 1_000_000 // (60 + r.lex_rnk)
        if r.vec_rnk != -1:
            want += 1_000_000 // (60 + r.vec_rnk)
        assert r.rrf_micros == want
    # a doc present in BOTH lists at equal rank must outrank a doc at
    # that rank in only one list — check the output is rrf-sorted
    vals = [r.rrf_micros for r in rows]
    assert vals == sorted(vals, reverse=True)


def _mmr(spark, cand_rows, sim_rows, **kw):
    from dedupe_spark.operators.ann import mmr_rerank

    cand = spark.createDataFrame(cand_rows, "doc_id long, rel_micros long")
    sims = spark.createDataFrame(sim_rows, "a long, b long, sim_micros long")
    return mmr_rerank(cand, sims, **kw).orderBy("rnk").collect()


def test_mmr_prefers_diverse_over_redundant(spark):
    # docs 1,2 nearly identical (sim .99) with top relevance; doc 3
    # lower relevance but distinct — rank 2 must be doc 3
    cand = [(1, 900_000), (2, 890_000), (3, 600_000)]
    sims = []
    for a, b, s in [(1, 2, 990_000), (1, 3, 100_000), (2, 3, 100_000)]:
        sims += [(a, b, s), (b, a, s)]
    got = _mmr(spark, cand, sims, k=3)
    assert [r.doc_id for r in got] == [1, 3, 2]
    # score arithmetic: 7*rel - 3*maxsim
    assert got[1].mmr_score == 7 * 600_000 - 3 * 100_000
    assert got[2].mmr_score == 7 * 890_000 - 3 * 990_000


def test_mmr_pure_relevance_lambda_is_rel_order(spark):
    cand = [(1, 900_000), (2, 890_000), (3, 600_000)]
    sims = [(1, 2, 990_000), (2, 1, 990_000)]
    got = _mmr(spark, cand, sims, k=3, lam=(10, 10))
    assert [r.doc_id for r in got] == [1, 2, 3]


def test_mmr_k_beyond_pool_returns_pool(spark):
    cand = [(1, 900_000), (2, 100_000)]
    sims = [(1, 2, 0), (2, 1, 0)]
    got = _mmr(spark, cand, sims, k=5)
    assert [r.doc_id for r in got] == [1, 2]


def test_mmr_query_matches_duckdb_oracle(spark):
    import duckdb
    import pandas as pd

    from dedupe_spark.queries import ORACLES, QUERIES

    sf = "/root/testdata/sf0.001"
    got = (
        QUERIES["mmr_diversify"](spark, sf)
        .toPandas()
        .sort_values("rnk")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM"
        f" read_parquet('{sf}/embeddings.parquet')"
    )
    want = (
        con.execute(ORACLES["mmr_diversify"])
        .df()
        .sort_values("rnk")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got.astype("int64"), want.astype("int64"))
    # the diversified list must not be the pure relevance order (the
    # corpus's top hits are mutually similar — that's the point)
    assert list(got["rel_micros"]) != sorted(got["rel_micros"], reverse=True)
