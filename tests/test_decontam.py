"""Decontamination + duplicated-n-gram operators (operators/decontam.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dedupe_spark.operators import decontam as DC


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


BENCH_SENT = "the quick brown fox jumps over the lazy dog tonight"


def test_decontaminate_flags_overlap_and_only_overlap(spark):
    bench = _docs(spark, [("b1", BENCH_SENT)])
    docs = _docs(
        spark,
        [
            # contains the benchmark sentence verbatim -> contaminated
            ("d1", "intro words " + BENCH_SENT + " closing words"),
            # shares a 7-token run only (below n=8) -> clean
            ("d2", "the quick brown fox jumps over the SLEEPY dog tonight"),
            # disjoint vocabulary -> clean
            ("d3", "alpha beta gamma delta epsilon zeta eta theta iota"),
        ],
    )
    out = DC.decontaminate(docs, bench, "doc_id", "text", n=8).collect()
    assert [r["doc_id"] for r in out] == ["d1"]
    # the 10-token benchmark has three 8-grams; all appear in d1
    assert out[0]["n_hit_ngrams"] == 3
    assert out[0]["n_bench_docs"] == 1


def test_decontaminate_short_doc_whole_gram_path(spark):
    # a benchmark item shorter than n is checked as ONE verbatim gram
    bench = _docs(spark, [("b1", "tiny bench item")])
    docs = _docs(
        spark,
        [
            ("d1", "tiny bench item"),  # verbatim short twin -> hit
            ("d2", "padded tiny bench item padded"),  # not verbatim, no
            # 8-gram overlap with a 3-token bench -> clean
        ],
    )
    out = DC.decontaminate(docs, bench, "doc_id", "text", n=8).collect()
    assert [(r["doc_id"], r["n_hit_ngrams"]) for r in out] == [("d1", 1)]


def test_decontaminate_md5_and_xxhash_keys_agree(spark):
    bench = _docs(spark, [("b1", BENCH_SENT)])
    docs = _docs(spark, [("d1", "x " + BENCH_SENT), ("d2", "a b c d e f g h")])
    a = DC.decontaminate(docs, bench, "doc_id", "text", gram_key="xxhash64")
    b = DC.decontaminate(docs, bench, "doc_id", "text", gram_key="md5")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_dup_ngram_ratio_counts_cross_doc_grams(spark):
    shared = "one two three four five six seven eight"  # exactly one 8-gram
    docs = _docs(
        spark,
        [
            ("d1", shared),
            ("d2", shared + " nine"),  # two 8-grams, one shared with d1
            ("d3", "totally different words here made up fresh tokens"),
        ],
    )
    out = {
        r["doc_id"]: r for r in DC.dup_ngram_ratio(docs, "doc_id", "text").collect()
    }
    assert out["d1"]["n_ngrams"] == 1 and out["d1"]["n_dup_ngrams"] == 1
    assert out["d1"]["dup_ratio"] == 1.0
    assert out["d2"]["n_ngrams"] == 2 and out["d2"]["n_dup_ngrams"] == 1
    assert out["d2"]["dup_ratio"] == 0.5
    assert out["d3"]["n_dup_ngrams"] == 0 and out["d3"]["dup_ratio"] == 0.0


def test_token_ngram_array_is_distinct_and_ordered_window(spark):
    df = spark.createDataFrame([("a b a b a b a b a b",)], ["t"])
    grams = df.select(DC.token_ngram_array("t", n=8).alias("g")).head()["g"]
    # 10 tokens -> three 8-gram windows but only two distinct strings
    assert sorted(grams) == ["a b a b a b a b", "b a b a b a b a"]


def test_dup_span_scrub_removes_shared_span_only(spark):
    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    docs = _docs(
        spark,
        [
            ("d1", "intro words here " + shared + " tail one two"),
            ("d2", shared + " different ending entirely"),
            ("d3", "no overlap with anybody at all in this document"),
        ],
    )
    out = {
        r["doc_id"]: r
        for r in DC.dup_span_scrub(docs, "doc_id", "text").collect()
    }
    assert out["d1"]["clean_text"] == "intro words here tail one two"
    assert out["d1"]["n_removed"] == 8 and out["d1"]["n_words"] == 14
    assert out["d2"]["clean_text"] == "different ending entirely"
    assert out["d2"]["n_removed"] == 8
    # untouched doc comes back verbatim with n_removed = 0
    assert out["d3"]["clean_text"] == out["d3"]["clean_text"].strip()
    assert out["d3"]["n_removed"] == 0 and out["d3"]["n_words"] == 9


def test_dup_span_scrub_covers_overlapping_windows(spark):
    # 9 shared tokens -> two overlapping dup 8-grams; all 9 positions
    # covered, not 8 + 8 = 16 (the cover is a position SET)
    span = "one two three four five six seven eight nine"
    docs = _docs(spark, [("a", span + " left"), ("b", span + " right")])
    out = {r["doc_id"]: r for r in DC.dup_span_scrub(docs, "doc_id", "text").collect()}
    assert out["a"]["n_removed"] == 9 and out["a"]["clean_text"] == "left"
    assert out["b"]["n_removed"] == 9 and out["b"]["clean_text"] == "right"


def test_dup_span_scrub_short_docs_never_scrubbed(spark):
    docs = _docs(spark, [("a", "tiny shared words"), ("b", "tiny shared words")])
    out = DC.dup_span_scrub(docs, "doc_id", "text").collect()
    assert all(r["n_removed"] == 0 for r in out)
    assert {r["clean_text"] for r in out} == {"tiny shared words"}


def test_dup_span_scrub_md5_and_xxhash_agree(spark):
    shared = "alpha beta gamma delta epsilon zeta eta theta"
    docs = _docs(spark, [("d1", "x " + shared), ("d2", shared + " y")])
    a = DC.dup_span_scrub(docs, "doc_id", "text", gram_key="xxhash64")
    b = DC.dup_span_scrub(docs, "doc_id", "text", gram_key="md5")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def _line_docs(spark, rows):
    return spark.createDataFrame(
        [(int(i), t) for i, t in rows], "doc_id long, text string"
    )


def _scrubbed(out):
    return {r["doc_id"]: r for r in out.collect()}


def test_dup_line_scrub_keep_first_keeps_exactly_one(spark):
    docs = _line_docs(
        spark,
        [
            (1, "nav bar\nalpha beta\nfooter text"),
            (2, "nav bar\ngamma\nfooter text"),
            (3, "unique only\nnav bar"),
        ],
    )
    got = _scrubbed(DC.dup_line_scrub(docs))
    # keeper of both dup lines is doc 1 (smallest doc_id, smallest pos)
    assert got[1]["clean_text"] == "nav bar\nalpha beta\nfooter text"
    assert got[2]["clean_text"] == "gamma"
    assert got[3]["clean_text"] == "unique only"
    assert (got[1]["n_lines"], got[1]["n_removed"]) == (3, 0)
    assert (got[2]["n_lines"], got[2]["n_removed"]) == (3, 2)
    assert (got[3]["n_lines"], got[3]["n_removed"]) == (2, 1)


def test_dup_line_scrub_remove_all_mode(spark):
    docs = _line_docs(
        spark,
        [(1, "nav\nalpha"), (2, "nav\nbeta")],
    )
    got = _scrubbed(DC.dup_line_scrub(docs, keep_first=False))
    assert got[1]["clean_text"] == "alpha"
    assert got[2]["clean_text"] == "beta"


def test_dup_line_scrub_normalizes_case_and_whitespace(spark):
    # "Nav  Bar " and "nav bar" are the same normalized line; removal
    # drops the RAW line, keeper keeps its raw form
    docs = _line_docs(
        spark,
        [(1, "Nav  Bar \ncontent one"), (2, "nav bar\ncontent two")],
    )
    got = _scrubbed(DC.dup_line_scrub(docs))
    assert got[1]["clean_text"] == "Nav  Bar \ncontent one"
    assert got[2]["clean_text"] == "content two"


def test_dup_line_scrub_blank_lines_exempt_and_kept(spark):
    docs = _line_docs(
        spark,
        [(1, "a\n\nb"), (2, "c\n\nd"), (3, "e\n   \nf")],
    )
    got = _scrubbed(DC.dup_line_scrub(docs))
    # blank/whitespace-only lines are shared by all three docs but are
    # never counted as duplicates — every doc keeps its structure
    assert got[1]["clean_text"] == "a\n\nb"
    assert got[3]["clean_text"] == "e\n   \nf"
    assert all(r["n_removed"] == 0 for r in got.values())


def test_dup_line_scrub_within_doc_repeat_of_global_dup_removed(spark):
    docs = _line_docs(
        spark,
        [(1, "promo\nbody\npromo"), (2, "promo\nother")],
    )
    got = _scrubbed(DC.dup_line_scrub(docs))
    # keeper is (doc 1, pos 0); the within-doc repeat at pos 2 goes too
    assert got[1]["clean_text"] == "promo\nbody"
    assert got[2]["clean_text"] == "other"


def test_dup_line_scrub_single_doc_repeat_not_corpus_dup(spark):
    # a line repeated only WITHIN one doc has df=1 -> untouched
    docs = _line_docs(
        spark,
        [(1, "chorus\nverse\nchorus"), (2, "something else")],
    )
    got = _scrubbed(DC.dup_line_scrub(docs))
    assert got[1]["clean_text"] == "chorus\nverse\nchorus"
    assert got[1]["n_removed"] == 0


def test_dup_line_scrub_md5_and_xxhash_agree(spark):
    docs = _line_docs(
        spark,
        [
            (1, "nav bar\nalpha\nfooter"),
            (2, "nav bar\nbeta\nfooter"),
            (3, "gamma\nnav bar"),
        ],
    )
    a = sorted(DC.dup_line_scrub(docs, line_key="xxhash64").collect())
    b = sorted(DC.dup_line_scrub(docs, line_key="md5").collect())
    assert a == b


def test_null_and_blank_texts_emit_no_grams(spark):
    from dedupe_spark.operators.decontam import doc_grams

    df = spark.createDataFrame(
        [(1, None), (2, "   "), (3, "a b c")], "doc_id long, text string"
    )
    for key in ("xxhash64", "md5"):
        got = doc_grams(df, "doc_id", "text", n=8, gram_key=key).collect()
        assert {r["doc_id"] for r in got} == {3}, key


def test_dup_span_scrub_null_text_row_preserved(spark):
    from dedupe_spark.operators.decontam import dup_span_scrub

    df = spark.createDataFrame(
        [(1, None), (2, "x y z"), (3, "x y z")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in dup_span_scrub(df, n=2).collect()}
    assert set(rows) == {1, 2, 3}  # one row per input doc, incl. NULL text
    assert rows[1]["n_removed"] == 0 and rows[1]["n_words"] is not None
