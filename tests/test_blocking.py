"""Blocking + candidate-pair tests (SURVEY.md J1/M6)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dedupe_spark.operators import blocking as B


def _blocks(spark, rows):
    """rows: list of (record_id, bk)."""
    return spark.createDataFrame(rows, "record_id string, bk string")


def _pairset(df):
    return {(r["id1"], r["id2"]) for r in df.collect()}


def test_generate_blocks_string_and_array_predicates(spark):
    df = spark.createDataFrame(
        [("r1", "acme corp"), ("r2", "acme inc"), ("r3", "N/A")],
        "record_id string, name string",
    )
    blocks = B.generate_blocks(
        df,
        "record_id",
        {"tok": B.token_array("name"), "pre": B.prefix("name", 4)},
    )
    got = {(r["record_id"], r["bk"]) for r in blocks.collect()}
    assert ("r1", "tok:acme") in got
    assert ("r2", "tok:acme") in got
    assert ("r1", "pre:acme") in got
    # sentinel 'N/A' never blocks (whole value or token)
    assert not any(rid == "r3" and bk == "tok:N/A" for rid, bk in got)
    assert not any(bk == "pre:N/A" for _, bk in got)


def test_candidate_pairs_basic(spark):
    blocks = _blocks(
        spark,
        [("a", "k1"), ("b", "k1"), ("c", "k1"), ("c", "k2"), ("d", "k2")],
    )
    got = _pairset(B.candidate_pairs(blocks))
    assert got == {("a", "b"), ("a", "c"), ("b", "c"), ("c", "d")}


def test_candidate_pairs_dedup_across_predicates(spark):
    blocks = _blocks(spark, [("a", "k1"), ("b", "k1"), ("a", "k2"), ("b", "k2")])
    got = _pairset(B.candidate_pairs(blocks))
    assert got == {("a", "b")}


def test_max_block_cap_drops_mega_blocks(spark):
    rows = [(f"r{i}", "mega") for i in range(30)] + [("x", "ok"), ("y", "ok")]
    blocks = _blocks(spark, rows)
    got = _pairset(B.candidate_pairs(blocks, max_block=10))
    assert got == {("x", "y")}


def test_dropped_block_stats_reports_cap(spark):
    """'No silent caps': the mega-block guard's discards are measurable
    (and warn_dropped_blocks logs them)."""
    rows = (
        [(f"r{i}", "mega") for i in range(30)]
        + [(f"s{i}", "big") for i in range(15)]
        + [("x", "ok"), ("y", "ok")]
    )
    blocks = _blocks(spark, rows)
    stats = B.dropped_block_stats(blocks, max_block=10)
    assert stats == {
        "dropped_keys": 2,
        "dropped_rows": 45,
        "max_dropped_size": 30,
        "max_block": 10,
    }
    assert B.dropped_block_stats(blocks, max_block=100)["dropped_keys"] == 0
    assert B.warn_dropped_blocks(blocks, 10, "test")["dropped_keys"] == 2


def test_salted_equals_simple(spark):
    """Triangle-salted join produces exactly the plain self-join's pairs."""
    import random

    rng = random.Random(5)
    rows = []
    for i in range(200):
        # skewed: key0 huge, others small
        k = "key0" if rng.random() < 0.5 else f"key{rng.randint(1, 20)}"
        rows.append((f"r{i:03d}", k))
    blocks = _blocks(spark, rows)
    for salt_target in (3, 10, 1000):
        salted = _pairset(
            B.candidate_pairs(blocks, max_block=10_000, salt_target=salt_target)
        )
        simple = _pairset(B.simple_candidate_pairs(blocks, max_block=10_000))
        assert salted == simple, salt_target


def test_ngram_array_predicate(spark):
    df = spark.createDataFrame([("r1", "abcde")], "record_id string, v string")
    arr = df.select(B.ngram_array("v", 3).alias("g")).collect()[0]["g"]
    assert arr == ["abc", "bcd", "cde"]
    # short string -> single (whole) gram
    df2 = spark.createDataFrame([("r1", "ab")], "record_id string, v string")
    arr2 = df2.select(B.ngram_array("v", 3).alias("g")).collect()[0]["g"]
    assert arr2 == ["ab"]


def test_minhash_band_blocking_catches_near_dups(spark):
    base = "the quick brown fox jumps over the lazy dog and runs far away home"
    near = base.replace("lazy", "sleepy")
    far = "completely unrelated text with different words entirely and nothing shared"
    df = spark.createDataFrame(
        [("a", base), ("b", near), ("c", far)], "record_id string, body string"
    )
    mh = B.minhash_bands_udf(num_perm=32, bands=16, shingle_k=5)
    blocks = B.generate_blocks(df, "record_id", {"mh": mh(F.col("body"))})
    pairs = _pairset(B.candidate_pairs(blocks))
    assert ("a", "b") in pairs
    assert ("a", "c") not in pairs


def test_skew_stress_mega_key_bounded_with_full_recall(spark):
    """End-to-end skew contract (VERDICT r3 item 5): a corpus where EVERY
    record shares one block key. The mega-key must be dropped AND
    accounted, candidate volume must be exactly the salted hot block's
    grid plus the injected twin pairs, and twin recall must be 1.0 —
    scripts/skew_stress.py runs the same fixture at 200k for BENCH.md."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "skew_stress",
        os.path.join(os.path.dirname(__file__), "..", "scripts", "skew_stress.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    rep = mod.run(spark, n=3000, n_dups=50)
    assert rep["dropped"]["dropped_keys"] == 1           # lang:en, nothing else
    assert rep["dropped"]["dropped_rows"] == rep["n_docs"]
    assert rep["candidate_pairs"] == rep["expected_pairs"]
    assert rep["recall_injected"] == 1.0
    assert rep["containment_ratio"] < 0.03               # bounded vs n^2/2


def test_progressive_waves_front_load_the_matches(spark):
    """Pay-as-you-go contract: wave-1 pairs (multi-predicate agreement)
    must be a strictly richer source of true matches than either later
    wave, measured against the exact ssjoin truth the blocking oracles
    share."""
    from dedupe_spark.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    truth = {
        (str(r.id1), str(r.id2))
        for r in QUERIES["set_similarity_join"](spark, sf).collect()
    }
    p = QUERIES["progressive_pairs"](spark, sf).toPandas()
    prec = {}
    for w in (1, 2, 3):
        sub = p[p.wave == w]
        assert len(sub) > 0, f"wave {w} empty — fixture lost its signal"
        hits = sum(
            (str(a), str(b)) in truth for a, b in zip(sub.id1, sub.id2)
        )
        prec[w] = hits / len(sub)
    assert prec[1] > prec[2] and prec[1] > prec[3]
    # wave semantics are structural, not statistical:
    assert (p[p.wave == 1].n_shared >= 2).all()
    assert (p[p.wave == 2].min_bs <= 10).all()
    assert ((p[p.wave == 2].n_shared == 1)).all()


def test_adaptive_block_keys_refines_overflowing_blocks(spark):
    from dedupe_spark.queries import QUERIES, _ABK_CAP

    sf = "/root/testdata/sf0.001"
    df = QUERIES["adaptive_block_keys"](spark, sf).toPandas()
    docs = spark.read.parquet(f"{sf}/documents.parquet").count()
    # partition: every doc settles at exactly one level
    assert len(df) == docs and df["doc_id"].is_unique
    # every kept block obeys the cap; drops carry their real size
    kept = df[df["level"] > 0]
    assert (kept["block_size"] <= _ABK_CAP).all()
    assert (df[df["level"] == -1]["block_size"] > _ABK_CAP).all()


def test_adaptive_block_keys_synthetic_overflow_settles_deeper(spark):
    """A 300-doc mega-block on (lang|tok1) with distinct second tokens
    must refine to level 2 with singleton-ish blocks; docs whose level-3
    key still collides beyond the cap come back as recorded drops."""
    import pandas as pd

    from dedupe_spark.queries import QUERIES, _ABK_CAP

    rows = [
        (i, f"shared w{i} tail", "en", "s", 300 + i) for i in range(300)
    ] + [
        # 150 docs identical through tok1/tok2 AND length bucket:
        # unresolvable at level 3 -> recorded drop set
        (1000 + i, "shared same filler", "en", "s", 100) for i in range(150)
    ]
    pdf = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    import tempfile

    d = tempfile.mkdtemp()
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        f"{d}/documents.parquet"
    )
    out = QUERIES["adaptive_block_keys"](spark, d).toPandas()
    lv = out.set_index("doc_id")["level"]
    assert (lv.loc[range(300)] == 2).all()  # refined, not dropped
    assert (lv.loc[range(1000, 1150)] == -1).all()  # honest drop set
    kept = out[out["level"] > 0]
    assert (kept["block_size"] <= _ABK_CAP).all()


def test_adaptive_block_keys_operator_semantics(spark):
    from dedupe_spark.operators.blocking import adaptive_block_keys

    rows = [(f"r{i:03d}", "big", f"w{i}", "p") for i in range(30)]
    rows += [("x1", "small", "a", "p"), ("x2", "small", "b", "p")]
    rows += [("n1", None, "c", "p")]  # null level-1 key: falls through
    df = spark.createDataFrame(rows, "id string, k1 string, k2 string, k3 string")
    out = adaptive_block_keys(
        df,
        "id",
        [F.col("k1"), F.col("k2"), F.col("k3")],
        cap=10,
    ).toPandas()
    by = out.groupby("record_id")["bk"].apply(list).to_dict()
    # the 30-doc 'big' block overflows cap=10 -> refined to level 2
    # (distinct k2 -> singletons)
    for i in range(30):
        assert by[f"r{i:03d}"] == [f"abk1:w{i}"]
    # the small block fits at level 1
    assert by["x1"] == ["abk0:small"] and by["x2"] == ["abk0:small"]
    # the null-key row settles at level 2 via its valid k2
    assert by["n1"] == ["abk1:c"]


def test_pipeline_adaptive_blocking_keeps_f1(spark, tmp_path):
    import tempfile

    from dedupe_spark.fixtures import make_labeled_pairs, make_pages
    from dedupe_spark.pipeline import (
        Pipeline,
        PipelineConfig,
        pages_df,
        pairwise_f1,
    )

    pages_pd, truth = make_pages(n_base=120)
    labels = make_labeled_pairs(truth, n_pos=60, n_neg=120)
    out = Pipeline(
        spark,
        PipelineConfig(
            workdir=str(tmp_path / "wd"), adaptive_blocking=True
        ),
    ).run(pages_df(spark, pages_pd), spark.createDataFrame(labels))
    f1 = pairwise_f1(out["assignments"], spark.createDataFrame(labels))
    assert f1["f1"] == 1.0
