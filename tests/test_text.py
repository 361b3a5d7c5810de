"""Text-analysis function tests (token count, quality, lang-id, fingerprint)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from dedupe_spark.functions import text as T

TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "der hund ist nicht zu haus und die katze auch nicht",
    "le chat est dans la maison avec le chien",
    "el perro es un animal en la casa",
    "",
    "   ",
    "one",
    "a, b; c! d? e... 123 456",
]


def _duck_vals(sql_expr: str, texts=TEXTS):
    duck = duckdb.connect()
    duck.register("t", pd.DataFrame({"txt": texts}))
    return [r[0] for r in duck.sql(f"SELECT {sql_expr} FROM t").fetchall()]


def _spark_vals(spark, col_expr, texts=TEXTS):
    df = spark.createDataFrame([(t,) for t in texts], "txt string")
    return [r["o"] for r in df.select(col_expr.alias("o")).collect()]


def test_token_count_matches_sql(spark):
    got = _spark_vals(spark, T.token_count("txt"))
    want = _duck_vals(T.token_count_sql("txt"))
    assert got == want
    assert got[0] == 9 and got[4] == 0 and got[5] == 0 and got[6] == 1


def test_subword_count_matches_sql(spark):
    got = _spark_vals(spark, T.subword_count("txt"))
    want = _duck_vals(T.subword_count_sql("txt"))
    assert got == want
    # 'a, b; c! d? e... 123 456' -> 5 letters + 2 digit runs + 3+1+1+1+1 syms
    assert got[7] == 5 + 2 + 7


def test_fingerprint_matches_sql(spark):
    got = _spark_vals(spark, T.fingerprint("txt"))
    want = _duck_vals(T.fingerprint_sql("txt"))
    assert got == want
    assert got[4] == 0 and got[5] == 0
    # order sensitivity: swapped tokens -> different fingerprint
    a, b = _spark_vals(spark, T.fingerprint("txt"), ["alpha beta", "beta alpha"])
    assert a != b


def test_quality_features(spark):
    s = "the cat and the dog sat on the mat together today"
    df = spark.createDataFrame([(s,)], "txt string")
    row = T.add_quality_features(df, "txt").collect()[0]
    assert row["q_n_tokens"] == len(s.split())
    assert row["q_n_chars"] == len(s)
    assert 0 <= row["q_punct_ratio"] < 0.05
    assert row["q_stopword_ratio"] >= 0.3  # the/and/the/on/the
    assert 0 < row["q_uniq_token_ratio"] <= 1.0
    score = df.select(T.quality_score("txt").alias("s")).collect()[0]["s"]
    assert 0.0 <= score <= 1.0


def test_quality_penalizes_junk(spark):
    good = "the quick brown fox jumps over the lazy dog and it is a fine day"
    junk = "%%% ### @@@ !!! *** ((( ))) ^^^ &&& $$$"
    rep = "spam spam spam spam spam spam spam spam spam spam"
    df = spark.createDataFrame([(good,), (junk,), (rep,)], "txt string")
    scores = [r["s"] for r in df.select(T.quality_score("txt").alias("s")).collect()]
    assert scores[0] > scores[1]
    assert scores[0] > scores[2]


def test_lang_id(spark):
    df = spark.createDataFrame([(t,) for t in TEXTS[:4]], "txt string")
    got = [r["l"] for r in df.select(T.lang_id("txt").alias("l")).collect()]
    assert got == ["en", "de", "fr", "es"]
    und = spark.createDataFrame([("xyzzy plugh",)], "txt string")
    assert und.select(T.lang_id("txt").alias("l")).collect()[0]["l"] == "und"


def test_ngram_lang_udf(spark):
    profiles = {
        "en": T._ngram_profile("the quick brown fox the lazy dog the end of the day"),
        "de": T._ngram_profile("der schnelle braune fuchs der faule hund der tag"),
    }
    udf = T.make_ngram_lang_udf(profiles)
    df = spark.createDataFrame(
        [("the fox and the dog in the fog",), ("der fuchs und der hund",)],
        "txt string",
    )
    got = [r["l"] for r in df.select(udf(F.col("txt")).alias("l")).collect()]
    assert got == ["en", "de"]


def test_rolling_and_winnowing():
    hs = T.rolling_hashes("abcdefgh", window=4)
    assert len(hs) == 5
    # rolling equals direct polynomial hash at each window
    for i, h in enumerate(hs):
        assert h == T._poly_hash("abcdefgh"[i : i + 4], 257, (1 << 61) - 1)
    fp1 = T.winnowing_fingerprints("the quick brown fox jumps over the dog")
    fp2 = T.winnowing_fingerprints("the quick brown fox jumps over the cat")
    fp3 = T.winnowing_fingerprints("completely unrelated sentence here now")
    assert fp1 and fp1 == sorted(set(fp1))
    overlap12 = len(set(fp1) & set(fp2)) / len(set(fp1) | set(fp2))
    overlap13 = len(set(fp1) & set(fp3)) / len(set(fp1) | set(fp3))
    assert overlap12 > overlap13


def test_repetition_scores_hand_computed(spark):
    from dedupe_spark.functions.text import repetition_scores

    rows = [
        # "a a a b": top unigram a=3/4; bigrams [a a, a a, a b]:
        # top 2/3, dup (3-2)/3
        (1, "a a a b"),
        # all distinct: top unigram 1/4, top bigram 1/3, dup 0
        (2, "w x y z"),
        # single token: n-1 == 0 -> bigram fracs 0 by the greatest() guard
        (3, "solo"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in repetition_scores(df).collect()}
    assert got[1]["n_tokens"] == 4
    assert abs(got[1]["top_unigram_frac"] - 0.75) < 1e-9
    assert abs(got[1]["top_bigram_frac"] - 2 / 3) < 1e-6
    assert abs(got[1]["dup_bigram_frac"] - 1 / 3) < 1e-6
    assert abs(got[2]["top_unigram_frac"] - 0.25) < 1e-9
    assert got[2]["dup_bigram_frac"] == 0.0
    assert got[3]["top_bigram_frac"] == 0.0 and got[3]["dup_bigram_frac"] == 0.0


def test_canonical_url_rules(spark):
    from dedupe_spark.functions.urls import canonical_url

    cases = [
        # (raw, expected canonical)
        ("HTTP://WWW.Example.COM:80/Path/One?b=2&a=1#frag",
         "http://www.example.com/Path/One?a=1&b=2"),   # path case preserved
        ("https://example.com:443/", "https://example.com/"),
        ("https://example.com:8443/x", "https://example.com:8443/x"),  # non-default port kept
        ("http://example.com", "http://example.com/"),  # empty path -> /
        ("http://example.com/p?utm_source=x&utm_medium=y&fbclid=1&gclid=2",
         "http://example.com/p"),                       # all-tracking query dropped
        ("http://example.com/p?keep=1&utm_source=x", "http://example.com/p?keep=1"),
        ("not a url", "not a url"),                     # passthrough, lowered
        ("  FTP://Host/X  ", "ftp://host/X"),           # other schemes: no port rule
    ]
    df = spark.createDataFrame([(r,) for r, _ in cases], "raw string")
    got = [r["c"] for r in df.select(canonical_url("raw").alias("c")).collect()]
    assert got == [e for _, e in cases]


def test_repetition_scores_null_and_empty_text(spark):
    """NULL text behaves as '' in BOTH engines (coalesce on each side):
    one empty token, n_tokens=1, fracs (1, 0, 0)."""
    from dedupe_spark.functions.text import repetition_scores

    df = spark.createDataFrame(
        [(1, None), (2, "")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in repetition_scores(df).collect()}
    for i in (1, 2):
        assert got[i]["n_tokens"] == 1
        assert got[i]["top_unigram_frac"] == 1.0
        assert got[i]["top_bigram_frac"] == 0.0
        assert got[i]["dup_bigram_frac"] == 0.0


def test_lang_confusion_grid_is_complete_and_integer_exact(spark):
    from dedupe_spark.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    df = QUERIES["lang_confusion"](spark, sf).toPandas()
    docs = spark.read.parquet(f"{sf}/documents.parquet").toPandas()
    assert df["n"].sum() == len(docs)
    # per actual class, recall micros sum to <= 1e6 (integer floor per
    # cell) and every count re-derives
    for lang, grp in df.groupby("lang"):
        t = grp["n"].sum()
        assert t == (docs["lang"] == lang).sum()
        for _, r in grp.iterrows():
            assert r["recall_micros"] == (r["n"] * 1_000_000) // t
        assert grp["recall_micros"].sum() <= 1_000_000
    # the honest finding this matrix exists to surface: the synthetic
    # corpus's lang column is METADATA, not text-derivable — the
    # stopword classifier must NOT silently look accurate on it
    diag = df[df["lang"] == df["pred_lang"]]["n"].sum()
    assert diag / df["n"].sum() < 0.5


def test_zipf_profile_discriminates_zipfian_from_template(spark):
    import math
    import tempfile

    import pandas as pd

    from dedupe_spark.queries import QUERIES

    # deterministic Zipf-ish corpus: token w_r appears ~N/r times
    words = []
    for r in range(1, 201):
        words += [f"w{r:03d}"] * (2000 // r)
    docs, line = [], []
    for i, w in enumerate(words):
        line.append(w)
        if len(line) == 50:
            docs.append((len(docs), " ".join(line), "en", "s", 50))
            line = []
    pdf = pd.DataFrame(
        docs, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    d = tempfile.mkdtemp()
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        f"{d}/documents.parquet"
    )
    out = (
        QUERIES["zipf_profile"](spark, d).toPandas().sort_values("bin")
    )
    # many occupied bins and a NEGATIVE vocab-decay slope: Zipfian shape
    assert len(out) >= 8
    slope = out["slope_num"].iloc[0] / out["slope_den"].iloc[0] / 1e6
    assert slope < -0.2
    # structural identities
    assert (out["total_cf"] >= out["n_tokens"]).all()
    for _, r in out.iterrows():
        lo, hi = 1 << int(r["bin"]), (1 << (int(r["bin"]) + 1)) - 1
        assert lo <= r["total_cf"] / r["n_tokens"] <= hi + 1
    # the driver corpus, by contrast, shows the non-Zipfian compressed
    # spectrum (2 occupied bins) — the diagnostic the profile exists for
    flat = QUERIES["zipf_profile"](spark, "/root/testdata/sf0.001").toPandas()
    assert len(flat) <= 3


def test_heaps_law_saturated_vs_growing_vocab(spark):
    import tempfile

    import pandas as pd

    from dedupe_spark.queries import QUERIES

    # the driver corpus: fixed 31-token vocabulary -> beta == 0 exactly
    flat = QUERIES["heaps_law"](spark, "/root/testdata/sf0.001").toPandas()
    assert (flat["vocab"] == flat["vocab"].iloc[0]).all()
    assert flat["beta_num"].iloc[0] == 0
    # growing vocabulary: every doc introduces fresh tokens -> beta > 0,
    # vocab strictly increasing over nested prefixes
    rows = [
        (i, " ".join(f"t{i}_{j}" for j in range(30)) + " shared common",
         "en", "s", 100)
        for i in range(400)
    ]
    pdf = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    d = tempfile.mkdtemp()
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        f"{d}/documents.parquet"
    )
    grow = (
        QUERIES["heaps_law"](spark, d).toPandas().sort_values("lvl")
    )
    assert (grow["vocab"].diff().dropna() > 0).all()
    assert (grow["n_tokens"].diff().dropna() > 0).all()
    beta = grow["beta_num"].iloc[0] / grow["beta_den"].iloc[0]
    assert beta > 0.5
