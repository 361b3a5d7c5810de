"""DSIR importance-weighted selection (operators/dsir.py): behavioral
properties the oracle hash can't express — that target-like raw docs
score HIGHER than off-distribution ones, tokenless docs survive with a
zero score, and the feature stream stays a single corpus scan."""

from __future__ import annotations

import pandas as pd
import pytest

from dedupe_spark.operators.dsir import TARGET_HEX, dsir_scores
from dedupe_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _md5_hex1(i: int) -> str:
    import hashlib

    return hashlib.md5(str(i).encode()).hexdigest()[0]


def _ids_by_slice(n: int):
    target = [i for i in range(n) if _md5_hex1(i) in TARGET_HEX]
    raw = [i for i in range(n) if _md5_hex1(i) not in TARGET_HEX]
    return target, raw


def test_target_like_raw_docs_score_higher(spark):
    """Raw docs that share the target slice's vocabulary outrank raw
    docs drawn from a disjoint vocabulary — the defining DSIR property."""
    target_ids, raw_ids = _ids_by_slice(400)
    assert len(target_ids) >= 50 and len(raw_ids) >= 100
    rows = []
    for i in target_ids:
        rows.append((i, "the quick brown fox jumps over the lazy dog"))
    # first half of raw docs mimic the target, second half are disjoint
    half = len(raw_ids) // 2
    for i in raw_ids[:half]:
        rows.append((i, "the quick brown fox naps under the lazy dog"))
    for i in raw_ids[half:]:
        rows.append((i, "zzz qqq www eee rrr ttt yyy uuu iii ooo"))
    docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    out = dsir_scores(docs).toPandas().set_index("doc_id")
    mimic = out.loc[raw_ids[:half]]
    disjoint = out.loc[raw_ids[half:]]
    assert mimic.dsir_unats.min() > disjoint.dsir_unats.max()
    # above-mean selection separates the two raw populations exactly
    assert bool(mimic.selected.all()) and not bool(disjoint.selected.any())
    # DSIR reality check: raw log-ratios are negative even for target-like
    # docs (their features are dense in the raw pool too) — the property
    # that rules out an absolute zero threshold
    assert mimic.dsir_unats.max() < 0


def test_tokenless_and_target_rows(spark):
    """Empty/whitespace raw docs are kept with a 0 score; target-slice
    docs never appear in the output."""
    target_ids, raw_ids = _ids_by_slice(100)
    rows = [(i, "common words here") for i in target_ids]
    rows += [(raw_ids[0], ""), (raw_ids[1], "   \t\n "), (raw_ids[2], "common words here")]
    docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    out = dsir_scores(docs).toPandas().set_index("doc_id")
    assert set(out.index) == {raw_ids[0], raw_ids[1], raw_ids[2]}
    assert out.loc[raw_ids[0], "dsir_unats"] == 0 and out.loc[raw_ids[0], "n_feats"] == 0
    assert out.loc[raw_ids[1], "dsir_unats"] == 0


def test_bigram_feature_count(spark):
    """n_feats = tokens + bigrams = 2·n_tokens − 1 for a single doc with
    n ≥ 1 whitespace-delimited tokens."""
    target_ids, raw_ids = _ids_by_slice(100)
    rows = [(target_ids[0], "a b c")] + [(raw_ids[0], "one two three four")]
    docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    out = dsir_scores(docs).toPandas().set_index("doc_id")
    assert out.loc[raw_ids[0], "n_feats"] == 4 + 3


def test_single_corpus_scan_plan(spark):
    """The registered query builds the model and the scores off ONE
    materialized feature stream (cached — each consumer reads the
    InMemory relation, not a re-run of the corpus explode), contains no
    Python worker (all built-in expressions), and scans the corpus
    parquet at most twice (feature pass + raw-id re-attach)."""
    q = QUERIES["dsir_select"](spark, SF)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    # the feature stream is materialized once and every consumer reads
    # the InMemory relation (a FileScan count over the plan STRING would
    # overcount: each cached relation's definition embeds its source scan)
    assert "InMemoryTableScan" in plan
    # the <= n_buckets-row log-ratio model joins broadcast-side — the
    # corpus-sized feature stream must never sort-merge on the bucket key
    # (any SortMergeJoin in the string is the raw-id left-join re-attach,
    # rendered once per cached-relation definition)
    assert plan.count("BroadcastHashJoin") >= 1
    assert "SortMergeJoin [bucket" not in plan
