"""Temperature mixture sampling + overlapping token chunking."""

from __future__ import annotations

import math

import pandas as pd
import pytest
from pyspark.sql import functions as F

from dedupe_spark.queries import (
    CHUNK_SIZE,
    CHUNK_STRIDE,
    MIX_BUDGET_DEN,
    QUERIES,
)

SF = "/root/testdata/sf0.001"


def test_mixture_quotas_match_reference(spark):
    """Selected counts per domain equal the tau=0.5 quota formula
    re-derived in plain Python with the same pinned float order."""
    rows = QUERIES["mixture_sample"](spark, SF).collect()
    docs = pd.read_parquet(SF + "/documents.parquet")
    cnt = docs.groupby("lang").size().to_dict()
    w_total = 0.0
    for lang in sorted(cnt):
        w_total = w_total + math.sqrt(cnt[lang])
    budget = float(len(docs) // MIX_BUDGET_DEN)
    quota = {
        lang: int(budget * math.sqrt(c) / w_total) for lang, c in cnt.items()
    }
    got = {}
    for r in rows:
        if r["selected"]:
            got[r["lang"]] = got.get(r["lang"], 0) + 1
    assert got == {k: v for k, v in quota.items() if v > 0}
    assert len(rows) == len(docs)  # every doc carries a verdict


def test_mixture_boosts_tail_vs_proportional(spark):
    """sqrt temperature: the majority domain's selected share must be
    below its corpus share, a minority domain's above."""
    rows = QUERIES["mixture_sample"](spark, SF).collect()
    corpus: dict[str, int] = {}
    sel: dict[str, int] = {}
    for r in rows:
        corpus[r["lang"]] = corpus.get(r["lang"], 0) + 1
        if r["selected"]:
            sel[r["lang"]] = sel.get(r["lang"], 0) + 1
    n, s = sum(corpus.values()), sum(sel.values())
    major = max(corpus, key=corpus.get)
    minor = min(corpus, key=corpus.get)
    assert corpus[major] > corpus[minor]  # the corpus is actually skewed
    assert sel[major] / s < corpus[major] / n
    assert sel[minor] / s > corpus[minor] / n
    # budget respected modulo per-domain floor loss
    budget = n // MIX_BUDGET_DEN
    assert budget - len(corpus) <= s <= budget


def test_mixture_selection_is_md5_rank(spark):
    """Within a domain, the selected set is exactly the lowest md5
    ranks — rerun-stable and engine-portable."""
    import hashlib

    rows = QUERIES["mixture_sample"](spark, SF).collect()
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rs in by_lang.items():
        k = sum(1 for r in rs if r["selected"])
        order = sorted(
            rs,
            key=lambda r: hashlib.md5(str(r["doc_id"]).encode()).hexdigest()
            + str(r["doc_id"]),
        )
        assert all(r["selected"] for r in order[:k])
        assert not any(r["selected"] for r in order[k:])


def test_chunks_reconstruct_documents(spark):
    """De-overlapped chunk concatenation reproduces every document's
    token stream exactly."""
    rows = QUERIES["chunk_documents"](spark, SF).collect()
    docs = pd.read_parquet(SF + "/documents.parquet")
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], {})[r["chunk_idx"]] = r
    overlap = CHUNK_SIZE - CHUNK_STRIDE
    for _, d in docs.iterrows():
        toks = [t for t in (d["text"] or "").strip().split() if t]
        chunks = by_doc[d["doc_id"]]
        assert sorted(chunks) == list(range(len(chunks)))
        rebuilt: list[str] = []
        end = 0  # tokens covered so far
        for i in range(len(chunks)):
            start = i * CHUNK_STRIDE
            ct = chunks[i]["chunk_text"].split() if chunks[i]["chunk_text"] else []
            assert len(ct) == chunks[i]["n_chunk_tokens"]
            assert start <= end  # overlap, never a gap
            rebuilt.extend(ct[end - start:])
            end = start + len(ct)
        assert rebuilt == toks, d["doc_id"]
        assert overlap >= 0  # sanity on the constants


def test_chunk_boundaries_and_empty(spark):
    """n=CHUNK_SIZE tokens -> 1 chunk; one more token -> 2 chunks with
    the overlap; empty text -> exactly one empty chunk."""
    txt64 = " ".join(f"t{i}" for i in range(CHUNK_SIZE))
    txt65 = " ".join(f"t{i}" for i in range(CHUNK_SIZE + 1))
    df = spark.createDataFrame(
        [(1, txt64), (2, txt65), (3, ""), (4, None)],
        ["doc_id", "text"],
    )
    import dedupe_spark.queries as Q

    orig = Q._docs
    Q._docs = lambda spark_, sf_: df
    try:
        rows = QUERIES["chunk_documents"](spark, "ignored").collect()
    finally:
        Q._docs = orig
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc[1]) == 1 and by_doc[1][0]["n_chunk_tokens"] == CHUNK_SIZE
    assert len(by_doc[2]) == 2
    tail = [r for r in by_doc[2] if r["chunk_idx"] == 1][0]
    assert tail["n_chunk_tokens"] == CHUNK_SIZE + 1 - CHUNK_STRIDE
    for empty_id in (3, 4):
        assert len(by_doc[empty_id]) == 1
        assert by_doc[empty_id][0]["chunk_text"] == ""
        assert by_doc[empty_id][0]["n_chunk_tokens"] == 0


def test_chunking_is_map_side_only(spark):
    """The chunk plan must contain no Exchange — it's a pure row-local
    explode/projection (the pre-embedding map stage at 100 TB)."""
    q = QUERIES["chunk_documents"](spark, SF)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "EvalPython" not in plan
