"""Distributed BPE training (operators/bpe.py): merge-scan semantics the
oracle hash can't isolate — left-to-right overlap handling, frequency
weighting, deterministic tie order, early stop, and the no-Python plan."""

from __future__ import annotations

import pandas as pd

from dedupe_spark.operators.bpe import US, train_bpe


def _docs(spark, texts):
    return spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )


def test_reference_bpe_parity(spark):
    """train_bpe reproduces a straight single-node reference BPE (word
    dict + pair counts + left-to-right merge) on a mixed corpus."""
    texts = ["low lower lowest", "low low newest newest", "wider new newest"]
    out = train_bpe(_docs(spark, texts), n_merges=4).toPandas()

    # single-node reference
    from collections import Counter

    words = Counter()
    for t in texts:
        for w in t.lower().split():
            words[tuple(w)] += 1
    ref = []
    for _ in range(4):
        pairs = Counter()
        for syms, c in words.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        (a, b), pc = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if pc < 2:
            break
        ref.append((a, b, a + b, pc))
        merged = {}
        for syms, c in words.items():
            out_syms, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out_syms.append(a + b)
                    i += 2
                else:
                    out_syms.append(syms[i])
                    i += 1
            merged[tuple(out_syms)] = merged.get(tuple(out_syms), 0) + c
        words = Counter(merged)

    got = list(
        out.sort_values("rank")[
            ["left_sym", "right_sym", "merged", "pair_count"]
        ].itertuples(index=False, name=None)
    )
    assert got == ref


def test_overlapping_pairs_merge_left_to_right(spark):
    """'aaaa' under merge (a,a) yields [aa, aa] — the left-to-right scan
    never re-merges a freshly created symbol in the same round, so the
    round-1 count of (a,a) in 'aaaa'×2 + 'aaa' is 2·3 + 2 = 8."""
    out = train_bpe(_docs(spark, ["aaaa aaaa aaa"]), n_merges=2).toPandas()
    r1 = out[out["rank"] == 1].iloc[0]
    assert (r1.left_sym, r1.right_sym, r1.pair_count) == ("a", "a", 8)
    # round 2 operates on merged symbols: aaaa -> [aa,aa] (pair (aa,aa) x2),
    # aaa -> [aa,a] (pair (aa,a) x1) => best is (aa,aa) with count 2
    r2 = out[out["rank"] == 2].iloc[0]
    assert (r2.left_sym, r2.right_sym, r2.pair_count) == ("aa", "aa", 2)


def test_tie_break_and_early_stop(spark):
    """Equal-count pairs resolve by (left, right) ascending; a corpus
    with no repeated pair stops before n_merges."""
    # 'xy' and 'ab' both occur twice -> tie; ('a','b') < ('x','y')
    out = train_bpe(_docs(spark, ["xy ab", "ab xy"]), n_merges=1).toPandas()
    assert tuple(out.iloc[0][["left_sym", "right_sym"]]) == ("a", "b")
    # all pairs unique -> pc == 1 everywhere -> zero merges emitted
    out2 = train_bpe(_docs(spark, ["abc def"]), n_merges=3).toPandas()
    assert len(out2) == 0


def test_word_guards_and_weighting(spark):
    """Words longer than max_word_len are excluded; word FREQUENCY (not
    document count) weights the pairs."""
    long_word = "z" * 100
    out = train_bpe(
        _docs(spark, [f"{long_word} qq qq qq"]), n_merges=1
    ).toPandas()
    assert tuple(out.iloc[0][["left_sym", "right_sym", "pair_count"]]) == (
        "q",
        "q",
        3,
    )


def test_no_python_workers(spark):
    """Every per-round job is built-in expressions only — the merge fold
    is a codegen'd aggregate(), not a UDF."""
    docs = _docs(spark, ["low lower lowest"] * 5)
    out = train_bpe(docs, n_merges=2)
    # train_bpe returns a local createDataFrame of the collected rules;
    # assert the WORD relation plan (the per-round workhorse) is UDF-free
    from dedupe_spark.operators.bpe import _apply_merge, _pair_counts, _words

    w = _words(docs, "text", 64)
    plan = (
        _pair_counts(_apply_merge(w, "l", "o"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert out.count() == 2


def _ref_encode(word, merges):
    """Single-node reference encoder: apply merges in rank order, each a
    left-to-right scan (matches _apply_merge fold semantics)."""
    syms = list(word)
    for a, b in merges:
        out = []
        for s in syms:
            if out and out[-1] == a and s == b:
                out[-1] = a + b
            else:
                out.append(s)
        syms = out
    return syms


def test_encode_tokens_reference_parity(spark):
    from collections import Counter

    from dedupe_spark.operators.bpe import encode_tokens

    merges = [("e", "r"), ("t", "h"), ("th", "e"), ("er", "s")]
    texts = ["the thermos brothers gathered", "other weathers the er ther"]
    got = {
        r.token: r.tok_count
        for r in encode_tokens(_docs(spark, texts), merges).collect()
    }
    ref = Counter()
    for t in texts:
        for w in t.lower().split():
            ref.update(_ref_encode(w, merges))
    assert got == dict(ref)
    # compound rules fired: "the" exists as one token, and ("er","s")
    # consumed the ("e","r") output
    assert "the" in got and "ers" in got


def test_encode_tokens_single_plan_no_python(spark):
    """The whole encode (6 merges) is ONE declarative UDF-free plan."""
    from dedupe_spark.operators.bpe import encode_tokens

    df = encode_tokens(_docs(spark, ["the thin thorn"] * 3),
                       [("t", "h"), ("th", "e")])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "BatchEvalPython" not in plan
