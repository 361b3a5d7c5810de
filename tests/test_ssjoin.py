"""set_similarity_join (operators/ssjoin.py): exactness vs brute force.

The prefix filter is only correct if it is COMPLETE — every qualifying
pair must survive pruning. These tests compare the operator against a
pure-Python brute force over the same shingle sets, including the
ceil(t*|A|) integer boundary where a float-noise over-ceiling would
silently shorten the prefix and drop pairs.
"""

from __future__ import annotations

from itertools import combinations

import pytest

from dedupe_spark.operators.ssjoin import set_similarity_join


def _shingles(text: str, n: int) -> set[str]:
    w = text.split()
    if n == 1:
        return set(w)
    return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}


def _brute(rows, n, t):
    sets = {i: _shingles(txt, n) for i, txt in rows if txt and txt.strip()}
    out = {}
    for (i1, s1), (i2, s2) in combinations(sorted(sets.items()), 2):
        if not s1 or not s2:
            continue
        ov = len(s1 & s2)
        j = ov / (len(s1) + len(s2) - ov)
        if j >= t:  # contract: threshold on the TRUE Jaccard
            out[(i1, i2)] = round(j, 6)
    return out


ROWS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy cat"),
    (3, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
    (4, "a completely different sentence with no shared words at all"),
    (5, "pack my box with five dozen liquor jugs"),
    (6, "pack my box with five dozen liquor jugs today"),
    (7, "alpha beta gamma delta"),  # size-4 set: ceil(0.5*4)=2 boundary
    (8, "alpha beta epsilon zeta"),  # overlap 2, union 6 -> J=1/3
    (9, "alpha beta gamma zeta"),  # vs 7: overlap 3, union 5 -> J=0.6
    (10, ""),  # empty: excluded
    (11, "   "),  # whitespace-only: excluded
    (12, "one two"),  # shorter than n=3: excluded from shingle join
]


@pytest.mark.parametrize("n,t", [(1, 0.5), (1, 0.25), (3, 0.3), (3, 0.5)])
def test_matches_brute_force(spark, n, t):
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    got = {
        (r["id1"], r["id2"]): r["jaccard"]
        for r in set_similarity_join(df, t, n=n).collect()
    }
    assert got == _brute(ROWS, n, t)


def test_boundary_pair_kept(spark):
    # J(7,9) = 3/5 = 0.6 exactly at threshold 0.6: must be returned
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    got = {
        (r["id1"], r["id2"]) for r in set_similarity_join(df, 0.6, n=1).collect()
    }
    assert (7, 9) in got


def test_no_cartesian_product(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    plan = (
        set_similarity_join(df, 0.5, n=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_sketch_recall_scorecard(spark):
    from dedupe_spark.queries import q_blocking_quality, q_sketch_recall

    rows = {r["method"]: r for r in q_sketch_recall(spark, "/root/testdata/sf0.001").collect()}
    # the flagship sketch catches every exact near-dup on this corpus
    assert rows["minhash"]["recall"] == 1.0
    assert rows["minhash"]["precision"] == 1.0
    # the blocked path can never exceed its block key's completeness
    (bq,) = q_blocking_quality(spark, "/root/testdata/sf0.001").collect()
    assert rows["ngram_blocked"]["n_hit"] <= bq["n_covered"]
    for r in rows.values():
        assert r["n_hit"] <= min(r["n_pred"], r["n_truth"])


# ---------------------------------------------------------------------------
# edit_distance_join (Ed-Join q-gram prefix filtering + short bucket)
# ---------------------------------------------------------------------------


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _brute_ed(rows, tau):
    out = {}
    for (i1, s1), (i2, s2) in combinations(sorted(rows), 2):
        if s1 is None or s2 is None:
            continue
        d = _lev(s1, s2)
        if d <= tau:
            out[(i1, i2)] = d
    return out


ED_ROWS = [
    (1, "the quick brown fox"),
    (2, "the quick brown fax"),  # 1 sub from 1
    (3, "the quick brown fox"),  # exact dup of 1 (dist 0)
    (4, "the quick brown foxx"),  # 1 insert vs 1, 2 edits vs 2
    (5, "a completely different string"),
    (6, "ab"),  # len < q: no grams -> short bucket
    (7, "abc"),  # dist 1 from 6 via insert
    (8, "aaaaaaaaaaaaaaaa"),  # single distinct gram -> short bucket
    (9, "aaaaaaaaaaaaaaab"),  # 1 sub from 8; both route through bucket
    (10, ""),  # empty string participates (dist 1 to any 1-char)
    (11, "x"),
    (12, "xy"),  # dist 1 from 11 and from 6? ('ab'->'xy' is 2)
]


@pytest.mark.parametrize("tau,q", [(1, 4), (2, 4), (1, 3), (2, 2)])
def test_edit_join_matches_brute_force(spark, tau, q):
    from dedupe_spark.operators.ssjoin import edit_distance_join

    df = spark.createDataFrame(ED_ROWS, "doc_id long, s string")
    got = {
        (r["id1"], r["id2"]): r["dist"]
        for r in edit_distance_join(df, tau, str_col="s", q=q).collect()
    }
    assert got == _brute_ed(ED_ROWS, tau)


def test_edit_join_prefix_path_covers_long_pair(spark):
    """A distance-1 pair of LONG strings (never in the short bucket) must
    arrive through the gram-prefix join alone."""
    from dedupe_spark.operators.ssjoin import edit_distance_join

    rows = [
        (1, "abcdefghijklmnopqrstuvwxyz"),
        (2, "abcdefghijklmnopqrstuvwxyZ".lower()[:-1] + "q"),  # 1 sub at end
        (3, "zyxwvutsrqponmlkjihgfedcba"),
    ]
    got = {
        (r["id1"], r["id2"]): r["dist"]
        for r in edit_distance_join(
            spark.createDataFrame(rows, "doc_id long, s string"), 1
        ).collect()
    }
    assert got == {(1, 2): 1}


def test_edit_join_null_and_tau_zero(spark):
    """NULL strings are excluded; tau=0 degenerates to exact-dup pairs."""
    from dedupe_spark.operators.ssjoin import edit_distance_join

    rows = [(1, "same text here"), (2, "same text here"), (3, None),
            (4, "same text herE".lower()), (5, "other")]
    got = {
        (r["id1"], r["id2"]): r["dist"]
        for r in edit_distance_join(
            spark.createDataFrame(rows, "doc_id long, s string"), 0
        ).collect()
    }
    assert got == {(1, 2): 0, (1, 4): 0, (2, 4): 0}
