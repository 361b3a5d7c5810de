"""Sums truth discovery (operators/fusion.py)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from dedupe_spark.operators.fusion import MICRO, sums_truth_discovery
from dedupe_spark.queries import ORACLES, QUERIES

SF = "/root/testdata/sf0.001"


def _claims(spark, rows):
    return spark.createDataFrame(rows, "src long, ent long, val string")


def test_corroborated_sources_earn_trust(spark):
    # s0, s1 agree on both entities; s2 contradicts alone
    out = sums_truth_discovery(
        _claims(
            spark,
            [(0, 1, "a"), (1, 1, "a"), (2, 1, "z"),
             (0, 2, "b"), (1, 2, "b"), (2, 2, "y")],
        )
    )
    trust = {r.src: r.trust_micros for r in out["trust"].collect()}
    assert trust[0] == trust[1] == MICRO  # the corroborated pair is the max
    assert trust[2] < trust[0] / 2
    dec = {r.ent: r.val for r in out["decisions"].collect()}
    assert dec == {1: "a", 2: "b"}


def test_trust_weighted_vote_beats_headcount(spark):
    # e3: two UNcorroborated sources (their other claims are theirs
    # alone — nobody backs them) vote "z"; one source corroborated on 4
    # other entities votes "a" — the earned-trust vote must out-weigh
    # the 2-vs-1 headcount. (Had the z-camp corroborated EACH OTHER,
    # Sums would rightly keep them trusted — belief is a sum.)
    rows = [(0, e, "v%d" % e) for e in range(10, 14)]
    rows += [(1, e, "v%d" % e) for e in range(10, 14)]
    rows += [(2, e, "s2only%d" % e) for e in range(20, 24)]
    rows += [(3, e, "s3only%d" % e) for e in range(30, 34)]
    rows += [(0, 3, "a"), (2, 3, "z"), (3, 3, "z")]
    out = sums_truth_discovery(_claims(spark, rows))
    dec = {r.ent: r.val for r in out["decisions"].collect()}
    assert dec[3] == "a"


def test_duplicate_claims_are_not_extra_evidence(spark):
    once = sums_truth_discovery(
        _claims(spark, [(0, 1, "a"), (1, 1, "b")])
    )["beliefs"].toPandas().sort_values("val").reset_index(drop=True)
    dup = sums_truth_discovery(
        _claims(spark, [(0, 1, "a"), (0, 1, "a"), (1, 1, "b")])
    )["beliefs"].toPandas().sort_values("val").reset_index(drop=True)
    pd.testing.assert_frame_equal(once, dup)


def test_decision_tie_breaks_by_value_asc(spark):
    out = sums_truth_discovery(_claims(spark, [(0, 1, "b"), (1, 1, "a")]))
    dec = out["decisions"].collect()
    assert len(dec) == 1 and dec[0].val == "a"


def test_truth_discovery_query_matches_oracle_and_recovers_truth(spark):
    got = (
        QUERIES["truth_discovery"](spark, SF)
        .toPandas()
        .sort_values("ent")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM"
        f" read_parquet('{SF}/documents.parquet')"
    )
    want = (
        con.execute(ORACLES["truth_discovery"])
        .df()
        .sort_values("ent")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.astype({"ent": "int64", "belief_micros": "int64"}),
        want.astype({"ent": "int64", "belief_micros": "int64"}),
    )
    truth = con.execute("SELECT doc_id AS ent, lang FROM documents").df()
    m = got.merge(truth, on="ent")
    # ~3.7% of docs draw all-unreliable annotator slots ((4/12)^3);
    # everything else must resolve to the true language
    assert (m["val"] == m["lang"]).mean() > 0.9
