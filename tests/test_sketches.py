"""HyperLogLog sketch (operators/sketches.py) vs an independent
hashlib+math reference, plus merge semantics and accuracy bounds."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from dedupe_spark.operators.sketches import (
    _ALPHA,
    _RHO_CAP,
    M,
    hll_estimate,
    hll_merge,
    hll_registers,
)


def ref_registers(items):
    regs = {}
    for it in items:
        h = hashlib.md5(str(it).encode()).hexdigest()
        reg = int(h[:2], 16)
        s = h[2:14]
        z = len(s) - len(s.lstrip("0"))
        if z == 12:
            bits = 48
        else:
            d = s[z]
            nib = 3 if d == "1" else 2 if d in "23" else 1 if d in "4567" else 0
            bits = z * 4 + nib
        regs[reg] = max(regs.get(reg, 0), bits + 1)
    return regs


def ref_estimate(regs):
    z = sum(1 << (_RHO_CAP - r) for r in regs.values())
    z += (M - len(regs)) * (1 << _RHO_CAP)
    raw = _ALPHA * M * M * float(2**_RHO_CAP) / z
    v = M - len(regs)
    if raw <= 2.5 * M and v > 0:
        return M * math.log(M / v)
    return raw


@pytest.fixture(scope="module")
def toks(spark):
    # 12,000 distinct tokens across 2 groups — dense registers, raw path
    rows = [("g%d" % (i % 2), "tok-%d" % i) for i in range(12000)]
    # duplicates must not move the estimate
    rows += [("g0", "tok-%d" % i) for i in range(0, 12000, 7)]
    return spark.createDataFrame(rows, "grp string, tok string")


def test_registers_match_reference(toks):
    got = {
        (r["grp"], r["reg"]): r["rho"]
        for r in hll_registers(toks, ["grp"], "tok").collect()
    }
    for g in ("g0", "g1"):
        want = ref_registers(
            [t for (gg, t) in toks.collect() if gg == g]
        )
        assert {k[1]: v for k, v in got.items() if k[0] == g} == want


def test_estimate_matches_reference_and_truth(toks):
    est = {
        r["grp"]: r["est"]
        for r in hll_estimate(hll_registers(toks, ["grp"], "tok"), ["grp"]).collect()
    }
    for g in ("g0", "g1"):
        items = [t for (gg, t) in toks.collect() if gg == g]
        assert est[g] == pytest.approx(ref_estimate(ref_registers(items)), abs=1e-5)
        truth = len(set(items))  # 6,000
        # 1.04/sqrt(256) = 6.5% standard error; allow 3 sigma
        assert abs(est[g] - truth) / truth < 0.20


def test_small_range_linear_counting(spark):
    small = spark.createDataFrame(
        [("g", f"t{i}") for i in range(40)], "grp string, tok string"
    )
    (row,) = hll_estimate(hll_registers(small, ["grp"], "tok"), ["grp"]).collect()
    regs = ref_registers([f"t{i}" for i in range(40)])
    assert row["est"] == pytest.approx(ref_estimate(regs), abs=1e-5)
    # linear-counting regime: tight at tiny cardinalities
    assert abs(row["est"] - 40) / 40 < 0.15


def test_merge_equals_one_shot(toks):
    a = hll_registers(toks.where(F.xxhash64("tok") % 2 == 0), ["grp"], "tok")
    b = hll_registers(toks.where(F.xxhash64("tok") % 2 != 0), ["grp"], "tok")
    merged = hll_merge(a, b)
    whole = hll_registers(toks, ["grp"], "tok")
    as_set = lambda df: {tuple(r) for r in df.collect()}  # noqa: E731
    assert as_set(merged) == as_set(whole)


def test_register_shuffle_is_bounded(toks):
    regs = hll_registers(toks, ["grp"], "tok")
    assert regs.count() <= 2 * M  # groups × m, regardless of input rows


# ---------------------------------------------------------------------------
# Count-min sketch
# ---------------------------------------------------------------------------

from collections import Counter

from dedupe_spark.operators.sketches import (  # noqa: E402
    CMS_D,
    CMS_W,
    cms_merge,
    cms_point_estimates,
    cms_sketch,
)


@pytest.fixture(scope="module")
def cms_items(spark):
    # zipf-ish: item i appears 600//(i+1) times — 1,200 rows, 131 distinct
    rows = [(f"item{i}",) for i in range(131) for _ in range(600 // (i + 1))]
    return spark.createDataFrame(rows, "tok string"), Counter(
        t for (t,) in rows
    )


def test_estimate_never_underestimates(cms_items):
    df, truth = cms_items
    sk = cms_sketch(df, "tok")
    probes = df.distinct()
    est = {
        r["tok"]: r["est_cnt"]
        for r in cms_point_estimates(sk, probes, "tok").collect()
    }
    assert set(est) == set(truth)
    for t, n in truth.items():
        assert est[t] >= n  # the one-sided CMS guarantee
    n_stream = sum(truth.values())
    # depth-4 min: overestimate bounded well under e*N/W in practice
    assert all(est[t] - truth[t] <= 3 * n_stream / CMS_W for t in truth)


def test_sketch_size_bounded(cms_items):
    df, _ = cms_items
    assert cms_sketch(df, "tok").count() <= CMS_D * CMS_W


def test_cms_merge_equals_one_shot(cms_items):
    df, _ = cms_items
    a = cms_sketch(df.where(F.xxhash64("tok") % 2 == 0), "tok")
    b = cms_sketch(df.where(F.xxhash64("tok") % 2 != 0), "tok")
    as_map = lambda d: {(r["row"], r["bucket"]): r["cnt"] for r in d.collect()}  # noqa: E731
    assert as_map(cms_merge(a, b)) == as_map(cms_sketch(df, "tok"))


def test_unseen_probe_estimates_small(spark, cms_items):
    df, truth = cms_items
    sk = cms_sketch(df, "tok")
    ghosts = spark.createDataFrame([(f"ghost{i}",) for i in range(50)], "tok string")
    est = {
        r["tok"]: r["est_cnt"]
        for r in cms_point_estimates(sk, ghosts, "tok").collect()
    }
    n_stream = sum(truth.values())
    assert all(v <= 3 * n_stream / CMS_W for v in est.values())


# ---------------------------------------------------------------------------
# Bloom filter
# ---------------------------------------------------------------------------

from dedupe_spark.operators.sketches import (  # noqa: E402
    BLOOM_K,
    BLOOM_M,
    bloom_build,
    bloom_probe,
)


def test_bloom_no_false_negatives(spark):
    members = spark.createDataFrame([(i,) for i in range(2000)], "k long")
    bloom = bloom_build(members, "k")
    flags = {
        r["k"]: r["maybe"] for r in bloom_probe(members, bloom, "k").collect()
    }
    assert all(v == 1 for v in flags.values())


def test_bloom_fp_rate_bounded(spark):
    members = spark.createDataFrame([(i,) for i in range(2000)], "k long")
    bloom = bloom_build(members, "k")
    ghosts = spark.createDataFrame(
        [(i,) for i in range(10**6, 10**6 + 5000)], "k long"
    )
    flags = [r["maybe"] for r in bloom_probe(ghosts, bloom, "k").collect()]
    # ~8k set bits of 65536 -> p_bit ~ 0.115, fp ~ p^4 ~ 1.8e-4;
    # allow a generous factor over the expectation
    assert sum(flags) <= 25


def test_bloom_bit_relation_bounded(spark):
    members = spark.createDataFrame([(i,) for i in range(2000)], "k long")
    n_bits = bloom_build(members, "k").count()
    assert n_bits <= min(BLOOM_M, 2000 * BLOOM_K)


# ---------------------------------------------------------------------------
# HLL grouping-sets rollup
# ---------------------------------------------------------------------------


def test_hll_rollup_grains_equal_direct_sketches(spark):
    from dedupe_spark.queries import q_hll_rollup

    sf = "/root/testdata/sf0.001"
    rows = q_hll_rollup(spark, sf).collect()
    d = spark.read.parquet(f"{sf}/documents.parquet").where(
        F.col("text").isNotNull() & (F.trim(F.col("text")) != "")
    )
    toks = d.select(
        "lang", "source", F.explode(F.split(F.trim("text"), r"\s+")).alias("tok")
    )
    # the rolled-up 'lang' grain must equal a from-scratch per-lang sketch
    # (register merge loses nothing: max is associative)
    direct = {
        r["lang"]: r["est"]
        for r in hll_estimate(hll_registers(toks, ["lang"], "tok"), ["lang"]).collect()
    }
    rolled = {r["lang"]: r["distinct_est"] for r in rows if r["grain"] == "lang"}
    assert rolled == direct
    (g,) = [r["distinct_est"] for r in rows if r["grain"] == "all"]
    (dg,) = hll_estimate(
        hll_registers(toks.select(F.lit("x").alias("g"), "tok"), ["g"], "tok"), ["g"]
    ).collect()
    assert g == dg["est"]


def test_hll_rollup_single_pass_plan(spark):
    from dedupe_spark.queries import q_hll_rollup

    q = q_hll_rollup(spark, "/root/testdata/sf0.001")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan") == 1  # one token pass feeds all grains
    assert plan.count("Expand") == 1  # grouping sets, not three branches


def test_cms_inner_product_bounds(spark):
    from dedupe_spark.operators.sketches import cms_inner_product

    # zipf-ish overlap: key i appears 300//(i+1) times in A, 5x in B
    a = spark.createDataFrame(
        [(f"k{i}",) for i in range(80) for _ in range(300 // (i + 1))], "k string"
    )
    b = spark.createDataFrame(
        [(f"k{i}",) for i in range(40, 120) for _ in range(5)], "k string"
    )
    (est,) = cms_inner_product(cms_sketch(a, "k"), cms_sketch(b, "k")).collect()
    true = a.join(b, "k").count()
    na, nb = a.count(), b.count()
    assert est["est"] >= true  # one-sided, like the point query
    assert est["est"] - true <= 3 * na * nb / CMS_W


def test_cms_inner_product_disjoint_keys(spark):
    from dedupe_spark.operators.sketches import cms_inner_product

    a = spark.createDataFrame([(f"a{i}",) for i in range(200)], "k string")
    b = spark.createDataFrame([(f"b{i}",) for i in range(200)], "k string")
    (est,) = cms_inner_product(cms_sketch(a, "k"), cms_sketch(b, "k")).collect()
    assert est["est"] <= 3 * 200 * 200 / CMS_W  # only collision noise


# ---------------------------------------------------------------------------
# bottom-k (KMV) uniform sample / quantile sketch
# ---------------------------------------------------------------------------


def _kmv_ref(rows, k):
    """Independent selection reference: bottom-k by (md5(str(id)), id)."""
    by_g = {}
    for g, i, v in rows:
        by_g.setdefault(g, []).append((hashlib.md5(str(i).encode()).hexdigest(), i, v))
    out = {}
    for g, lst in by_g.items():
        out[g] = sorted(lst)[:k]
    return {(g, i) for g, lst in out.items() for _, i, _ in lst}


def test_kmv_selection_matches_reference(spark):
    from dedupe_spark.operators.sketches import kmv_sample

    rows = [("a" if i % 3 else "b", i, i * 7 % 101) for i in range(200)]
    df = spark.createDataFrame(rows, "g string, id long, v long")
    got = {(r["g"], r["id"]) for r in kmv_sample(df, ["g"], "id", 10).collect()}
    assert got == _kmv_ref(rows, 10)


def test_kmv_merge_equals_one_shot(spark):
    from dedupe_spark.operators.sketches import kmv_sample

    rows = [("g", i, i) for i in range(300)]
    df = spark.createDataFrame(rows, "g string, id long, v long")
    one = {r["id"] for r in kmv_sample(df, ["g"], "id", 16).collect()}
    # shard → per-shard sketch → union → re-bottom-k
    sh1 = kmv_sample(df.where(F.col("id") % 2 == 0), ["g"], "id", 16)
    sh2 = kmv_sample(df.where(F.col("id") % 2 == 1), ["g"], "id", 16)
    merged = {
        r["id"]
        for r in kmv_sample(sh1.unionByName(sh2), ["g"], "id", 16).collect()
    }
    assert merged == one


def test_kmv_partitioning_invariance_and_small_group(spark):
    from dedupe_spark.operators.sketches import kmv_sample

    rows = [("a", i, i) for i in range(50)] + [("tiny", 900 + i, i) for i in range(3)]
    df = spark.createDataFrame(rows, "g string, id long, v long")
    a = {(r["g"], r["id"]) for r in kmv_sample(df.repartition(7), ["g"], "id", 8).collect()}
    b = {(r["g"], r["id"]) for r in kmv_sample(df.coalesce(1), ["g"], "id", 8, buckets=3).collect()}
    assert a == b
    # a group smaller than k is kept whole
    assert len([1 for g, _ in a if g == "tiny"]) == 3


def test_kmv_quantile_estimate_within_sample_error(spark):
    from dedupe_spark.operators.quantiles import grouped_quantiles_exact
    from dedupe_spark.operators.sketches import kmv_sample

    # v = id over 0..1999: true p-quantile ≈ 2000p; DKW at n=256 gives
    # eps ≈ sqrt(ln(2/δ)/2n) ≈ 0.12 at δ=0.01 — assert a loose 0.15
    rows = [("g", i, i) for i in range(2000)]
    df = spark.createDataFrame(rows, "g string, id long, v long")
    s = kmv_sample(df, ["g"], "id", 256)
    (got,) = grouped_quantiles_exact(
        s, ["g"], "v", [0.25, 0.5, 0.9], ["p25", "p50", "p90"]
    ).collect()
    for p, a in ((0.25, "p25"), (0.5, "p50"), (0.9, "p90")):
        assert abs(got[a] / 2000.0 - p) < 0.15, (p, got[a])


def test_kmv_jaccard_estimate_within_bound(spark):
    """The bottom-k resemblance estimate must sit within the standard
    KMV error envelope of the exact Jaccard carried in the same row
    (binomial std ~ sqrt(J(1-J)/k); 4 sigma + a floor)."""
    import math

    from dedupe_spark.queries import KMV_K, QUERIES

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        r = QUERIES["kmv_crawl_jaccard"](spark, sf).collect()[0]
        assert r["k_used"] == KMV_K
        j = r["jaccard_exact"]
        sigma = math.sqrt(max(j * (1 - j), 1e-4) / r["k_used"])
        assert abs(r["jaccard_est"] - j) <= 4 * sigma + 0.02
        assert 0 < r["inter_exact"] <= r["union_exact"]


def test_k_anonymity_vs_pandas(spark):
    import math

    import pandas as pd

    from dedupe_spark.queries import K_ANON_THRESHOLD, QUERIES

    sf = "/root/testdata/sf0.001"
    rows = {
        (r["c_nationkey"], r["c_mktsegment"], r["bal_bucket"]): r["n_rows"]
        for r in QUERIES["k_anonymity"](spark, sf).collect()
    }
    c = pd.read_parquet(sf + "/customer.parquet")
    c["bal_bucket"] = (
        (c.c_acctbal * 100.0).round().astype("int64")
        .map(lambda v: math.floor(v / 100000.0))
    )
    g = c.groupby(["c_nationkey", "c_mktsegment", "bal_bucket"]).size()
    expect = {k: int(v) for k, v in g.items() if v < K_ANON_THRESHOLD}
    assert rows == expect
    assert len(rows) > 0
