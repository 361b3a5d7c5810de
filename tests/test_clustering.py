"""Connected-components + confidence tests (FIXTURES.md F6; SURVEY.md M9/M10)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dedupe_spark.operators.clustering import connected_components, member_confidence


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(a, b) for a, b in pairs], "id1 string, id2 string"
    )


def _components(spark, pairs, driver_threshold=200_000):
    rows = connected_components(
        _edges(spark, pairs), driver_threshold=driver_threshold
    ).collect()
    comp: dict[str, str] = {r["record_id"]: r["cluster_id"] for r in rows}
    return comp


def test_driver_and_distributed_paths_agree(spark):
    import random

    rng = random.Random(11)
    nodes = [f"n{i:03d}" for i in range(60)]
    pairs = [tuple(sorted(rng.sample(nodes, 2))) for _ in range(70)]
    fast = _components(spark, pairs)                      # driver union-find
    dist = _components(spark, pairs, driver_threshold=0)  # large/small-star
    assert fast == dist


def test_chain(spark):
    comp = _components(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    assert comp == {"a": "a", "b": "a", "c": "a", "d": "a"}


def test_star(spark):
    comp = _components(spark, [("m", "a"), ("m", "b"), ("m", "c")])
    assert set(comp.values()) == {"a"}
    assert set(comp) == {"a", "b", "c", "m"}


def test_two_components(spark):
    comp = _components(spark, [("a", "b"), ("c", "d")])
    assert comp["a"] == comp["b"] == "a"
    assert comp["c"] == comp["d"] == "c"
    assert comp["a"] != comp["c"]


def test_long_path_converges(spark):
    n = 40
    pairs = [(f"n{i:03d}", f"n{i + 1:03d}") for i in range(n)]
    comp = _components(spark, pairs)
    assert set(comp.values()) == {"n000"}
    assert len(comp) == n + 1


def test_label_is_min_id(spark):
    comp = _components(spark, [("z", "m"), ("m", "q"), ("b", "q")])
    assert set(comp.values()) == {"b"}


def test_duplicate_and_reversed_edges(spark):
    comp = _components(
        spark, [("a", "b"), ("b", "a"), ("a", "b"), ("b", "c"), ("c", "b")]
    )
    assert comp == {"a": "a", "b": "a", "c": "a"}


def test_singleton_nodes_not_emitted(spark):
    """Nodes appear only via edges; callers handle singletons (reference
    drops size-1 groups, dedupe_script.py:364)."""
    comp = _components(spark, [("a", "b")])
    assert set(comp) == {"a", "b"}


def test_idempotent_relabel(spark):
    """Feeding (record_id, cluster_id) back as edges is a fixpoint."""
    pairs = [("a", "b"), ("b", "c"), ("x", "y")]
    first = _components(spark, pairs)
    again = _components(spark, list(first.items()))
    assert again == first


def test_member_confidence(spark):
    edges = spark.createDataFrame(
        [("a", "b", 0.8), ("b", "c", 0.6)], "id1 string, id2 string, score double"
    )
    assign = connected_components(edges.select("id1", "id2"))
    conf = {
        r["record_id"]: r["confidence"]
        for r in member_confidence(assign, edges).collect()
    }
    # a: one edge 0.8 -> 1 - sqrt(mean((1-.8)^2)) = 0.8
    assert conf["a"] == pytest.approx(0.8)
    # b: edges 0.8, 0.6 -> 1 - sqrt((0.04+0.16)/2)
    assert conf["b"] == pytest.approx(1 - (0.1) ** 0.5)
    assert conf["c"] == pytest.approx(0.6)
