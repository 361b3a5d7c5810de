"""Average-linkage agglomeration kernel — LIGHT module (numpy only).

Runs inside the ``refine_components`` grouped-map UDF (one call per
connected component), so it must be fast for components up to
``max_component`` nodes and must not drag pyspark into the worker's
import graph (see functions/features.py for the cold-start rationale).

Semantics mirror the reference's within-component hierarchical step
(SURVEY.md §2.6 M9; dedupe 3.0.3 ``partition()`` call site
/root/reference/backend/dedupe_script.py:360): pairwise distance
1 - score (unscored pairs = 1.0), average linkage, cut at cophenetic
distance ``cut``. Deterministic: among equal-distance merges the pair
with the smallest (row, col) index wins — identical ordering to a
lexicographic scan of the upper triangle.

Complexity: one vectorized ``np.argmin`` over the n×n distance matrix per
merge — O(n²) per merge, O(n³) memory-bandwidth-bound total, which for the
default ``max_component=2000`` completes in seconds (vs the previous
interpreted nested-loop search, which was O(n³) in *Python operations*
per merge and effectively never finished; VERDICT r01 "What's wrong" #2).
"""

from __future__ import annotations

import numpy as np


def agglomerate(
    n: int,
    edges: list[tuple[int, int, float]],
    cut: float,
) -> list[int]:
    """Average-linkage clustering of ``n`` items with scored edges.

    ``edges`` are (i, j, distance) triples over item indices 0..n-1;
    missing pairs default to distance 1.0. Merging stops when the closest
    active pair exceeds ``cut``. Returns a label per item: the min item
    index of its cluster.
    """
    if n < 2:
        return list(range(n))
    dist = np.ones((n, n), dtype=np.float64)
    for i, j, d in edges:
        dist[i, j] = dist[j, i] = d
    # inactive rows/cols and the diagonal are masked to +inf so one flat
    # argmin finds the closest active (i < j) pair; for a symmetric matrix
    # the first row-major occurrence of the min is its upper-triangle cell
    np.fill_diagonal(dist, np.inf)
    sizes = np.ones(n, dtype=np.int64)
    members: dict[int, list[int]] = {i: [i] for i in range(n)}
    for _ in range(n - 1):
        flat = int(np.argmin(dist))
        i, j = divmod(flat, n)
        best = dist[i, j]
        if not np.isfinite(best) or best > cut:
            break
        na, nb = sizes[i], sizes[j]
        new = (dist[i, :] * na + dist[j, :] * nb) / (na + nb)
        dist[i, :] = new
        dist[:, i] = new
        dist[i, i] = np.inf
        dist[j, :] = np.inf
        dist[:, j] = np.inf
        sizes[i] += sizes[j]
        members[i].extend(members[j])
        del members[j]
    labels = [0] * n
    for rep, mem in members.items():
        label = min(mem)
        for m in mem:
            labels[m] = label
    return labels
