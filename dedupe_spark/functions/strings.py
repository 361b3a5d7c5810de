"""String-similarity kernels for pairwise scoring.

The reference delegates these to dedupe 3.0.3's C comparators
(call site /root/reference/backend/dedupe_script.py:266-290 — String =
normalized affine-gap edit distance, Text = corpus-weighted token cosine;
SURVEY.md §2.6 M1). Here they are pure-Python/numpy kernels designed to run
inside Arrow-batched pandas UDFs: one Python call per ~10k-row batch, no
per-row Spark UDF overhead. Jaro-Winkler and Levenshtein are verified
against DuckDB's built-ins in tests/test_strings.py so the same math can be
used in DuckDB oracle SQL.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd

# ---------------------------------------------------------------------------
# Jaro / Jaro-Winkler (DuckDB-compatible: boost threshold 0.7, prefix<=4)
# ---------------------------------------------------------------------------


def jaro(a: str, b: str) -> float:
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0.0  # incl. both-empty — matches DuckDB jaro_winkler_similarity
    window = max(la, lb) // 2 - 1
    if window < 0:
        window = 0
    a_flags = [False] * la
    b_flags = [False] * lb
    matches = 0
    for i, ca in enumerate(a):
        lo = max(0, i - window)
        hi = min(lb, i + window + 1)
        for j in range(lo, hi):
            if not b_flags[j] and b[j] == ca:
                a_flags[i] = True
                b_flags[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    transpositions = 0
    j = 0
    for i in range(la):
        if a_flags[i]:
            while not b_flags[j]:
                j += 1
            if a[i] != b[j]:
                transpositions += 1
            j += 1
    t = transpositions // 2
    m = float(matches)
    return (m / la + m / lb + (m - t) / m) / 3.0


def jaro_winkler(a: str, b: str, prefix_weight: float = 0.1, boost_threshold: float = 0.7) -> float:
    """Jaro-Winkler similarity; prefix boost applied only above the
    threshold, common prefix capped at 4 (matches DuckDB / classic Winkler).
    """
    j = jaro(a, b)
    if j <= boost_threshold:
        return j
    prefix = 0
    for ca, cb in zip(a[:4], b[:4]):
        if ca == cb:
            prefix += 1
        else:
            break
    return j + prefix * prefix_weight * (1.0 - j)


# ---------------------------------------------------------------------------
# Levenshtein (unit costs — matches DuckDB levenshtein())
# ---------------------------------------------------------------------------


def levenshtein(a: str, b: str) -> int:
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if la == 0:
        return lb
    if lb == 0:
        return la
    if la > lb:  # ensure b is the longer (smaller row)
        a, b, la, lb = b, a, lb, la
    prev = list(range(la + 1))
    cur = [0] * (la + 1)
    for j in range(1, lb + 1):
        cur[0] = j
        cb = b[j - 1]
        for i in range(1, la + 1):
            cost = 0 if a[i - 1] == cb else 1
            x = prev[i] + 1
            y = cur[i - 1] + 1
            z = prev[i - 1] + cost
            cur[i] = x if x < y else y
            if z < cur[i]:
                cur[i] = z
        prev, cur = cur, prev
    return prev[la]


def levenshtein_sim(a: str, b: str) -> float:
    """1 - lev/max(len); 1.0 for two empty strings."""
    m = max(len(a), len(b))
    if m == 0:
        return 1.0
    return 1.0 - levenshtein(a, b) / m


# ---------------------------------------------------------------------------
# Token-set similarities (dedupe 'Text' comparator stand-in)
# ---------------------------------------------------------------------------


def token_cosine(a: str, b: str) -> float:
    """Cosine over token count vectors (unweighted; corpus-free)."""
    ta, tb = a.split(), b.split()
    if not ta or not tb:
        return 0.0
    ca: dict[str, int] = {}
    cb: dict[str, int] = {}
    for t in ta:
        ca[t] = ca.get(t, 0) + 1
    for t in tb:
        cb[t] = cb.get(t, 0) + 1
    dot = sum(v * cb.get(k, 0) for k, v in ca.items())
    if dot == 0:
        return 0.0
    na = sum(v * v for v in ca.values()) ** 0.5
    nb = sum(v * v for v in cb.values()) ** 0.5
    return dot / (na * nb)


def ngram_set(s: str, n: int = 3) -> set[str]:
    if len(s) < n:
        return {s} if s else set()
    return {s[i : i + n] for i in range(len(s) - n + 1)}


def ngram_jaccard(a: str, b: str, n: int = 3) -> float:
    sa, sb = ngram_set(a, n), ngram_set(b, n)
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    inter = len(sa & sb)
    return inter / (len(sa) + len(sb) - inter)


# ---------------------------------------------------------------------------
# Batch wrappers (pandas Series in -> float64 ndarray out)
# ---------------------------------------------------------------------------


def _pairs(s1: pd.Series, s2: pd.Series):
    a = s1.fillna("").to_numpy(dtype=object)
    b = s2.fillna("").to_numpy(dtype=object)
    return a, b


def jw_batch(s1: pd.Series, s2: pd.Series) -> np.ndarray:
    a, b = _pairs(s1, s2)
    return np.fromiter((jaro_winkler(x, y) for x, y in zip(a, b)), dtype=np.float64, count=len(a))


def lev_sim_batch(s1: pd.Series, s2: pd.Series) -> np.ndarray:
    a, b = _pairs(s1, s2)
    return np.fromiter((levenshtein_sim(x, y) for x, y in zip(a, b)), dtype=np.float64, count=len(a))


def token_cosine_batch(s1: pd.Series, s2: pd.Series) -> np.ndarray:
    a, b = _pairs(s1, s2)
    return np.fromiter((token_cosine(x, y) for x, y in zip(a, b)), dtype=np.float64, count=len(a))


def ngram_jaccard_batch(s1: pd.Series, s2: pd.Series, n: int = 3) -> np.ndarray:
    a, b = _pairs(s1, s2)
    return np.fromiter(
        (ngram_jaccard(x, y, n) for x, y in zip(a, b)), dtype=np.float64, count=len(a)
    )


# ---------------------------------------------------------------------------
# Hashing kernels: shingles, minhash, simhash (deterministic across workers)
# ---------------------------------------------------------------------------

_MERSENNE = (1 << 61) - 1
_MAXH = np.uint64((1 << 32) - 1)


def _hash32(s: str) -> int:
    """Deterministic 32-bit hash (zlib.crc32 is C-fast and seed-free)."""
    return zlib.crc32(s.encode("utf-8", "surrogatepass"))


def _hash64(s: str) -> int:
    data = s.encode("utf-8", "surrogatepass")
    return (zlib.crc32(data) << 32) | zlib.crc32(data, 0x9E3779B9)


def char_shingles(s: str, k: int = 5) -> list[str]:
    if len(s) <= k:
        return [s] if s else []
    return [s[i : i + k] for i in range(len(s) - k + 1)]


def word_shingles(s: str, k: int = 3) -> list[str]:
    toks = s.split()
    if len(toks) <= k:
        return [" ".join(toks)] if toks else []
    return [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]


def minhash_params(num_perm: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signature(
    shingles: list[str], a: np.ndarray, b: np.ndarray
) -> np.ndarray:
    """num_perm-length uint64 signature via (a*h + b) mod mersenne61.

    Vectorized: (num_perm, n_shingles) broadcast, min along shingle axis.
    Empty shingle set -> all-max sentinel signature.
    """
    if not shingles:
        return np.full(len(a), np.uint64(_MERSENNE), dtype=np.uint64)
    h = np.fromiter((_hash32(s) for s in shingles), dtype=np.uint64, count=len(shingles))
    # (num_perm, 1) * (n,) mod p — python-int free, stays in uint64 with mod
    prod = (a[:, None] * h[None, :] + b[:, None]) % np.uint64(_MERSENNE)
    return prod.min(axis=1)


def band_keys(sig: np.ndarray, bands: int, rows: int) -> list[int]:
    """LSH band bucket keys: hash each (band of `rows` sig values) to int64."""
    assert bands * rows <= len(sig)
    out = []
    for bi in range(bands):
        chunk = sig[bi * rows : (bi + 1) * rows]
        acc = np.uint64(1469598103934665603)  # FNV offset
        for v in chunk:
            acc = np.uint64((int(acc) ^ int(v)) * 1099511628211 & ((1 << 64) - 1))
        # fold band index in so bands never collide across band positions
        out.append(int((int(acc) ^ (bi << 56)) & ((1 << 63) - 1)))
    return out


def simhash64(tokens: list[str]) -> int:
    """64-bit SimHash over tokens (unit weights)."""
    if not tokens:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    for t in tokens:
        h = _hash64(t)
        bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        acc += np.where(bits.astype(bool), 1, -1)
    bits = (acc > 0).astype(np.uint64)
    return int((bits << np.arange(64, dtype=np.uint64)).sum(dtype=np.uint64))


def hamming64(x: int, y: int) -> int:
    return bin(x ^ y).count("1")
