"""Broadcast logistic-regression match model.

The reference's ``train()`` fits a regularized logistic regression over
field-distance vectors inside dedupe 3.0.3 (call site
/root/reference/backend/dedupe_script.py:337; SURVEY.md §2.6 M5). Labeled
sets are tiny by construction (≤ a few hundred pairs — the reference gates at
15 labels, its training slice is 400 rows), so training is driver-side numpy;
the learned coefficient vector is *broadcast* to executors and applied inside
the Arrow-batched scoring UDF (operators/scoring.py). No MLlib pipeline is
needed for a <1 KB model — broadcasting the weights keeps scoring a single
narrow mapPartitions with zero extra shuffles.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


def sigmoid(z: np.ndarray) -> np.ndarray:
    out = np.empty_like(z, dtype=np.float64)
    pos = z >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-z[pos]))
    ez = np.exp(z[~pos])
    out[~pos] = ez / (1.0 + ez)
    return out


@dataclass
class LogisticModel:
    """weights over feature columns + intercept; ``feature_names`` fixes the
    column order the scoring UDF must produce."""

    weights: np.ndarray
    intercept: float
    feature_names: list[str] = field(default_factory=list)

    def predict_proba(self, X: np.ndarray) -> np.ndarray:
        return sigmoid(X @ self.weights + self.intercept)

    def to_dict(self) -> dict:
        return {
            "weights": self.weights.tolist(),
            "intercept": float(self.intercept),
            "feature_names": list(self.feature_names),
        }

    @classmethod
    def from_dict(cls, d: dict) -> "LogisticModel":
        return cls(
            weights=np.asarray(d["weights"], dtype=np.float64),
            intercept=float(d["intercept"]),
            feature_names=list(d.get("feature_names", [])),
        )


def fit_logistic(
    X: np.ndarray,
    y: np.ndarray,
    l2: float = 0.1,
    lr: float = 0.5,
    iters: int = 2000,
    feature_names: list[str] | None = None,
    seed: int = 42,
) -> LogisticModel:
    """Full-batch gradient-descent LR with L2 (intercept unpenalized).

    Deterministic; adequate for the ≤400-pair labeled sets this engine (and
    the reference) train on. Feature scaling is unnecessary: all features are
    similarity scores in [0, 1] plus 0/1 missing indicators.
    """
    X = np.asarray(X, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    n, d = X.shape
    if n == 0:
        raise ValueError("no labeled training pairs (after filtering 'u' labels)")
    if y.min() == y.max():
        raise ValueError(
            "training labels are single-class; need both 'y' and 'n' pairs "
            "(the reference UI gates at >=2 of each, page.tsx:368-369)"
        )
    w = np.zeros(d)
    b = 0.0
    for _ in range(iters):
        p = sigmoid(X @ w + b)
        err = p - y
        gw = X.T @ err / n + l2 * w / n
        gb = float(err.mean())
        w -= lr * gw
        b -= lr * gb
    return LogisticModel(w, b, feature_names or [f"f{i}" for i in range(d)])


def uncertainty(scores: np.ndarray) -> np.ndarray:
    """Active-learning uncertainty: distance from the decision boundary
    (reference M3 ``uncertain_pairs()`` — most informative first)."""
    return np.abs(scores - 0.5)
