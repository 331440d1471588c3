"""Link-prediction evaluation metrics: Hits@K and MRR.

Reimplementations of the OGB Evaluator formulas the drivers rely on
(NeighborOverlap_large.py:162-179 for Hits@K over K in {20, 50, 100};
NeighborOverlapCitation2.py:248-259 for MRR with 1000 negatives per source).
NumPy host-side: eval score concatenation happens on host exactly as in the
reference (`.cpu()` concat, NeighborOverlap_large.py:121-159).
"""
from __future__ import annotations

import warnings
from typing import Dict, Sequence

import numpy as np


def hits_at_k(pos: np.ndarray, neg: np.ndarray, k: int,
              strict: bool = False) -> float:
    """OGB hits@K: fraction of positives scoring strictly above the K-th best
    negative.

    Fewer than K negatives makes the metric vacuous (every positive "hits").
    The OGB Evaluator raises in that case (the reference relies on it,
    NeighborOverlap_large.py:162-179); here ``strict=True`` raises the same
    way, and the default emits a loud RuntimeWarning and returns 1.0 so tiny
    smoke configs still produce a number — but never silently.
    """
    pos = np.asarray(pos).reshape(-1)
    neg = np.asarray(neg).reshape(-1)
    if neg.shape[0] < k:
        msg = (f"hits@{k} is vacuous: only {neg.shape[0]} negatives "
               f"(< K={k}); every positive counts as a hit")
        if strict:
            raise ValueError(msg)
        warnings.warn(msg, RuntimeWarning, stacklevel=2)
        return 1.0
    kth = np.sort(neg)[-k]
    return float((pos > kth).mean())


def hits_dict(pos: np.ndarray, neg: np.ndarray, ks: Sequence[int] = (20, 50, 100)) -> Dict[str, float]:
    return {f"Hits@{k}": hits_at_k(pos, neg, k) for k in ks}


def mrr(pos: np.ndarray, neg: np.ndarray) -> float:
    """OGB MRR: per positive, rank against its own row of negatives using the
    mean of optimistic and pessimistic ranks (ties averaged)."""
    pos = np.asarray(pos).reshape(-1, 1)
    neg = np.asarray(neg).reshape(pos.shape[0], -1)
    optimistic = (neg > pos).sum(axis=1)
    pessimistic = (neg >= pos).sum(axis=1)
    ranking = 0.5 * (optimistic + pessimistic) + 1.0
    return float((1.0 / ranking).mean())
