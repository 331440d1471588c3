"""Link-prediction loss catalog.

`simple` is the default training loss of every OCN driver
(-logsigmoid(pos) - logsigmoid(-neg), NeighborOverlap_large.py:84-88); the
ranking alternatives replicate PLNLP.py:28-86 and are dispatched by name like
`--losstrick` (PLNLP.py:155-191).  All functions take raw scores.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def simple_loss(pos: jax.Array, neg: jax.Array) -> jax.Array:
    """-logsigmoid(pos).mean() - logsigmoid(-neg).mean()
    (NeighborOverlap_large.py:84-88)."""
    return -jnp.mean(jax.nn.log_sigmoid(pos)) - jnp.mean(jax.nn.log_sigmoid(-neg))


def auc_loss(pos, neg, num_neg: int = 1):
    """(1 - (pos - neg))^2 summed (PLNLP.py:28-32)."""
    pos = pos.reshape(-1, 1)
    neg = neg.reshape(-1, num_neg)
    return jnp.sum(jnp.square(1.0 - (pos - neg)))


def hinge_auc_loss(pos, neg, num_neg: int = 1):
    """clamp(1 - (pos - neg), min=0)^2 summed (PLNLP.py:35-38)."""
    pos = pos.reshape(-1, 1)
    neg = neg.reshape(-1, num_neg)
    return jnp.sum(jnp.square(jnp.maximum(1.0 - (pos - neg), 0.0)))


def weighted_auc_loss(pos, neg, num_neg: int = 1, weight=1.0):
    """weight * (1 - (pos - neg))^2 summed (PLNLP.py:41-45)."""
    pos = pos.reshape(-1, 1)
    neg = neg.reshape(-1, num_neg)
    w = jnp.broadcast_to(jnp.asarray(weight), pos.shape)
    return jnp.sum(w * jnp.square(1.0 - (pos - neg)))


def adaptive_auc_loss(pos, neg, num_neg: int = 1, margin=1.0):
    """(margin - (pos - neg))^2 summed (PLNLP.py:48-52)."""
    pos = pos.reshape(-1, 1)
    neg = neg.reshape(-1, num_neg)
    m = jnp.broadcast_to(jnp.asarray(margin), pos.shape)
    return jnp.sum(jnp.square(m - (pos - neg)))


def weighted_hinge_auc_loss(pos, neg, num_neg: int = 1, weight=1.0):
    """weight * clamp(weight - (pos - neg), 0)^2 summed (PLNLP.py:55-59 —
    the reference reuses `weight` as the margin; preserved)."""
    pos = pos.reshape(-1, 1)
    neg = neg.reshape(-1, num_neg)
    w = jnp.broadcast_to(jnp.asarray(weight), pos.shape)
    return jnp.sum(w * jnp.square(jnp.maximum(w - (pos - neg), 0.0)))


def adaptive_hinge_auc_loss(pos, neg, num_neg: int = 1, weight=1.0):
    """clamp(weight - (pos - neg), 0)^2 summed (PLNLP.py:62-66)."""
    pos = pos.reshape(-1, 1)
    neg = neg.reshape(-1, num_neg)
    w = jnp.broadcast_to(jnp.asarray(weight), pos.shape)
    return jnp.sum(jnp.square(jnp.maximum(w - (pos - neg), 0.0)))


def log_rank_loss(pos, neg, num_neg: int = 1):
    """-log(sigmoid(pos - neg) + 1e-15).mean() (PLNLP.py:69-72)."""
    pos = pos.reshape(-1, 1)
    neg = neg.reshape(-1, num_neg)
    return -jnp.mean(jnp.log(jax.nn.sigmoid(pos - neg) + 1e-15))


def ce_loss(pos, neg, num_neg: int = 1):
    """binary CE with the reference's epsilon (PLNLP.py:75-78)."""
    p = -jnp.mean(jnp.log(jax.nn.sigmoid(pos) + 1e-15))
    n = -jnp.mean(jnp.log(1.0 - jax.nn.sigmoid(neg) + 1e-15))
    return p + n


def info_nce_loss(pos, neg, num_neg: int = 1):
    """-log(e^pos / (e^pos + sum e^neg)) (PLNLP.py:81-86)."""
    pos = pos.reshape(-1, 1)
    neg = neg.reshape(-1, num_neg)
    pe = jnp.exp(pos)
    ne = jnp.sum(jnp.exp(neg), axis=1, keepdims=True)
    return -jnp.mean(jnp.log(pe / (pe + ne) + 1e-15))


LOSSES = {
    "simple": lambda p, n, **kw: simple_loss(p, n),
    "auc_loss": lambda p, n, **kw: auc_loss(p, n, kw.get("num_neg", 1)),
    "hinge_auc_loss": lambda p, n, **kw: hinge_auc_loss(p, n, kw.get("num_neg", 1)),
    "weighted_auc_loss": lambda p, n, **kw: weighted_auc_loss(
        p, n, kw.get("num_neg", 1), kw.get("weight", 1.0)),
    "adaptive_auc_loss": lambda p, n, **kw: adaptive_auc_loss(
        p, n, kw.get("num_neg", 1), kw.get("margin", 1.0)),
    "weighted_hinge_auc_loss": lambda p, n, **kw: weighted_hinge_auc_loss(
        p, n, kw.get("num_neg", 1), kw.get("weight", 1.0)),
    "adaptive_hinge_auc_loss": lambda p, n, **kw: adaptive_hinge_auc_loss(
        p, n, kw.get("num_neg", 1), kw.get("weight", 1.0)),
    "log_rank_loss": lambda p, n, **kw: log_rank_loss(p, n, kw.get("num_neg", 1)),
    "ce_loss": lambda p, n, **kw: ce_loss(p, n),
    "info_nce_loss": lambda p, n, **kw: info_nce_loss(p, n, kw.get("num_neg", 1)),
}
