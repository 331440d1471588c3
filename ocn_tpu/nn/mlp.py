"""Predictor MLP vocabulary (flax linen).

The reference predictors share a fixed set of torch Sequential blocks
(xcnlin / xcn1lin / xcn2lin / xijlin / lin / xlin; e.g. model.py:2192-2235 for
cn5).  `nnlayers` is accepted for CLI parity but — exactly as in the
reference, whose constructors take `num_layers` and never read it — does not
change these architectures.

Dropout follows torch semantics (train-time scaling by 1/(1-p)), which is also
flax's default; `deterministic` is a call-time argument so train/eval share
parameters.  LayerNorm uses torch's default eps (1e-5).
"""
from __future__ import annotations

import flax.linen as nn


class CNAggMLP(nn.Module):
    """xcnlin / xcn1lin / xcn2lin / xcn4lin (model.py:2197-2220):
    Linear(in,h), Dropout, ReLU, Linear(h,h), LN?, Dropout, ReLU,
    [Linear(h,h) unless tail_identity]."""

    hidden: int
    dropout: float
    ln: bool
    tail_identity: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Dense(self.hidden)(x)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        x = nn.relu(x)
        x = nn.Dense(self.hidden)(x)
        if self.ln:
            x = nn.LayerNorm(epsilon=1e-5)(x)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        x = nn.relu(x)
        if not self.tail_identity:
            x = nn.Dense(self.hidden)(x)
        return x


class XijMLP(nn.Module):
    """xijlin (model.py:2223-2226): Linear(in,h), LN?, Dropout, ReLU,
    [Linear(h,h) unless tail_identity]."""

    hidden: int
    dropout: float
    ln: bool
    tail_identity: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Dense(self.hidden)(x)
        if self.ln:
            x = nn.LayerNorm(epsilon=1e-5)(x)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        x = nn.relu(x)
        if not self.tail_identity:
            x = nn.Dense(self.hidden)(x)
        return x


class HeadMLP(nn.Module):
    """lin (model.py:2227-2235): Linear(h,h), LN?, Dropout, ReLU,
    [second block if twolayer], Linear(h,out)."""

    hidden: int
    out: int
    dropout: float
    ln: bool
    twolayer: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        for _ in range(2 if self.twolayer else 1):
            x = nn.Dense(self.hidden)(x)
            if self.ln:
                x = nn.LayerNorm(epsilon=1e-5)(x)
            x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
            x = nn.relu(x)
        return nn.Dense(self.out)(x)


class XLin(nn.Module):
    """xlin (model.py:2192-2195, gated by use_xlin): Linear, Dropout, ReLU,
    Linear, LN?, Dropout, ReLU."""

    hidden: int
    dropout: float
    ln: bool

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Dense(self.hidden)(x)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        x = nn.relu(x)
        x = nn.Dense(self.hidden)(x)
        if self.ln:
            x = nn.LayerNorm(epsilon=1e-5)(x)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return nn.relu(x)
