"""Measured baseline anchor: the REFERENCE's cn5 training step in torch CPU.

VERDICT r1 item 6: bench.py's vs_baseline divides by an ESTIMATED 60k
edges/s A100 figure.  No CUDA/A100 exists in this image, so this script pins
the one number that CAN be measured here: the reference's own algorithms
(qingpingmo/OCN NeighborOverlap_large.py collab cn5 config) implemented in
pure torch + scipy on CPU, at matched graph scale, against ocn_tpu on the
same CPU and on the TPU.

Faithfulness notes (all choices FAVOR the reference, making the comparison
conservative):
* maskinput is value-masking (cheap) instead of the reference's per-batch
  SparseTensor rebuild + to_symmetric + coalesce (NeighborOverlap_large.py:56-63);
* adj2 = spadj @ spadj runs per batch via scipy.sparse (C SpGEMM), matching
  the reference's per-batch cuSPARSE call (:74);
* adjoverlap uses the reference's own packed-key searchsorted intersection
  (utils.py:146-183) on CSR row gathers — vectorized torch, no Python loops;
* the cn5 pipeline (quirk colnorm -> EMA inner product -> union-pattern
  Gram-Schmidt -> plain renorm -> spmm_add aggregation, model.py:2252-2440)
  runs in COO form with torch index_add (the same scatter-add torch_sparse's
  CPU spmm uses);
* encoder: 3-layer GCNConv-style (Linear -> D^-1/2(A+I)D^-1/2) with LN,
  residual, JK — the collab preset's shape;
* full backward + 2-group Adam per step, exactly one encoder pass per batch.

Run:  python -u scripts/bench_reference_torch.py           (scale 0.25)
Env:  R_SCALE, R_BATCH, R_STEPS.
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import torch
import scipy.sparse as sp

from ocn_tpu.data.loaders import synthetic_dataset
from ocn_tpu.sparse import build as B


def packed(r, c, n):
    return r.to(torch.int64) * n + c.to(torch.int64)


def row_gather(indptr, col, val, nodes):
    """torch_sparse adj[nodes] row slicing (utils.py:256-257): returns COO
    (row_idx, col_ids, vals) of the gathered rows, vectorized."""
    start = indptr[nodes]
    cnt = indptr[nodes + 1] - start
    total = int(cnt.sum())
    if total == 0:
        z = torch.zeros(0, dtype=torch.int64)
        return z, z, torch.zeros(0)
    ends = torch.cumsum(cnt, 0)
    local = torch.arange(total) - torch.repeat_interleave(ends - cnt, cnt)
    pos = torch.repeat_interleave(start, cnt) + local
    rows = torch.repeat_interleave(torch.arange(nodes.shape[0]), cnt)
    return rows, col[pos].to(torch.int64), val[pos]


def spmoverlap(r1, c1, v1, r2, c2, v2, n):
    """Reference spmoverlap_ (utils.py:163-183): packed-key searchsorted
    intersection; returns entries of (r1, c1) present in (r2, c2) with the
    Hadamard product v1*v2 at the matching positions (spsphadamard)."""
    k1 = packed(r1, c1, n)
    k2, order2 = torch.sort(packed(r2, c2, n))
    idx = torch.searchsorted(k2, k1)
    idx = torch.clamp(idx, max=max(k2.shape[0] - 1, 0))
    hit = (k2[idx] == k1) if k2.shape[0] else torch.zeros_like(k1, dtype=torch.bool)
    v2s = v2[order2] if k2.shape[0] else v2
    return r1[hit], c1[hit], v1[hit] * v2s[idx[hit]]


class Mlp(torch.nn.Module):
    def __init__(self, h, layers=3, ln=True):
        super().__init__()
        mods = []
        for i in range(layers):
            mods.append(torch.nn.Linear(h, h))
            if ln:
                mods.append(torch.nn.LayerNorm(h))
            if i < layers - 1:
                mods.append(torch.nn.ReLU())
        self.net = torch.nn.Sequential(*mods)

    def forward(self, x):
        return self.net(x)


class RefCn5Step(torch.nn.Module):
    """Reference collab cn5 step: GCN encoder + adjoverlap + OCN predictor."""

    def __init__(self, n, feat, h=256, layers=3):
        super().__init__()
        self.n, self.h = n, h
        self.enc_lin = torch.nn.ModuleList(
            [torch.nn.Linear(feat if i == 0 else h, h) for i in range(layers)])
        self.enc_ln = torch.nn.ModuleList(
            [torch.nn.LayerNorm(h) for _ in range(layers)])
        self.jk = torch.nn.Parameter(torch.randn(layers))
        self.xcn1lin = Mlp(h)
        self.xcn2lin = Mlp(h)
        self.xijlin = Mlp(h, layers=2)
        self.head = torch.nn.Sequential(
            torch.nn.Linear(h, h), torch.nn.ReLU(), torch.nn.Linear(h, 1))
        self.alpha = torch.nn.Parameter(torch.ones(3))
        self.beta = torch.nn.Parameter(torch.ones(1))
        self.register_buffer("innerprod", torch.zeros(()))
        self.nstep = 0

    def encode(self, x, indptr, col, val, deg_norm, row_coo):
        outs = []
        for lin, ln in zip(self.enc_lin, self.enc_ln):
            xw = lin(x)
            # D^-1/2 (A + I) D^-1/2 propagation via scatter-add (the CPU
            # path under torch_sparse spmm_add)
            xn = xw * deg_norm
            agg = torch.zeros_like(xn)
            agg.index_add_(0, row_coo, xn[col.to(torch.int64)] * val[:, None])
            x1 = (agg + xn) * deg_norm
            x1 = torch.relu(ln(x1))
            x = x1 + x if x1.shape == x.shape else x1
            outs.append(x)
        return sum(w * o for w, o in zip(self.jk, outs))

    def cn5(self, h, cn1, cn2, tar_ei, b):
        def colnorm_quirk(r, c, v):
            cs = torch.zeros(self.n)
            cs.index_add_(0, c, v)
            cs = torch.where(cs == 0, torch.ones_like(cs), cs)
            inv = 1.0 / cs
            inv = torch.where(cs != 1, inv, torch.zeros_like(inv))
            return v * inv[c]

        r1, c1, v1 = cn1
        r2, c2, v2 = cn2
        nv1 = colnorm_quirk(r1, c1, v1)
        # EMA inner product over the union pattern (model.py:2238-2250)
        if self.training:
            self.nstep += 1
            beta = 1.0 / self.nstep
            inner = (spmoverlap(r2, c2, v2 * 0 + v2, r1, c1, nv1, self.n)[2]).sum()
            with torch.no_grad():
                self.innerprod.mul_(1 - beta).add_(beta * inner.detach())
        nip = self.innerprod / nv1.abs().max().clamp_min(1e-30)
        # Gram-Schmidt on the union pattern + plain renorm
        ru = torch.cat([r2, r1])
        cu = torch.cat([c2, c1])
        vu = torch.cat([v2, -nip * nv1])
        cs = torch.zeros(self.n)
        cs.index_add_(0, cu, vu)
        cs = torch.where(cs == 0, torch.ones_like(cs), cs)
        vo = vu / cs[cu]
        # xcn = spmm_add(cn, h)
        xcn1 = torch.zeros(b, self.h)
        xcn1.index_add_(0, r1, nv1[:, None] * h[c1])
        xcn2 = torch.zeros(b, self.h)
        xcn2.index_add_(0, ru, vo[:, None] * h[cu])
        xij = self.xijlin(h[tar_ei[0]] * h[tar_ei[1]])
        a = torch.sigmoid(self.alpha).cumprod(-1)
        z = a[0] * self.xcn1lin(xcn1) + a[1] * self.xcn2lin(xcn2) + self.beta * xij
        return self.head(z)


def main():
    scale = float(os.environ.get("R_SCALE", "0.25"))
    batch = int(os.environ.get("R_BATCH", "16384"))
    steps = int(os.environ.get("R_STEPS", "3"))
    torch.manual_seed(0)

    ds = synthetic_dataset("collab", seed=0, scale=scale)
    n = ds.n_nodes
    indptr_np, col_np = B.csr_from_edge_index(ds.edge_index, n)
    indptr = torch.tensor(np.asarray(indptr_np, np.int64))
    col = torch.tensor(np.asarray(col_np, np.int64))
    val = torch.ones(col.shape[0])
    deg = (indptr[1:] - indptr[:-1]).float()
    deg_norm = torch.rsqrt(1.0 + deg)[:, None]
    row_coo = torch.repeat_interleave(torch.arange(n), (indptr[1:] - indptr[:-1]))
    x = torch.tensor(ds.x[:, :128].astype(np.float32))
    sp_adj = sp.csr_matrix(
        (np.ones(col.shape[0], np.float32), np.asarray(col_np),
         np.asarray(indptr_np)), shape=(n, n))

    model = RefCn5Step(n, x.shape[1])
    model.train()
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)
    pos_all = torch.tensor(np.asarray(ds.split_edge["train"]["edge"]).T)
    rng = np.random.default_rng(0)

    def step():
        idx = torch.tensor(rng.integers(0, pos_all.shape[1], batch))
        tar = pos_all[:, idx]
        neg = torch.tensor(rng.integers(0, n, size=(2, batch)))
        # per-batch A^2 SpGEMM (reference NeighborOverlap_large.py:74)
        adj2 = sp_adj @ sp_adj
        ip2 = torch.tensor(adj2.indptr.astype(np.int64))
        c2 = torch.tensor(adj2.indices.astype(np.int64))
        v2 = torch.tensor(adj2.data.astype(np.float32))

        h = model.encode(x, indptr, col, val, deg_norm, row_coo)

        def score(ei):
            b = ei.shape[1]
            # adjoverlap(adj, adj, ei) and adjoverlap(adj, adj2, ei)
            ri, ci, vi = row_gather(indptr, col, val, ei[0])
            rj, cj, vj = row_gather(indptr, col, val, ei[1])
            cn1 = spmoverlap(ri, ci, vi, rj, cj, vj, n)
            rj2, cj2, vj2 = row_gather(ip2, c2, v2, ei[1])
            cn2 = spmoverlap(ri, ci, vi, rj2, cj2, vj2, n)
            return model.cn5(h, cn1, cn2, ei, b).flatten()

        pos_out = score(tar)
        neg_out = score(neg)
        loss = -torch.nn.functional.logsigmoid(pos_out).mean() \
               - torch.nn.functional.logsigmoid(-neg_out).mean()
        opt.zero_grad()
        loss.backward()
        opt.step()
        return float(loss)

    step()  # warmup
    t0 = time.perf_counter()
    for _ in range(steps):
        step()
    dt = (time.perf_counter() - t0) / steps
    eps = 2 * batch / dt
    print(f"reference-math torch CPU: N={n} batch={batch} "
          f"{dt*1e3:.0f} ms/step -> {eps:.0f} edges/s", flush=True)


if __name__ == "__main__":
    main()
