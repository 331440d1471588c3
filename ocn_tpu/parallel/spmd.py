"""Explicit SPMD training step via shard_map (edge-partitioned DP).

Two multi-chip paths exist in ocn_tpu:

* the GSPMD path (train/loop.py + parallel/mesh.py): jit with sharding
  annotations; XLA chooses the collectives.  Zero code intrusion, good
  default.
* this module: an explicit `shard_map` step — each device owns a shard of
  the link batch (the workload's scaling axis, SURVEY.md §2.7), computes
  local gradients with the exact same loss as the single-chip path, and the
  gradients/loss are combined with `jax.lax.pmean` over the "dp" axis before
  a replicated optimizer update.  This is the transparent, hand-auditable
  formulation (collectives visible in code) and the base for pod-scale
  variants where the graph itself is partitioned.

Graph + features are replicated (they fit HBM for every OCN dataset: the
largest, citation2, is ~3M nodes x 128 dims ~ 1.5 GB bf16).  The EMA state is
updated from device-local batches and pmean'd — equivalent in expectation to
the reference's sequential updates.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ocn_tpu.train.loop import TrainState, Trainer
from ocn_tpu.train import losses as L


def make_spmd_train_step(tr: Trainer, mesh: Mesh):
    """Build a shard_map'ed train step for ``tr`` over mesh axis "dp".

    Returns step(state, pos, neg, mask_positions, key) -> (state, loss) where
    pos/neg are (2, B) with B divisible by the dp size.
    """
    cfg = tr.cfg
    tx = tr._make_tx()
    ndp = mesh.shape["dp"]

    def local_loss(params, ema, sched, g, pos, neg, key):
        c = tr._chunk() // 1
        b = pos.shape[1]
        c = min(c, b)
        nchunk = b // c
        posc = pos.reshape(2, nchunk, c).transpose(1, 0, 2)
        negc = neg.reshape(2, nchunk, c).transpose(1, 0, 2)
        allc = jnp.concatenate([posc, negc], axis=0)
        validc = jnp.ones((2 * nchunk, c), tr.dtype)
        k_enc, k_lnk = jax.random.split(key)
        h = tr.encoder.apply(
            {"params": params["encoder"]}, tr.x, g, True,
            rngs={"dropout": k_enc},
        )
        corrs = None
        if cfg.maskinput and tr.adj2 is not None:
            corrs = jnp.concatenate(
                [jnp.ones((nchunk, c), tr.dtype),
                 jnp.zeros((nchunk, c), tr.dtype)], axis=0)
        out, ema2 = tr._scan_scores(
            params, ema, sched, h, g, allc, validc, k_lnk, True,
            adj2=tr.adj2, corrs=corrs)
        loss = L.LOSSES[cfg.losstrick](
            out[:b], out[b:], num_neg=1,
            weight=cfg.lossweight, margin=cfg.lossmargin)
        return loss, ema2

    @partial(
        jax.shard_map,
        mesh=mesh,
        # edge batches sharded over dp; params/state/graph mask replicated
        # (every device masks the FULL batch's edges, like the reference)
        in_specs=(P(), P(None, "dp"), P(None, "dp"), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def sharded_grads(state, pos, neg, mask_positions, key):
        # per-device: local shard of the batch, device-folded RNG
        dp_idx = jax.lax.axis_index("dp")
        key = jax.random.fold_in(key, dp_idx)
        g = tr.g if mask_positions is None else tr.g.mask_edges(mask_positions)
        (loss, ema2), grads = jax.value_and_grad(
            local_loss, has_aux=True)(
            state.params, state.ema, state.sched, g, pos, neg, key)
        loss = jax.lax.pmean(loss, "dp")
        grads = jax.lax.pmean(grads, "dp")
        ema2 = jax.tree_util.tree_map(
            lambda v: v if jnp.issubdtype(v.dtype, jnp.integer)
            else jax.lax.pmean(v, "dp"),
            ema2,
        )
        return (loss, grads), ema2

    @jax.jit
    def step(state: TrainState, pos, neg, mask_positions, key):
        (loss, grads), ema2 = sharded_grads(state, pos, neg, mask_positions, key)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(new_params, ema2, state.sched, new_opt), loss

    return step
