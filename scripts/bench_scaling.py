"""Scaling-efficiency harness: same per-device workload at dp in {1, 2, 4, 8}.

On the virtual CPU mesh this validates the collective machinery and measures
parallel overheads only (CPU "devices" share one socket; ICI numbers require
real multi-chip hardware, which this build image does not expose —
BASELINE.md's >=80%@2-hosts target is measured with this same harness on a
pod slice).

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python -u scripts/bench_scaling.py
"""
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ocn_tpu_jax_cache")

import numpy as np


def main():
    import jax

    if os.environ.get("S_TPU") != "1":
        # virtual CPU mesh by default (env vars can't select the backend in
        # this image; see ocn_tpu.utils.force_platform)
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from ocn_tpu.config import Config
    from ocn_tpu.data.loaders import synthetic_dataset
    from ocn_tpu.parallel.mesh import make_mesh
    from ocn_tpu.parallel.spmd import make_spmd_train_step
    from ocn_tpu.sparse import build as B
    from ocn_tpu.train.loop import Trainer

    per_dev = int(os.environ.get("S_PERDEV", "512"))
    # "spmd" | "sharded" (bare node-sharded step) | "sharded_prod"
    # (node-sharded through the Trainer config path WITH the production
    # levers: ELL table shards + dual-K round-robin interleave — round 3)
    mode = os.environ.get("S_MODE", "spmd")
    ndev = len(jax.devices())
    ds = synthetic_dataset("Cora", seed=0, scale=1.0)
    results = {}
    for dp in (1, 2, 4, 8):
        if dp > ndev:
            break
        b = per_dev * dp
        cfg = Config(
            dataset="Cora", predictor="cn5", model="puregcn", mplayers=1,
            hiddim=64, batch_size=b, testbs=b, maskinput=True,
            pad_deg=32, pad_deg2=32,
            # sharded_prod needs >= 2 chunks per device so each holds one
            # small + one big dual-K chunk
            linkbatchsize=(per_dev // 2 if mode == "sharded_prod"
                           else per_dev),
            ell_tables=(mode == "sharded_prod"),
            **({"graph_sharding": "node", "dp_devices": dp, "k_small": 8,
                "small_frac": 0.5, "small_frac_neg": 0.5}
               if mode == "sharded_prod" else {}),
        )
        tr = Trainer(cfg, ds)
        rng = np.random.default_rng(0)
        pos = ds.split_edge["train"]["edge"].T
        e = pos.shape[1]
        idx = rng.permutation(max(e, b))[:b] % e
        neg = B.negative_sampling(ds.edge_index, ds.n_nodes, b, rng)
        key = jax.random.PRNGKey(0)
        if mode == "sharded_prod":
            if tr._use_ell:
                tr._refresh_ell(np.random.default_rng(1))
            pe, ne, mp, ip, inn = tr.prepare_batch(pos[:, idx], neg, idx)

            def step(state, _pe, _ne, _mp, k):
                return tr.train_step(state, pe, ne, mp, k, ip, inn)
        else:
            mesh = make_mesh(dp=dp, tp=1)
            if mode == "sharded":
                from ocn_tpu.parallel.sharded_graph import (
                    make_sharded_graph_train_step)

                step0, prepare = make_sharded_graph_train_step(tr, mesh)

                def step(state, pe, ne, mp, key, _s=step0, _p=prepare):
                    return _s(state, pe, ne, _p(np.asarray(mp)), key)
            else:
                step = make_spmd_train_step(tr, mesh)
            pe, ne = jnp.asarray(pos[:, idx]), jnp.asarray(neg)
            mp = jnp.maximum(tr.edge2pos[jnp.asarray(idx)].reshape(-1), 0)
        state = tr.init_state(0)
        state, loss = step(state, pe, ne, mp, key)
        jax.block_until_ready(loss)
        t0 = time.perf_counter()
        for i in range(3):
            state, loss = step(state, pe, ne, mp, jax.random.fold_in(key, i))
        jax.block_until_ready(loss)
        dt = (time.perf_counter() - t0) / 3
        eps = 2 * b / dt
        results[dp] = eps
        eff = eps / (results[1] * dp) if 1 in results else 1.0
        print(f"dp={dp} batch={b}: {dt*1e3:.1f} ms/step -> {eps:.0f} edges/s "
              f"(weak-scaling eff {eff*100:.0f}%)", flush=True)


if __name__ == "__main__":
    main()
