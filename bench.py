"""Benchmark driver: training throughput (edges/s) of the flagship cn5/OCN
config on a collab-scale graph, single chip.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

`vs_baseline` compares against an estimated reference throughput of the
PyTorch/CUDA OCN stack on one A100 (BASELINE.md: no numbers are committed to
the reference repo, and its target is ">=2x A100 PyG edges/s/chip").  The
A100 estimate used here: ogbl-collab cn5 (batch 65536, ~1.2M train edges per
epoch counting pos+neg) at roughly 20 s/epoch of train time on an 80 GB A100
=> ~60k edges/s.  Until real A100 measurements are recorded, vs_baseline is
measured_edges_per_s / 60_000.
"""
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ocn_tpu_jax_cache")

import numpy as np

A100_REF_EDGES_PER_S = 60_000.0


def main():
    import jax

    if os.environ.get("OCN_BENCH_PLATFORM"):
        # env vars can't unpin the axon TPU backend; jax.config can
        # (used for the same-CPU comparison vs scripts/bench_reference_torch.py)
        jax.config.update("jax_platforms", os.environ["OCN_BENCH_PLATFORM"])

    from ocn_tpu.config import Config
    from ocn_tpu.data.loaders import synthetic_dataset
    from ocn_tpu.train.loop import Trainer

    scale = float(os.environ.get("OCN_BENCH_SCALE", "1.0"))
    batch = int(os.environ.get("OCN_BENCH_BATCH", "65536"))
    steps = int(os.environ.get("OCN_BENCH_STEPS", "10"))
    chunk = int(os.environ.get("OCN_BENCH_CHUNK", "4096"))
    hoist = os.environ.get("OCN_BENCH_HOIST", "0") == "1"
    group = int(os.environ.get("OCN_BENCH_GROUP", "8"))

    predictor = os.environ.get("OCN_BENCH_PREDICTOR", "cn5")
    dataset = os.environ.get("OCN_BENCH_DATASET", "collab")
    cfg = Config(
        dataset=dataset, predictor=predictor, model="gcn", mplayers=3,
        hiddim=256, batch_size=batch, testbs=batch, maskinput=True,
        ln=True, res=True, jk=True, use_xlin=True, tailact=True,
        gnndp=0.25, xdp=0.25, tdp=0.05, gnnedp=0.25, predp=0.3, preedp=0.3,
        pad_deg=64, pad_deg2=64, linkbatchsize=chunk, hoist_frames=hoist,
        frame_group=group,
        k_small=int(os.environ.get("OCN_BENCH_KSMALL", "16")),
        k_neg=int(os.environ.get("OCN_BENCH_KNEG", "0")),
        pad_deg2_dst=int(os.environ.get("OCN_BENCH_K2DST", "0")),
        window_table=os.environ.get("OCN_BENCH_WINDOW", "0") == "1",
        dtype=os.environ.get("OCN_BENCH_DTYPE", "bfloat16"),
        ell_tables=os.environ.get("OCN_BENCH_ELL", "1") == "1",
        adj2_cap=int(os.environ.get("OCN_BENCH_ADJ2CAP", "1024")),
    )
    ds = synthetic_dataset(dataset, seed=0, scale=scale)
    if os.environ.get("OCN_BENCH_REORDER", "bfs") == "bfs":
        # BFS node relabeling clusters neighbor gathers (BENCH_NOTES.md)
        ds = ds.reorder_bfs()
    tr = Trainer(cfg, ds)
    state = tr.init_state(0)

    e = ds.split_edge["train"]["edge"].shape[0]
    rng = np.random.default_rng(0)

    refresh_s = 0.0
    if tr._use_ell:
        # bench drives train_step directly (no train_epoch), so build the
        # ELL tables here and charge their per-epoch rebuild to the step
        # time below (amortized over the steps one epoch contains)
        tr._refresh_ell(np.random.default_rng(1))  # compile/warm
        jax.device_get(tr._ell["tbl2"][0, 0])
        t0 = time.perf_counter()
        tr._refresh_ell(np.random.default_rng(2))
        # fetch forces completion (block_until_ready alone is unreliable
        # through the tunnel for independent dispatches, BENCH_NOTES.md r2)
        jax.device_get(tr._ell["tbl2"][0, 0])
        refresh_s = time.perf_counter() - t0
    from ocn_tpu.sparse import build as B

    pos = ds.split_edge["train"]["edge"].T
    neg = B.negative_sampling(ds.edge_index, ds.n_nodes, e, rng)
    perm = rng.permutation(e)[: batch * max(1, steps)]

    import jax.numpy as jnp

    key = jax.random.PRNGKey(0)
    # pre-stage every step's inputs on device (int32, one upload outside the
    # timed region): the tunnel's 44-64 MB/s host->device link would otherwise
    # serialize ~1.3 MB + a dispatch per step into the measurement; a real
    # input pipeline overlaps these copies with compute
    batches = []
    for i in range(max(1, steps)):
        idx = perm[(i % max(1, len(perm) // batch)) * batch :][:batch]
        if len(idx) < batch:
            idx = perm[:batch]
        pe, ne, mp, inv_p, inv_n = tr.prepare_batch(
            pos[:, idx], neg[:, idx], idx)
        batches.append((pe, ne, mp, jax.random.fold_in(key, i), inv_p, inv_n))
    jax.block_until_ready(batches)

    # warmup / compile
    pe, ne, mp, k0, inv_p, inv_n = batches[0]
    state, loss = tr.train_step(state, pe, ne, mp, key, inv_p, inv_n)
    jax.block_until_ready(loss)

    t0 = time.perf_counter()
    done = 0
    for pe, ne, mp, ki, inv_p, inv_n in batches[:steps]:
        state, loss = tr.train_step(state, pe, ne, mp, ki, inv_p, inv_n)
        done += 2 * batch  # pos + neg links scored per step
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0
    # amortize the per-epoch ELL refresh over an epoch's worth of steps
    steps_per_epoch = max(1, e // batch)
    dt += steps * refresh_s / (steps_per_epoch * max(1, cfg.ell_refresh))
    eps = done / dt

    print(json.dumps({
        "metric": f"train_edges_per_s_{predictor}_{dataset}",
        "value": round(eps, 1),
        "unit": "edges/s",
        "vs_baseline": round(eps / A100_REF_EDGES_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
