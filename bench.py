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

# Per-dataset vs_baseline denominators (VERDICT r2 item 6: no more
# apples-to-oranges `vs_baseline 0.46` rows).  Only collab has a documented
# estimate (BASELINE.md: ~60k edges/s on an 80 GB A100, itself an estimate —
# the reference repo publishes no numbers).  Other shapes have no offline
# cross-framework anchor; their JSON carries vs_baseline null + a note.
DATASET_BASELINES = {"collab": A100_REF_EDGES_PER_S}

# env knobs that select a non-default program; used to decide whether the
# headline line needs a paired defaults rerun (drift discipline: absolute
# edges/s drifts ±10-15% with the chip/tunnel window, so any variant number
# must carry a same-window defaults denominator — VERDICT r2 item 9)
_VARIANT_ENVS = (
    "OCN_BENCH_SCALE", "OCN_BENCH_BATCH", "OCN_BENCH_CHUNK", "OCN_BENCH_HOIST",
    "OCN_BENCH_GROUP", "OCN_BENCH_PREDICTOR", "OCN_BENCH_DATASET",
    "OCN_BENCH_KSMALL", "OCN_BENCH_K2DST",
    "OCN_BENCH_WINDOW", "OCN_BENCH_DTYPE", "OCN_BENCH_ELL",
    "OCN_BENCH_ADJ2CAP", "OCN_BENCH_REORDER", "OCN_BENCH_RECK",
    "OCN_BENCH_PREEDP",
)


def chip_anchors():
    """Same-window chip/tunnel speed anchors, chained-harness timed
    (independent dispatches do not reliably block through the axon tunnel —
    BENCH_NOTES.md round 2): a (B,) row gather of an (N, 64) int32 table
    (the descriptor-rate anchor that bounds the step's gather side; 1.31 ms
    on the 2026-08-20 fast window) and a 4096^3 bf16 matmul (MXU anchor).
    Lets BENCH_r*.json carry its own drift denominator."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    n, b = 235_868, 4096
    tbl = jnp.asarray(
        rng.integers(0, 2**31, size=(n, 64), dtype=np.int64).astype(np.int32))
    rows = jnp.asarray(
        rng.integers(0, n - 8, size=b, dtype=np.int64).astype(np.int32))
    m = jnp.asarray(rng.standard_normal((4096, 4096)), jnp.bfloat16)

    def timeit(body, reps):
        run = jax.jit(
            lambda s0: jax.lax.scan(
                lambda s, _: (body(s), 0), s0, None, length=reps)[0])
        s = run(jnp.zeros((), jnp.int32))
        jax.block_until_ready(s)
        t0 = time.perf_counter()
        jax.block_until_ready(run(jnp.zeros((), jnp.int32)))
        return (time.perf_counter() - t0) / reps * 1e3

    g_ms = timeit(
        lambda s: jax.lax.rem(tbl[rows + s].ravel()[0], jnp.int32(4)), 20)
    mm_ms = timeit(
        lambda s: jnp.dot(m + s.astype(jnp.bfloat16), m)
        .ravel()[0].astype(jnp.float32).astype(jnp.int32) % 4, 10)
    return round(g_ms, 3), round(2 * 4096**3 / (mm_ms * 1e-3) / 1e12, 1)


def measure(defaults: bool = False):
    """Run the bench program and return (metric_name, edges_per_s).

    ``defaults=True`` ignores every OCN_BENCH_* variant env and measures the
    canonical defaults program (the same-window reference for A/Bs)."""
    import jax

    from ocn_tpu.config import Config
    from ocn_tpu.data.loaders import synthetic_dataset
    from ocn_tpu.train.loop import Trainer

    env = (lambda k, d: d) if defaults else (
        lambda k, d: os.environ.get(k, d))
    scale = float(env("OCN_BENCH_SCALE", "1.0"))
    batch = int(env("OCN_BENCH_BATCH", "65536"))
    steps = int(os.environ.get("OCN_BENCH_STEPS", "10"))
    chunk = int(env("OCN_BENCH_CHUNK", "4096"))
    hoist = env("OCN_BENCH_HOIST", "0") == "1"
    group = int(env("OCN_BENCH_GROUP", "8"))

    predictor = env("OCN_BENCH_PREDICTOR", "cn5")
    dataset = env("OCN_BENCH_DATASET", "collab")
    # per-dataset shape overrides mirroring the README driver configs
    # (VERDICT r2 item 6): citation2 = NeighborOverlapCitation2.py:235-259
    # (randint-target negatives, ho stack, hiddim 64); ddi = README.md:59
    # (puresum encoder, hiddim 224, near-dense degree ~500, host-SpGEMM A^2
    # standing in for --adj2byblock).
    shape = {}
    if dataset == "citation2":
        batch = int(env("OCN_BENCH_BATCH", "32768"))
        chunk = int(env("OCN_BENCH_CHUNK", "2048"))
        shape = dict(model="puregcn", hiddim=64, encoder_stack="ho",
                     cn2_counts=True, neg_mode="randint_target")
    elif dataset == "ddi":
        batch = int(env("OCN_BENCH_BATCH", "24576"))
        shape = dict(model="puresum", hiddim=224)
    elif dataset == "ppa" and env("OCN_BENCH_PPA_SHAPE", "preset") == "preset":
        # the ('ppa','cn5') preset shape (README.md:47 of the reference;
        # VERDICT r2 item 2): hiddim 64 / 1 layer / ho stack / linkbatch 512.
        # OCN_BENCH_PPA_SHAPE=collab keeps the collab-flavored config for
        # continuity with the round-2 scale-0.5 row.
        batch = int(env("OCN_BENCH_BATCH", "16384"))
        chunk = int(env("OCN_BENCH_CHUNK", "512"))
        shape = dict(model="gcn", hiddim=64, mplayers=1, encoder_stack="ho",
                     cn2_counts=True, ln=False, res=False, jk=False,
                     gnndp=0.1, xdp=0.1, tdp=0.1, gnnedp=0.1, predp=0.1,
                     preedp=0.0)
    # memory plan: citation2's N=2.9M makes the A^2 table the dominant array
    # (cap 128 ~ 1.5 GB packed at the round-4 GATHER-ONLY 4 B/entry layout);
    # ppa affords cap 1024 since round 4 (gather-only A^2 — config.py preset
    # note; round 3 was forced to 256 by the 16-20 B/entry full layout)
    adj2cap_default = {"citation2": "128", "ppa": "1024"}.get(dataset, "1024")
    base = dict(
        dataset=dataset, predictor=predictor, model="gcn", mplayers=3,
        hiddim=256, batch_size=batch, testbs=batch, maskinput=True,
        ln=True, res=True, jk=True, use_xlin=True, tailact=True,
        gnndp=0.25, xdp=0.25, tdp=0.05, gnnedp=0.25, predp=0.3, preedp=0.3,
        pad_deg=64, pad_deg2=64, linkbatchsize=chunk, hoist_frames=hoist,
        frame_group=group,
        k_small=int(env("OCN_BENCH_KSMALL", "16")),
        pad_deg2_dst=int(env("OCN_BENCH_K2DST", "0")),
        window_table=env("OCN_BENCH_WINDOW", "0") == "1",
        dtype=env("OCN_BENCH_DTYPE", "bfloat16"),
        ell_tables=env("OCN_BENCH_ELL", "1") == "1",
        adj2_cap=int(env("OCN_BENCH_ADJ2CAP", adj2cap_default)),
        # incomplete-CN family levers (VERDICT r2 item 5): recursion frame
        # width cap, and preedp=0 keeps the ELL tables attached (DropAdj
        # detaches them per chunk — train/loop.py _use_ell note)
        rec_k=int(env("OCN_BENCH_RECK", "0")),
    )
    base.update(shape)
    cfg = Config(**base)
    if env("OCN_BENCH_PREEDP", "") != "":
        cfg.preedp = float(env("OCN_BENCH_PREEDP", "0.3"))
    ds = synthetic_dataset(dataset, seed=0, scale=scale)
    if env("OCN_BENCH_REORDER", "bfs") == "bfs":
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
        jax.device_get(tr._ell["tbl1"][0, 0])
        t0 = time.perf_counter()
        tr._refresh_ell(np.random.default_rng(2))
        # fetch forces completion (block_until_ready alone is unreliable
        # through the tunnel for independent dispatches, BENCH_NOTES.md r2)
        jax.device_get(tr._ell["tbl1"][0, 0])
        refresh_s = time.perf_counter() - t0
    from ocn_tpu.sparse import build as B

    pos = ds.split_edge["train"]["edge"].T
    if cfg.neg_mode == "randint_target":
        # citation2 driver semantics (NeighborOverlapCitation2.py:181-182)
        neg = np.stack([pos[0], rng.integers(0, ds.n_nodes, size=e)])
    else:
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
    jax.device_get(loss)  # fetch forces completion (axon block_until_ready bug, BENCH_NOTES r2)

    t0 = time.perf_counter()
    done = 0
    for pe, ne, mp, ki, inv_p, inv_n in batches[:steps]:
        state, loss = tr.train_step(state, pe, ne, mp, ki, inv_p, inv_n)
        done += 2 * batch  # pos + neg links scored per step
    jax.device_get(loss)  # fetch forces completion (axon block_until_ready bug, BENCH_NOTES r2)
    dt = time.perf_counter() - t0
    # amortize the per-epoch ELL refresh over an epoch's worth of steps
    steps_per_epoch = max(1, e // batch)
    dt += steps * refresh_s / (steps_per_epoch * max(1, cfg.ell_refresh))
    eps = done / dt
    return f"train_edges_per_s_{predictor}_{dataset}", eps


def main():
    import jax

    if os.environ.get("OCN_BENCH_PLATFORM"):
        # env vars can't unpin the axon TPU backend; jax.config can
        # (used for the same-CPU comparison vs scripts/bench_reference_torch.py)
        jax.config.update("jax_platforms", os.environ["OCN_BENCH_PLATFORM"])

    metric, eps = measure()
    dataset = os.environ.get("OCN_BENCH_DATASET", "collab")
    base = DATASET_BASELINES.get(dataset)
    rec = {
        "metric": metric,
        "value": round(eps, 1),
        "unit": "edges/s",
        "vs_baseline": round(eps / base, 3) if base else None,
    }
    if base is None:
        rec["baseline_note"] = (
            f"no offline cross-framework anchor for {dataset!r}; "
            "see chip anchors for the drift denominator")
    if os.environ.get("OCN_BENCH_ANCHORS", "1") == "1":
        g_ms, mm_tflops = chip_anchors()
        # fast-window references (2026-08-20): gather 1.31 ms, ~126 Tflop/s
        rec["anchor_rowgather_ms"] = g_ms
        rec["anchor_matmul_tflops"] = mm_tflops
    is_variant = any(os.environ.get(k) for k in _VARIANT_ENVS)
    if is_variant and os.environ.get("OCN_BENCH_PAIR", "1") == "1":
        # same-queue defaults rerun: the variant line carries its own
        # denominator, immune to the ±10-15% cross-session drift
        ref_metric, ref_eps = measure(defaults=True)
        rec["ref_defaults_metric"] = ref_metric
        rec["ref_defaults_value"] = round(ref_eps, 1)
        rec["vs_defaults"] = round(eps / ref_eps, 3)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
