"""Eval-path throughput at bench scale (the reference prints per-epoch train
AND test wall-clock, NeighborOverlap_large.py:314,319 — this measures ours).

Scores the full test split (pos + neg) through Trainer._score_split /
evaluate() on the collab-scale synthetic, single chip.

Run solo on TPU:
  PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/bench_eval.py
"""
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ocn_tpu_jax_cache")

import numpy as np


def main():
    import jax

    from ocn_tpu.config import Config
    from ocn_tpu.data.loaders import synthetic_dataset
    from ocn_tpu.train.loop import Trainer

    batch = int(os.environ.get("OCN_BENCH_BATCH", "65536"))
    pred = os.environ.get("OCN_BENCH_PREDICTOR", "cn5")
    cfg = Config(
        dataset="collab", predictor=pred, model="gcn", mplayers=3,
        hiddim=256, batch_size=batch, testbs=batch, maskinput=True,
        ln=True, res=True, jk=True, use_xlin=True, tailact=True,
        pad_deg=64, pad_deg2=64, linkbatchsize=4096, frame_group=8,
        k_small=16, dtype="bfloat16",
        rec_k=int(os.environ.get("OCN_BENCH_RECK", "0")),
    )
    ds = synthetic_dataset("collab", seed=0).reorder_bfs()
    tr = Trainer(cfg, ds)
    state = tr.init_state(0)

    n_eval = sum(
        ds.split_edge["test"][k].shape[0]
        for k in ("edge", "edge_neg") if k in ds.split_edge["test"]
    ) + sum(
        ds.split_edge["valid"][k].shape[0]
        for k in ("edge", "edge_neg") if k in ds.split_edge["valid"]
    ) + ds.split_edge["train"]["edge"].shape[0]

    if tr._use_ell:
        tr._refresh_ell(np.random.default_rng(1))

    # round-3 grid: dual-K at eval (VERDICT r2 item 7) on top of the round-2
    # ell_eval lever; Hits printed so metric shifts are visible in the A/B
    for label, ell_eval, dual in (
        ("ell=1 dualK=1", True, True),
        ("ell=1 dualK=0", True, False),
        ("ell=0 dualK=0", False, False),
    ):
        tr.cfg.ell_eval = ell_eval
        tr.cfg.dual_k_eval = dual
        res = tr.evaluate(state)  # compile + warm
        t0 = time.perf_counter()
        res = tr.evaluate(state)
        dt = time.perf_counter() - t0
        print(f"evaluate() {label}: {dt:.2f} s for ~{n_eval} scored edges "
              f"-> {n_eval / dt:,.0f} edges/s "
              f"(Hits@50: {res['Hits@50']})", flush=True)


if __name__ == "__main__":
    main()
