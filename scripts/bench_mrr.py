"""citation2-shape MRR eval throughput: 1000 negatives per source
(NeighborOverlapCitation2.py:248-259) through Trainer.evaluate_mrr.

The full split at citation2 scale is ~3e8 scored links — the bench caps the
number of sources (OCN_BENCH_MRR_CAP, default 8192 per split) and reports
scored-links/s, which is the quantity that scales to the full eval.

Env: OCN_BENCH_SCALE (graph scale, default 0.25), OCN_BENCH_MRR_CAP,
OCN_BENCH_TESTBS (default 65536), OCN_BENCH_ADJ2CAP (default 128).

Run solo on TPU:
  PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/bench_mrr.py
"""
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ocn_tpu_jax_cache")

import numpy as np


def main():
    from ocn_tpu.config import Config
    from ocn_tpu.data.loaders import synthetic_dataset
    from ocn_tpu.train.loop import Trainer

    scale = float(os.environ.get("OCN_BENCH_SCALE", "0.25"))
    cap = int(os.environ.get("OCN_BENCH_MRR_CAP", "8192"))
    testbs = int(os.environ.get("OCN_BENCH_TESTBS", "65536"))
    cfg = Config(
        dataset="citation2", predictor="cn5", model="puregcn", mplayers=3,
        hiddim=64, encoder_stack="ho", cn2_counts=True,
        neg_mode="randint_target", batch_size=32768, linkbatchsize=2048,
        testbs=testbs, maskinput=True, dtype="bfloat16", k_small=16,
        adj2_cap=int(os.environ.get("OCN_BENCH_ADJ2CAP", "128")),
    )
    ds = synthetic_dataset("citation2", seed=0, scale=scale).reorder_bfs()
    rng = np.random.default_rng(1)
    n_scored = 0
    for part in ("valid", "test"):
        sp = ds.split_edge[part]
        m = min(cap, sp["source_node"].shape[0])
        sp["source_node"] = sp["source_node"][:m]
        sp["target_node"] = sp["target_node"][:m]
        # the reference's 1000 negatives per source
        sp["target_node_neg"] = rng.integers(
            0, ds.n_nodes, size=(m, 1000)).astype(np.int64)
        n_scored += m * 1001
    tr = Trainer(cfg, ds)
    state = tr.init_state(0)
    if tr._use_ell:
        tr._refresh_ell(np.random.default_rng(1))

    out = tr.evaluate_mrr(state)  # compile + warm
    t0 = time.perf_counter()
    out = tr.evaluate_mrr(state)
    dt = time.perf_counter() - t0
    print(f"evaluate_mrr (scale {scale}, N={ds.n_nodes:,}, "
          f"{n_scored:,} scored links incl. 1000 negs/src): {dt:.2f} s "
          f"-> {n_scored / dt:,.0f} links/s; MRR {out}", flush=True)


if __name__ == "__main__":
    main()


