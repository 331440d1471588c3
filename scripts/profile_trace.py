"""Capture a device trace of the bench-config train step and print the
per-op time breakdown (aggregated by fusion/op name prefix).

Run solo on TPU:
  PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/profile_trace.py
Env: P_SCALE, P_BATCH, P_CHUNK, P_GROUP, P_WINDOW (0/1), P_REORDER.
"""
import glob
import gzip
import json
import os
from collections import defaultdict

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ocn_tpu_jax_cache")

import numpy as np


def main():
    import jax

    if os.environ.get("P_PLATFORM"):
        # sitecustomize pins the axon backend; only jax.config can unpin it
        jax.config.update("jax_platforms", os.environ["P_PLATFORM"])
    import jax.numpy as jnp

    from ocn_tpu.config import Config
    from ocn_tpu.data.loaders import synthetic_dataset
    from ocn_tpu.train.loop import Trainer

    scale = float(os.environ.get("P_SCALE", "1.0"))
    batch = int(os.environ.get("P_BATCH", "65536"))
    chunk = int(os.environ.get("P_CHUNK", "4096"))
    group = int(os.environ.get("P_GROUP", "4"))
    window = os.environ.get("P_WINDOW", "0") == "1"
    cfg = Config(
        dataset="collab", predictor="cn5", model="gcn", mplayers=3,
        hiddim=256, batch_size=batch, testbs=batch, maskinput=True,
        ln=True, res=True, jk=True, use_xlin=True, tailact=True,
        gnndp=0.25, xdp=0.25, tdp=0.05, gnnedp=0.25, predp=0.3, preedp=0.3,
        pad_deg=64, pad_deg2=64, linkbatchsize=chunk, frame_group=group,
        dtype="bfloat16", window_table=window,
    )
    ds = synthetic_dataset("collab", seed=0, scale=scale)
    if os.environ.get("P_REORDER", "bfs") == "bfs":
        ds = ds.reorder_bfs()
    tr = Trainer(cfg, ds)
    state = tr.init_state(0)

    rng = np.random.default_rng(0)
    pos = ds.split_edge["train"]["edge"].T
    idx = rng.permutation(pos.shape[1])[:batch]
    pe = jnp.asarray(pos[:, idx])
    ne = jnp.asarray(rng.integers(0, ds.n_nodes, size=(2, batch)))
    mp = jnp.maximum(tr.edge2pos[jnp.asarray(idx)].reshape(-1), 0)
    key = jax.random.PRNGKey(0)

    state, loss = tr.train_step(state, pe, ne, mp, key)  # compile
    jax.block_until_ready(loss)

    tdir = "/tmp/ocn_trace"
    with jax.profiler.trace(tdir):
        for i in range(2):
            state, loss = tr.train_step(state, pe, ne, mp, key)
        jax.block_until_ready(loss)

    # parse the trace-event dump: aggregate device-lane op durations
    files = sorted(glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True))
    if not files:
        print("NO TRACE FILES under", tdir)
        return
    with gzip.open(files[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    pid_names = {}
    tid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")
    # aggregate per lane, then per-op within the busiest device-looking lanes
    lane_total = defaultdict(float)
    lane_ops = defaultdict(lambda: defaultdict(float))
    for e in events:
        if e.get("ph") != "X":
            continue
        key = (pid_names.get(e.get("pid"), "?"),
               tid_names.get((e.get("pid"), e.get("tid")), "?"))
        dur = float(e.get("dur", 0)) / 1e3  # us -> ms
        lane_total[key] += dur
        lane_ops[key][e.get("name", "?")] += dur
    print("top lanes by total duration:")
    for key, ms in sorted(lane_total.items(), key=lambda kv: -kv[1])[:8]:
        print(f"  {ms:10.1f} ms  pid={key[0][:40]!r} lane={key[1][:40]!r}")
    for key, _ in sorted(lane_total.items(), key=lambda kv: -kv[1])[:3]:
        if "python" in key[1]:
            continue
        print(f"\n=== per-op breakdown: {key} ===")
        for name, ms in sorted(lane_ops[key].items(), key=lambda kv: -kv[1])[:35]:
            print(f"{ms:9.2f} ms  {name[:110]}")


if __name__ == "__main__":
    main()
