"""Accuracy-parity study: exact CN vs production caps vs dual-K split.

The image has no network egress (verified: no PyG/OGB, no dataset files, DNS
fails), so published-number parity is unmeasurable here.  This is the
documented proxy (VERDICT r1 item 1): run full training to convergence on
learnable offline graphs and measure the Hits@K cost of every approximation
the TPU design makes on top of the reference math:

* degree caps (`pad_deg`) vs exact CN sets (reference default cndeg=-1,
  utils.py:248-285),
* precomputed row-capped A^2 ("gather" mode + maskinput correction) vs exact
  on-the-fly counts ("sddmm", reference NeighborOverlap_large.py:74),
* the dual-K occupancy split (k_small=16) vs single-K.

Graphs: `sbm` (strong CN signal, the learnability proxy) and the Zipf
stand-ins (`Cora`, `Citeseer`) whose heavy-tailed degrees make the caps
actually bind (max degree ~104 at Cora scale vs pad_deg=64).

Usage:
  python -u scripts/accuracy_parity.py --graph sbm --runs 3 --epochs 30 \
      --variants exact,capped,capped_k16,hard16 --out results/parity_sbm.jsonl

Each (variant, run) appends one JSON line; rerunning skips completed pairs.
`--table` prints the aggregated markdown table from an existing output file.
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ocn_tpu.config import Config, presets
from ocn_tpu.data.loaders import loaddataset
from ocn_tpu.train.loop import Trainer


def base_config(graph: str, epochs: int, predictor: str = "cn5") -> Config:
    if graph in ("Cora", "Citeseer", "Pubmed"):
        cfg = presets(graph, predictor, epochs=epochs, runs=1)
    elif graph == "ppa":
        # degree-100 synthetic at CPU-trainable scale: the adj2_cap
        # sensitivity proxy for the full-scale ppa preset (VERDICT r2 item 2)
        cfg = presets("ppa", predictor, epochs=epochs, runs=1,
                      batch_size=4096, testbs=8192, linkbatchsize=512)
    else:  # sbm
        cfg = Config(
            dataset="sbm", predictor=predictor, model="puregcn", mplayers=1,
            hiddim=64, batch_size=2048, testbs=4096, epochs=epochs, runs=1,
            maskinput=True, ln=True, lnnn=True, res=True,
            gnndp=0.1, xdp=0.1, tdp=0.1, gnnedp=0.0, predp=0.1, preedp=0.1,
            gnnlr=0.01, prelr=0.01,
        )
    cfg.platform = "cpu"
    return cfg


def variant_overrides(name: str, max_deg: int) -> dict:
    pad_exact = 1 << int(np.ceil(np.log2(max(max_deg, 8))))
    table = {
        # exact CN sets + exact two-hop counts (reference default semantics)
        "exact": dict(pad_deg=pad_exact, pad_deg2=pad_exact,
                      two_hop_mode="sddmm"),
        # production config as measured pre-ELL (ell_tables landed after
        # these rows; pinned False so the variant keeps meaning)
        "capped": dict(pad_deg=64, pad_deg2=64, two_hop_mode="gather",
                       adj2_cap=1024, ell_tables=False),
        # CURRENT production: caps + ELL frozen-window tables (sparse/ell.py).
        # Isolates the per-refresh (vs per-chunk) window-resample granularity
        # on a graph where the caps bind (Cora stand-in max deg 104 > 64)
        "capped_ell": dict(pad_deg=64, pad_deg2=64, two_hop_mode="gather",
                           adj2_cap=1024, ell_tables=True),
        # wider-cap arm (round 5): the Pubmed half-scale A/B showed the
        # first exact>capped val gap in the matrix — this tests whether
        # pad 128 closes it (caps are a TPU overlay knob, free to widen)
        "capped128_ell": dict(pad_deg=128, pad_deg2=128,
                              two_hop_mode="gather", adj2_cap=1024,
                              ell_tables=True),
        # production + dual-K occupancy split
        "capped_k16": dict(pad_deg=64, pad_deg2=64, two_hop_mode="gather",
                           adj2_cap=1024, k_small=16, ell_tables=False),
        # round-3 isolating variants (VERDICT r2 item 8: pin down WHY
        # capped >= exact on SBM): exact frame width with the production
        # two-hop mode, and production width with the exact two-hop counts —
        # together with `exact` and `capped` they factor the difference into
        # its two axes (cap width vs A^2 mode)
        "exact_gather": dict(pad_deg=pad_exact, pad_deg2=pad_exact,
                             two_hop_mode="gather", adj2_cap=4096,
                             ell_tables=False),
        "capped_sddmm": dict(pad_deg=64, pad_deg2=64, two_hop_mode="sddmm",
                             ell_tables=False),
        # incomplete-CN family (cn2/cn4): the recursion-width cap rec_k is
        # the family's real production knob (round 3) — A/B against `capped`
        # (rec_k=0, full-width recursion).  ELL granularity is inert for the
        # family when preedp > 0 (DropAdj detaches the tables), so rec8 (not
        # capped_ell) is the meaningful capped variant — this replaces the
        # round-2 A/A rows (VERDICT r2 "What's weak" #3).
        "rec8": dict(pad_deg=64, pad_deg2=64, two_hop_mode="gather",
                     adj2_cap=1024, rec_k=8, ell_tables=False),
        "rec16": dict(pad_deg=64, pad_deg2=64, two_hop_mode="gather",
                      adj2_cap=1024, rec_k=16, ell_tables=False),
        # cn3 convergence A/B arms (round 4): full-width vs rec_k=16
        # recursion at a CPU-affordable eval residual width — tstdeg=32 is
        # SHARED by both arms so the A/B still isolates rec_k (the default
        # tstdeg=128 eval makes a 30-epoch cn3 run take ~75 min on 2 cores)
        "capped_t32": dict(pad_deg=64, pad_deg2=64, two_hop_mode="gather",
                           adj2_cap=1024, tstdeg=32, ell_tables=False),
        "rec16_t32": dict(pad_deg=64, pad_deg2=64, two_hop_mode="gather",
                          adj2_cap=1024, rec_k=16, tstdeg=32,
                          ell_tables=False),
        # A^2 row-cap sensitivity on a degree-100 graph (the ppa preset's
        # memory plan pins adj2_cap=256; these rows measure what cap 256
        # costs vs 1024 where the cap actually binds — avg A^2 row ~10^4)
        "adj2cap256": dict(pad_deg=64, pad_deg2=64, two_hop_mode="gather",
                           adj2_cap=256, ell_tables=True),
        "adj2cap1024": dict(pad_deg=64, pad_deg2=64, two_hop_mode="gather",
                            adj2_cap=1024, ell_tables=True),
        # deliberately harsh caps (sensitivity curve)
        "hard16": dict(pad_deg=16, pad_deg2=16, two_hop_mode="gather",
                       adj2_cap=256, ell_tables=False),
        "hard8": dict(pad_deg=8, pad_deg2=8, two_hop_mode="gather",
                      adj2_cap=128, ell_tables=False),
        # dual-K A/B at a chunk size that actually activates the split
        # (capped_k16 at linkbatchsize==batch has nchunk=1 -> split off);
        # both arms share the chunk size so colnorm granularity matches
        "lb256": dict(pad_deg=64, pad_deg2=64, two_hop_mode="gather",
                      adj2_cap=1024, linkbatchsize=256, ell_tables=False),
        "lb256_k16": dict(pad_deg=64, pad_deg2=64, two_hop_mode="gather",
                          adj2_cap=1024, linkbatchsize=256, k_small=16, ell_tables=False),
        # --- cn6 estimator-chain study (round 5, VERDICT r4 item 1): the
        # production cn6 stacks FOUR approximations with (until now) no
        # accuracy evidence: host A^3 value-thresholded at adj3_cap, the
        # k3=16 row-gather width, tbl3 frozen ELL windows, and no maskinput
        # treatment of A^3.  x3_exact runs the on-the-fly cubic fallback
        # (two_hop_mode="sddmm" leaves adj2/adj3 unbuilt) at widths above
        # the max degree — exact on the masked adjacency.  The rest mirror
        # the ppa adj2_cap study: the full production chain, then arms
        # isolating each knob.
        "x3_exact": dict(pad_deg=pad_exact, pad_deg2=pad_exact,
                         two_hop_mode="sddmm", k3=pad_exact,
                         ell_tables=False),
        "x3_prod": dict(pad_deg=64, pad_deg2=64, two_hop_mode="gather",
                        adj2_cap=1024, adj3_cap=256, ell_tables=True),
        "x3_noell": dict(pad_deg=64, pad_deg2=64, two_hop_mode="gather",
                         adj2_cap=1024, adj3_cap=256, ell_tables=False),
        "x3_cap64": dict(pad_deg=64, pad_deg2=64, two_hop_mode="gather",
                         adj2_cap=1024, adj3_cap=64, ell_tables=True),
        "x3_cap1024": dict(pad_deg=64, pad_deg2=64, two_hop_mode="gather",
                           adj2_cap=1024, adj3_cap=1024, ell_tables=True),
        "x3_k8": dict(pad_deg=64, pad_deg2=64, two_hop_mode="gather",
                      adj2_cap=1024, adj3_cap=256, k3=8, ell_tables=True),
        "x3_k32": dict(pad_deg=64, pad_deg2=64, two_hop_mode="gather",
                       adj2_cap=1024, adj3_cap=256, k3=32, ell_tables=True),
        # (the k_neg third-body variant lb256_k16n8 was retired with the
        # feature in round 5; its accuracy-neutral result is recorded in
        # BASELINE.md round 2)
        "lb128": dict(pad_deg=64, pad_deg2=64, two_hop_mode="gather",
                      adj2_cap=1024, linkbatchsize=128, ell_tables=False),
        "lb128_k16": dict(pad_deg=64, pad_deg2=64, two_hop_mode="gather",
                          adj2_cap=1024, linkbatchsize=128, k_small=16, ell_tables=False),
    }
    return table[name]


def run_one(graph: str, variant: str, run_i: int, epochs: int,
            eval_every: int, predictor: str = "cn5",
            scale: float = 1.0) -> dict:
    ds = loaddataset(graph, seed=run_i, synthetic_scale=scale)
    deg = np.bincount(np.asarray(ds.edge_index[0]), minlength=ds.n_nodes)
    cfg = base_config(graph, epochs, predictor)
    for k, v in variant_overrides(variant, int(deg.max())).items():
        setattr(cfg, k, v)
    # registry-only predictors (cn6 etc.) have no README command for the
    # Planetoid sets, and the generic preset's batch_size can exceed the
    # stand-in's train-edge count — the drop-tail PermIterator then runs
    # ZERO batches and the run silently never trains.  Clamp to the
    # largest power of two that fits (shared by every arm: A/B-consistent).
    e_train = int(np.asarray(ds.split_edge["train"]["edge"]).shape[0])
    if cfg.batch_size > e_train:
        cfg.batch_size = max(256, 1 << int(np.log2(e_train)))
        cfg.testbs = min(cfg.testbs, cfg.batch_size)
        cfg.linkbatchsize = min(cfg.linkbatchsize or cfg.batch_size,
                                cfg.batch_size)
        print(f"  [batch clamp] {cfg.batch_size} (train edges {e_train})",
              flush=True)
    if cfg.reorder == "bfs":
        ds = ds.reorder_bfs()
    tr = Trainer(cfg, ds)
    state = tr.init_state(run_i)
    rng = np.random.default_rng(run_i)
    best = {}
    t0 = time.time()
    for epoch in range(1, epochs + 1):
        state, loss = tr.train_epoch(state, rng, epoch)
        if epoch % eval_every and epoch != epochs:
            continue
        res = tr.evaluate(state)
        for key, (trn, val, tst) in res.items():
            if key not in best or val > best[key][1]:
                best[key] = [trn, val, tst]
        print(f"  [{variant} r{run_i}] ep{epoch} loss {loss:.4f} "
              f"H@50 val {res['Hits@50'][1]:.4f} tst {res['Hits@50'][2]:.4f}",
              flush=True)
    return {
        "graph": graph, "variant": variant, "run": run_i,
        "predictor": predictor, "scale": scale,
        "epochs": epochs, "wall_s": round(time.time() - t0, 1),
        "pad_deg": cfg.pad_deg, "two_hop_mode": cfg.two_hop_mode,
        "k_small": cfg.k_small, "adj3_cap": cfg.adj3_cap, "k3": cfg.k3,
        "best": {k: [round(x, 5) for x in v] for k, v in best.items()},
    }


def print_table(path: str) -> None:
    rows = [json.loads(l) for l in open(path) if l.strip()]
    agg: dict = {}
    for r in rows:
        agg.setdefault((r["graph"], r.get("predictor", "cn5"),
                        r["variant"]), []).append(r)
    print("| graph | pred | variant | runs | Hits@50 val | Hits@50 test | Hits@100 test |")
    print("|---|---|---|---|---|---|---|")
    for (g, p, v), rs in sorted(agg.items()):
        h50v = np.array([x["best"]["Hits@50"][1] for x in rs])
        h50t = np.array([x["best"]["Hits@50"][2] for x in rs])
        h100t = np.array([x["best"]["Hits@100"][2] for x in rs])
        print(f"| {g} | {p} | {v} | {len(rs)} "
              f"| {h50v.mean():.4f}±{h50v.std():.4f} "
              f"| {h50t.mean():.4f}±{h50t.std():.4f} "
              f"| {h100t.mean():.4f}±{h100t.std():.4f} |")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--graph", default="sbm")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--eval_every", type=int, default=3)
    ap.add_argument("--variants", default="exact,capped,capped_k16,hard16")
    ap.add_argument("--predictor", default="cn5")
    ap.add_argument("--scale", type=float, default=1.0,
                    help="synthetic graph scale (e.g. 0.01 for the ppa "
                         "degree-100 adj2_cap sensitivity rows)")
    ap.add_argument("--out", default="results/parity.jsonl")
    ap.add_argument("--table", action="store_true",
                    help="only print the aggregate table from --out")
    args = ap.parse_args()
    if args.table:
        print_table(args.out)
        return
    # CPU study: the axon plugin pins the backend at import, so force it
    # through jax.config before any backend initialization (conftest pattern)
    import jax

    jax.config.update("jax_platforms", "cpu")
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    done = set()
    if os.path.exists(args.out):
        for line in open(args.out):
            if line.strip():
                r = json.loads(line)
                done.add((r["graph"], r["variant"], r["run"],
                          r.get("predictor", "cn5")))
    for variant in args.variants.split(","):
        for run_i in range(args.runs):
            key = (args.graph, variant, run_i, args.predictor)
            if key in done:
                print(f"skip {key} (done)", flush=True)
                continue
            print(f"=== {key}", flush=True)
            rec = run_one(args.graph, variant, run_i, args.epochs,
                          args.eval_every, args.predictor, args.scale)
            with open(args.out, "a") as f:
                f.write(json.dumps(rec) + "\n")
    print_table(args.out)


if __name__ == "__main__":
    main()
